from .sharded import (  # noqa: F401
    make_edge_mesh,
    sharded_normal_equations,
    sharded_refine_step,
)
