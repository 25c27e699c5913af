"""Ray-axis sharded raycast parity on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from polychase_tpu.engine.raycast import raycast_grouped
from polychase_tpu.parallel.raycast import (
    make_ray_mesh,
    sharded_raycast_grouped,
)

from synthetic import make_sphere_mesh


def test_sharded_raycast_matches_single_device():
    mesh = make_ray_mesh()
    assert mesh.devices.size == 8, "conftest must provide 8 CPU devices"

    tri_mesh = make_sphere_mesh(12, 16)
    rng = np.random.default_rng(0)
    G, K = 16, 64  # G divisible by 8
    origins = rng.normal(size=(G, 3)).astype(np.float32)
    origins = 4.0 * origins / np.linalg.norm(origins, axis=-1, keepdims=True)
    dirs = (
        rng.normal(0, 0.5, (G, K, 3)) - origins[:, None, :]
    ).astype(np.float32)

    got = sharded_raycast_grouped(
        mesh, tri_mesh, jnp.asarray(origins), jnp.asarray(dirs)
    )
    want = raycast_grouped(tri_mesh, jnp.asarray(origins), jnp.asarray(dirs))

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_array_equal(
        np.asarray(got.prim_id)[v], np.asarray(want.prim_id)[v]
    )
    np.testing.assert_allclose(
        np.asarray(got.pos)[v], np.asarray(want.pos)[v], rtol=1e-5, atol=1e-5
    )


def test_sharded_raycast_rejects_indivisible_groups():
    mesh = make_ray_mesh()
    tri_mesh = make_sphere_mesh(6, 8)
    o = np.zeros((3, 3), np.float32)
    d = np.ones((3, 4, 3), np.float32)
    try:
        sharded_raycast_grouped(mesh, tri_mesh, jnp.asarray(o), jnp.asarray(d))
    except ValueError as e:
        assert "divisible" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")
