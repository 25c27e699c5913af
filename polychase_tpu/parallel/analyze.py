"""Multi-chip sharding of the Analyze (optical-flow) fan-out.

SURVEY §2.4 row 1: the reference's per-skip-pair TBB pool
(cpp/opticalflow.cc:269-309) maps to sharding the *target-frame axis* of
the multi-target LK solve over a 1-D device mesh — each chip tracks the
shared source frame's features into its shard of the ±{1,2,4,8} skip
targets.  There is no cross-target communication, so the only collective
cost is the result gather.

The source frame's prepared pyramid (images + derivatives + the shared
per-feature normal matrices) is replicated; the stacked target images are
sharded on their leading axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec
from jax import shard_map

from ..engine import lk as _lk

TARGET_AXIS = "targets"


def make_target_mesh(devices=None) -> Mesh:
    """1-D device mesh over which LK targets are sharded."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (TARGET_AXIS,))


@partial(
    jax.jit,
    static_argnames=("mesh", "win", "max_iters", "levels"),
)
def sharded_lk_multi(
    mesh: Mesh,
    prev_levels,            # per level: (img, dx, dy, shape) — replicated
    next_images_stacked,    # per level: (T, Hp, Wp) — sharded on T
    pts,                    # (N, 2) full-res positions — replicated
    eps2,
    min_eig_thr,
    *,
    win: int,
    max_iters: int,
    levels: int,
):
    """Target-sharded coarse-to-fine LK (XLA path).

    ``T`` must be a multiple of the mesh size (pad with copies of the
    source images; their outputs are dropped by the caller).  Returns the
    same (T, N, 2)/(T, N)/(T, N) tuple as ``_lk_all_levels_multi``.
    """
    target = PSpec(TARGET_AXIS)

    # shard_map body: each device runs the plain multi-target program on
    # its local shard of the stacked images (no collectives needed).
    def body(next_images_local):
        return _lk._lk_all_levels_multi(
            prev_levels, next_images_local, pts, eps2, min_eig_thr,
            win=win, max_iters=max_iters, levels=levels,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(tuple(target for _ in range(levels)),),
        out_specs=(target, target, target),
        check_vma=False,
    )
    return fn(next_images_stacked)


def shard_targets(mesh: Mesh, stacked) -> tuple:
    """device_put per-level stacked target images with the target sharding."""
    sh = NamedSharding(mesh, PSpec(TARGET_AXIS))
    return tuple(jax.device_put(s, sh) for s in stacked)


# ---------------------------------------------------------------------------
# Feature-axis sharding: the axis that actually grows (a 4K noise frame
# keeps ~170k corners while T is capped at 8 by the skip pattern).
# Features are independent, so there are no collectives; target images
# are replicated across the mesh and each chip iterates its feature
# shard into every target.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh", "win", "max_iters", "levels"))
def sharded_lk_multi_feat(
    mesh: Mesh,
    prev_levels,            # per level: (img, dx, dy, shape) — replicated
    next_images_stacked,    # per level: (T, Hp, Wp) — replicated
    pts,                    # (N, 2) — sharded on N
    eps2,
    min_eig_thr,
    *,
    win: int,
    max_iters: int,
    levels: int,
):
    """Feature-sharded coarse-to-fine LK (XLA path).

    ``N`` must be a multiple of the mesh size (callers pad; padded rows
    solve a zero-motion problem at (0, 0) and are dropped on unpad)."""
    feat = PSpec(TARGET_AXIS)

    def body(pts_local):
        return _lk._lk_all_levels_multi(
            prev_levels, next_images_stacked, pts_local, eps2, min_eig_thr,
            win=win, max_iters=max_iters, levels=levels,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(feat,),
        out_specs=(
            PSpec(None, TARGET_AXIS),
            PSpec(None, TARGET_AXIS),
            PSpec(None, TARGET_AXIS),
        ),
        check_vma=False,
    )
    return fn(pts)


def _sharded_lk_multi_pallas_feat(
    mesh: Mesh,
    prev_levels,            # per level: (img_pad, dx_pad, dy_pad)
    next_images_stacked,    # per level: (T, Hp, Wp) — replicated
    pts,                    # (N, 2) — sharded on N
    *,
    dims,
    win: int,
    max_iters: int,
    eps2: float,
    min_eig_thr: float,
    interpret: bool = False,
):
    """Feature-sharded Analyze over the Pallas kernel path.

    Each chip runs the full coarse-to-fine Pallas program for its feature
    shard into ALL targets.  ``N`` must be a multiple of mesh size × the
    kernel's 128-lane group."""
    from ..kernels.lk_pallas import lk_all_levels_pallas

    feat = PSpec(TARGET_AXIS)

    def body(pts_local):
        return lk_all_levels_pallas(
            prev_levels, next_images_stacked, pts_local,
            dims=dims, win=win, max_iters=max_iters, eps2=eps2,
            min_eig_thr=min_eig_thr, interpret=interpret,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(feat,),
        out_specs=(
            PSpec(None, TARGET_AXIS),
            PSpec(None, TARGET_AXIS),
            PSpec(None, TARGET_AXIS),
        ),
        check_vma=False,
    )
    return fn(pts)


_sharded_lk_multi_pallas_feat_jit = partial(
    jax.jit,
    static_argnames=(
        "mesh", "dims", "win", "max_iters", "eps2", "min_eig_thr",
        "interpret",
    ),
)(_sharded_lk_multi_pallas_feat)


def sharded_lk_multi_pallas_feat(mesh, prev_levels, next_images_stacked,
                                 pts, **kw):
    """Jitted on real backends; interpret mode (CPU tests) stays eager —
    jit-of-shard_map-of-interpreted-pallas miscomputes."""
    fn = (
        _sharded_lk_multi_pallas_feat
        if kw.get("interpret") else _sharded_lk_multi_pallas_feat_jit
    )
    return fn(mesh, prev_levels, next_images_stacked, pts, **kw)


def _sharded_lk_multi_pallas(
    mesh: Mesh,
    prev_levels,            # per level: (img_pad, dx_pad, dy_pad)
    next_images_stacked,    # per level: (T, Hp, Wp) — sharded on T
    pts,
    *,
    dims,
    win: int,
    max_iters: int,
    eps2: float,
    min_eig_thr: float,
    interpret: bool = False,
):
    """Target-sharded Analyze over the Pallas kernel path.

    Each device runs the full coarse-to-fine Pallas program on its local
    shard of the stacked target images (kernels/lk_pallas.py); the prep
    kernel runs replicated per device.  ``T`` must divide the mesh size.
    """
    from ..kernels.lk_pallas import lk_all_levels_pallas

    target = PSpec(TARGET_AXIS)

    def body(next_images_local):
        return lk_all_levels_pallas(
            prev_levels, next_images_local, pts,
            dims=dims, win=win, max_iters=max_iters, eps2=eps2,
            min_eig_thr=min_eig_thr, interpret=interpret,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(tuple(target for _ in next_images_stacked),),
        out_specs=(target, target, target),
        check_vma=False,
    )
    return fn(next_images_stacked)


_sharded_lk_multi_pallas_jit = partial(
    jax.jit,
    static_argnames=(
        "mesh", "dims", "win", "max_iters", "eps2", "min_eig_thr",
        "interpret",
    ),
)(_sharded_lk_multi_pallas)


def sharded_lk_multi_pallas(mesh, prev_levels, next_images_stacked, pts,
                            **kw):
    """Jitted on real backends; interpret mode (CPU tests) stays eager —
    jit-of-shard_map-of-interpreted-pallas miscomputes."""
    fn = (
        _sharded_lk_multi_pallas
        if kw.get("interpret") else _sharded_lk_multi_pallas_jit
    )
    return fn(mesh, prev_levels, next_images_stacked, pts, **kw)
