"""Multi-chip sharding of the batched ray cast.

SURVEY §2.4: the reference's hot per-keypoint Embree loop
(cpp/tracker.cc:64-92, cpp/refiner.cc:307-349) becomes a single batched
sweep in this rebuild; across a device mesh the *ray axis* is
embarrassingly parallel — every chip casts its shard of the rays against
the replicated mesh with zero collectives (the only communication is the
result gather XLA inserts at the output sharding boundary).

Used by the sharded refiner for its prim-cache refresh: at F·K rays per
refresh (a 250-frame segment with 512 keypoint slots is 128k rays), the
sweep scales linearly with chip count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec
from jax import shard_map

from ..engine.geometry import Mesh as TriMesh
from ..engine.raycast import RayHits, raycast_grouped

RAY_AXIS = "rays"


def make_ray_mesh(devices=None) -> Mesh:
    """1-D device mesh over which ray groups are sharded."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (RAY_AXIS,))


def sharded_raycast_flat(
    mesh: Mesh,
    tri_mesh: TriMesh,
    origins: jax.Array,  # (N, 3)
    dirs: jax.Array,  # (N, 3)
    check_mask: bool = True,
) -> RayHits:
    """Flat-ray sharded cast: pads N up to a mesh-size multiple with dummy
    rays, shards, and slices the padding back off.  Used by the sharded
    refiner's prim refresh where N = frames × keypoint slots is arbitrary.
    """
    n = origins.shape[0]
    n_dev = int(mesh.devices.size)
    n_pad = -(-max(n, 1) // n_dev) * n_dev
    if n_pad != n:
        pad = n_pad - n
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 3), origins.dtype)]
        )
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], dirs.dtype), (pad, 3)
            )]
        )
    hits = sharded_raycast_grouped(
        mesh, tri_mesh,
        origins.reshape(n_pad, 3)[:, :],
        dirs.reshape(n_pad, 1, 3),
        check_mask=check_mask,
    )
    return RayHits(*(jnp.reshape(f, (n_pad,) + f.shape[2:])[:n]
                     for f in hits))


@partial(jax.jit, static_argnames=("mesh", "check_mask"))
def sharded_raycast_grouped(
    mesh: Mesh,
    tri_mesh: TriMesh,
    origins: jax.Array,  # (G, 3) — G must be a multiple of the mesh size
    dirs: jax.Array,  # (G, K, 3)
    check_mask: bool = True,
) -> RayHits:
    """Group-sharded closest-hit cast: each device sweeps its shard of
    the G ray groups against the replicated mesh.

    Identical results to engine.raycast.raycast_grouped; the group axis
    (frames, in the refiner) is the natural shard axis because every
    group already shares one origin.
    """
    G = origins.shape[0]
    n_dev = mesh.devices.size
    if G % n_dev != 0:
        raise ValueError(
            f"group count {G} not divisible by mesh size {n_dev}; pad "
            "groups (padding rays are masked by their validity anyway)"
        )
    if len(mesh.axis_names) != 1:
        raise ValueError("sharded raycast needs a 1-D device mesh")
    shard = PSpec(mesh.axis_names[0])  # any 1-D mesh axis works
    rep = PSpec()

    def body(origins_s, dirs_s, tri_mesh_r):
        return raycast_grouped(
            tri_mesh_r, origins_s, dirs_s, check_mask=check_mask
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(shard, shard, rep),
        out_specs=RayHits(
            pos=shard, normal=shard, barycentric=shard, t=shard,
            prim_id=shard, valid=shard,
        ),
        check_vma=False,
    )
    out_sh = NamedSharding(mesh, shard)
    rep_sh = NamedSharding(mesh, rep)
    origins = jax.device_put(origins, out_sh)
    dirs = jax.device_put(dirs, out_sh)
    tri_mesh = jax.device_put(tri_mesh, rep_sh)
    return fn(origins, dirs, tri_mesh)
