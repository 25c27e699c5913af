"""Grid-accelerated raycast vs the brute-force sweep (exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from polychase_tpu.engine.geometry import Mesh, set_mask_bits
from polychase_tpu.engine.gridcast import (
    build_grid_accel,
    grid_raycast,
    grid_raycast_grouped,
)
from polychase_tpu.engine.raycast import INVALID_ID, raycast, raycast_grouped

from synthetic import make_sphere_mesh


def _rand_rays(rng, n, radius=4.0):
    """Rays from random points on a sphere of ``radius`` aimed at jittered
    points near the origin: a mix of hits and misses."""
    o = rng.normal(size=(n, 3))
    o = radius * o / np.linalg.norm(o, axis=-1, keepdims=True)
    target = rng.normal(0, 0.8, size=(n, 3))
    d = target - o
    return o.astype(np.float32), d.astype(np.float32)


def _assert_hits_match(a, b, atol=1e-4):
    av = np.asarray(a.valid)
    bv = np.asarray(b.valid)
    np.testing.assert_array_equal(av, bv)
    np.testing.assert_array_equal(
        np.asarray(a.prim_id)[av], np.asarray(b.prim_id)[bv]
    )
    np.testing.assert_allclose(
        np.asarray(a.t)[av], np.asarray(b.t)[bv], rtol=1e-4, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.pos)[av], np.asarray(b.pos)[bv], rtol=1e-4, atol=atol
    )


@pytest.mark.parametrize("n_lat,n_lon", [(8, 12), (24, 32)])
def test_grid_matches_brute_on_sphere(n_lat, n_lon):
    rng = np.random.default_rng(0)
    mesh = make_sphere_mesh(n_lat, n_lon)
    verts, tris = np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    accel = build_grid_accel(verts, tris)
    o, d = _rand_rays(rng, 257)
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d))
    assert int(np.asarray(want.valid).sum()) > 50
    assert int(np.asarray(want.valid).sum()) < 257
    _assert_hits_match(got, want)


def test_grid_matches_brute_on_soup():
    rng = np.random.default_rng(1)
    n_tri = 400
    centers = rng.uniform(-2, 2, (n_tri, 1, 3))
    verts = (centers + rng.normal(0, 0.25, (n_tri, 3, 3))).reshape(-1, 3)
    tris = np.arange(3 * n_tri, dtype=np.uint32).reshape(-1, 3)
    mesh = Mesh.create(verts.astype(np.float32), tris)
    accel = build_grid_accel(verts, tris)
    o, d = _rand_rays(rng, 513, radius=6.0)
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d))
    assert int(np.asarray(want.valid).sum()) > 100
    _assert_hits_match(got, want)


def test_grid_mask_semantics():
    """Masked triangles occlude but are discarded, like the reference."""
    rng = np.random.default_rng(2)
    base = make_sphere_mesh(12, 16)
    verts, tris = np.asarray(base.vertices), np.asarray(base.triangles)
    masked = np.zeros(base.masked_triangles.shape, np.uint32)
    for t in range(0, len(tris), 3):
        masked = set_mask_bits(masked, t, "mask")
    mesh = Mesh.create(verts, tris, masked)
    accel = build_grid_accel(verts, tris)
    o, d = _rand_rays(rng, 129)
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d), True)
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d), True)
    _assert_hits_match(got, want)
    # Some rays must have been discarded by the mask (hit-then-masked).
    nomask = grid_raycast(
        mesh, accel, jnp.asarray(o), jnp.asarray(d), False
    )
    assert int(np.asarray(nomask.valid).sum()) > int(
        np.asarray(got.valid).sum()
    )


def test_grid_axis_aligned_and_inside():
    mesh = make_sphere_mesh(10, 14)
    verts, tris = np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    accel = build_grid_accel(verts, tris)
    o = np.array(
        [
            [0.0, 0.0, 0.0],  # inside the sphere
            [3.0, 0.0, 0.0],  # outside, axis-aligned (two zero dirs)
            [0.0, -5.0, 0.2],
            [3.0, 3.0, 3.0],  # pointing away: miss
        ],
        np.float32,
    )
    d = np.array(
        [
            [0.0, 0.0, 1.0],
            [-1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [1.0, 1.0, 1.0],
        ],
        np.float32,
    )
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d))
    _assert_hits_match(got, want)
    assert bool(np.asarray(got.valid)[0])
    assert bool(np.asarray(got.valid)[1])
    assert not bool(np.asarray(got.valid)[3])


def test_grid_grouped_wrapper():
    rng = np.random.default_rng(3)
    mesh = make_sphere_mesh(8, 12)
    verts, tris = np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    accel = build_grid_accel(verts, tris)
    G, K = 4, 64
    origins = rng.normal(size=(G, 3)).astype(np.float32)
    origins = 4.0 * origins / np.linalg.norm(origins, axis=-1, keepdims=True)
    dirs = (
        rng.normal(0, 0.5, (G, K, 3)) - origins[:, None, :]
    ).astype(np.float32)
    got = grid_raycast_grouped(
        mesh, accel, jnp.asarray(origins), jnp.asarray(dirs)
    )
    want = raycast_grouped(mesh, jnp.asarray(origins), jnp.asarray(dirs))
    _assert_hits_match(got, want)


def test_grid_build_huge_triangle_coarsens():
    """One ground-plane triangle spanning everything must not explode the
    item lists: the build halves resolution until binning stays sane."""
    rng = np.random.default_rng(4)
    base = make_sphere_mesh(16, 24)
    verts, tris = np.asarray(base.vertices), np.asarray(base.triangles)
    ground = np.array(
        [[-50, -50, -2], [50, -50, -2], [0, 80, -2]], np.float32
    )
    verts2 = np.concatenate([verts, ground]).astype(np.float32)
    tris2 = np.concatenate(
        [tris, [[len(verts), len(verts) + 1, len(verts) + 2]]]
    ).astype(np.uint32)
    mesh = Mesh.create(verts2, tris2)
    accel = build_grid_accel(verts2, tris2)
    assert accel.items.shape[0] <= 12 * len(tris2) + 8

    o, d = _rand_rays(rng, 129, radius=8.0)
    # Aim some rays downwards so the ground plane is hit too.
    d[:32] = np.array([0.1, 0.05, -1.0], np.float32)
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d))
    _assert_hits_match(got, want)
    assert np.uint32(len(tris2) - 1) in np.asarray(got.prim_id)


def test_grid_empty_mesh():
    mesh = Mesh.create(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint32))
    accel = build_grid_accel(mesh.vertices, mesh.triangles)
    o = np.zeros((5, 3), np.float32)
    d = np.tile(np.array([0, 0, 1.0], np.float32), (5, 1))
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    assert not np.asarray(got.valid).any()
    assert (np.asarray(got.prim_id) == np.uint32(INVALID_ID)).all()


def test_grid_build_respects_cell_budget_on_thin_mesh():
    """A flat (nearly 2-D) mesh must not explode the cell count via the
    degenerate axis clamping to one cell."""
    rng = np.random.default_rng(5)
    n_tri = 20000
    centers = rng.uniform(-1, 1, (n_tri, 1, 2))
    v2 = (centers + rng.normal(0, 0.004, (n_tri, 3, 2))).reshape(-1, 2)
    verts = np.concatenate(
        [v2, np.zeros((len(v2), 1), np.float32)], axis=1
    ).astype(np.float32)
    tris = np.arange(3 * n_tri, dtype=np.uint32).reshape(-1, 3)
    accel = build_grid_accel(verts, tris, max_cells=1 << 18)
    n_cells = int(np.prod(np.asarray(accel.res)))
    assert n_cells <= (1 << 18), n_cells

    mesh = Mesh.create(verts, tris)
    o = np.array([[0.2, -0.1, 2.0], [5.0, 5.0, 5.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], np.float32)
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    want = raycast(mesh, jnp.asarray(o), jnp.asarray(d))
    _assert_hits_match(got, want)


def test_grid_degenerate_axis_ray_outside_slab():
    """d==0 on an axis with the origin outside that slab must reject
    immediately (regression: the override used to re-sort into an
    unconstrained interval)."""
    mesh = make_sphere_mesh(8, 12)
    accel = build_grid_accel(
        np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    )
    o = np.array([[0.0, 2.5, 0.0]], np.float32)  # outside the y slab
    d = np.array([[1.0, 0.0, 0.0]], np.float32)  # parallel to it
    got = grid_raycast(mesh, accel, jnp.asarray(o), jnp.asarray(d))
    assert not bool(np.asarray(got.valid)[0])
