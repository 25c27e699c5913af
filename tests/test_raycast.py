"""Ray casting tests: brute-force MT vs analytic expectations + Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np

from polychase_tpu.engine import raycast as RC
from polychase_tpu.engine.geometry import Mesh, set_mask_bits


def make_quad_mesh(z=0.0):
    """Two triangles forming the unit quad [0,1]² at depth z."""
    vertices = np.array(
        [[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z]], np.float32
    )
    triangles = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    return Mesh.create(vertices, triangles)


def test_raycast_hits_quad():
    mesh = make_quad_mesh(z=0.0)
    origins = jnp.array([[0.25, 0.25, 5.0], [0.75, 0.75, 5.0], [2.0, 2.0, 5.0]])
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    hits = RC.raycast(mesh, origins, dirs)
    valid = np.asarray(hits.valid)
    assert valid.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(hits.t)[:2], [5.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hits.pos)[0], [0.25, 0.25, 0.0], atol=1e-5
    )
    # prim 0 is the lower triangle (contains (0.75, 0.25)); (0.25,0.25) is on
    # its edge-ish; just check ids are in range and normals unit-length
    assert np.all(np.asarray(hits.prim_id)[:2] <= 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(hits.normal)[:2], axis=-1), 1.0, atol=1e-5
    )


def test_raycast_closest_hit_of_two_layers():
    """Two stacked quads: must return the nearer one."""
    v0 = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    v1 = v0 + np.array([0, 0, 2], np.float32)
    vertices = np.concatenate([v0, v1])
    triangles = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.uint32
    )
    mesh = Mesh.create(vertices, triangles)
    hits = RC.raycast(
        mesh, jnp.array([[0.5, 0.5, 5.0]]), jnp.array([[0.0, 0.0, -1.0]])
    )
    assert bool(hits.valid[0])
    np.testing.assert_allclose(float(hits.t[0]), 3.0, atol=1e-5)  # z=2 layer
    assert int(hits.prim_id[0]) >= 2


def test_raycast_mask_semantics():
    """Masked closest triangle → miss, even if an unmasked one is behind
    (cpp/ray_casting.cc:100-120)."""
    v0 = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    v1 = v0 + np.array([0, 0, 2], np.float32)
    vertices = np.concatenate([v0, v1])
    triangles = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.uint32
    )
    mesh = Mesh.create(vertices, triangles)
    # mask the near quad (prims 2, 3 at z=2)
    masked = np.asarray(mesh.masked_triangles)
    masked = set_mask_bits(masked, 2, "mask")
    masked = set_mask_bits(masked, 3, "mask")
    mesh = mesh.with_masked(masked)

    origins = jnp.array([[0.5, 0.5, 5.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0]])
    hits = RC.raycast(mesh, origins, dirs, check_mask=True)
    assert not bool(hits.valid[0])  # masked still occludes
    hits2 = RC.raycast(mesh, origins, dirs, check_mask=False)
    assert bool(hits2.valid[0])
    np.testing.assert_allclose(float(hits2.t[0]), 3.0, atol=1e-5)


def test_raycast_many_rays_chunking(rng):
    """Chunked scan must agree with per-ray analytic solution on a sphere."""
    # icosphere-ish: random triangles on plane z = -1 tiled grid
    mesh = make_quad_mesh(z=-1.0)
    n = 257  # not a multiple of anything
    px = rng.uniform(0.05, 0.95, n).astype(np.float32)
    py = rng.uniform(0.05, 0.95, n).astype(np.float32)
    origins = jnp.asarray(np.stack([px, py, np.full(n, 3.0)], -1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    hits = RC.raycast(mesh, origins, dirs, chunk=1)
    assert bool(np.all(hits.valid))
    np.testing.assert_allclose(np.asarray(hits.t), 4.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(hits.pos)[:, :2], np.stack([px, py], -1), atol=1e-4
    )


def test_intersect_ray_plane_jacobians():
    origin = jnp.array([0.1, -0.2, 3.0])
    direction = jnp.array([0.05, 0.02, -1.0])
    p0 = jnp.array([0.0, 0.0, 0.5])
    n = jnp.array([0.1, 0.3, 1.0])

    x, jo, jd, ok = RC.intersect_ray_plane_jac(origin, direction, p0, n)
    assert bool(ok)
    # point on plane
    np.testing.assert_allclose(float(jnp.dot(x - p0, n)), 0.0, atol=1e-5)

    def f_origin(o):
        xx, *_ = RC.intersect_ray_plane_jac(o, direction, p0, n)
        return xx

    def f_dir(d):
        xx, *_ = RC.intersect_ray_plane_jac(origin, d, p0, n)
        return xx

    np.testing.assert_allclose(
        np.asarray(jo), np.asarray(jax.jacfwd(f_origin)(origin)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jd), np.asarray(jax.jacfwd(f_dir)(direction)), atol=1e-4
    )


def test_intersect_ray_triangle_matches_plane():
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    p3 = jnp.array([0.0, 1.0, 0.0])
    origin = jnp.array([0.2, 0.3, 2.0])
    direction = jnp.array([0.0, 0.0, -1.0])
    x, ok = RC.intersect_ray_triangle(origin, direction, p1, p2, p3)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), [0.2, 0.3, 0.0], atol=1e-6)
    # outside the triangle
    x2, ok2 = RC.intersect_ray_triangle(
        jnp.array([0.9, 0.9, 2.0]), direction, p1, p2, p3
    )
    assert not bool(ok2)


def test_get_ray_object_space_identity():
    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine.geometry import SceneTransformations

    intr = C.Intrinsics.create(
        fx=-100.0, fy=-100.0, cx=50.0, cy=50.0, aspect_ratio=1.0,
        width=100.0, height=100.0, convention=C.OPENGL,
    )
    scene = SceneTransformations(jnp.eye(4), jnp.eye(4), intr)
    origin, direction = RC.get_ray_object_space(scene, jnp.array([50.0, 50.0]))
    np.testing.assert_allclose(np.asarray(origin), 0.0, atol=1e-6)
    # center pixel looks straight down -Z in OpenGL
    np.testing.assert_allclose(np.asarray(direction), [0, 0, -1], atol=1e-6)


def test_raycast_grouped_matches_flat(rng):
    """The shared-origin (factored Moller-Trumbore) cast returns the same
    hits as the general brute-force cast."""
    from polychase_tpu.engine.raycast import raycast, raycast_grouped
    from synthetic import make_sphere_mesh

    mesh = make_sphere_mesh()
    # mask a few triangles to exercise mask-occlusion parity
    from polychase_tpu.engine.geometry import mask_array_size
    bits = np.zeros(mask_array_size(mesh.num_triangles), np.uint32)
    for t in range(0, 20, 3):
        bits[t // 32] |= np.uint32(1 << (t % 32))
    mesh = mesh._replace(masked_triangles=jnp.asarray(bits))

    G, K = 3, 64
    origins = np.array(
        [[0, 0, 4], [2.5, 0.5, 3], [-1, 2, 3.5]], np.float32
    )
    dirs = np.zeros((G, K, 3), np.float32)
    for g in range(G):
        targets = rng.uniform(-1.2, 1.2, (K, 3)).astype(np.float32)
        dirs[g] = targets - origins[g]

    grouped = raycast_grouped(
        mesh, jnp.asarray(origins), jnp.asarray(dirs), True
    )
    flat = raycast(
        mesh,
        jnp.asarray(np.repeat(origins, K, axis=0)),
        jnp.asarray(dirs.reshape(-1, 3)),
        True,
    )
    g_valid = np.asarray(grouped.valid).reshape(-1)
    f_valid = np.asarray(flat.valid)
    assert np.array_equal(g_valid, f_valid)
    assert g_valid.sum() > G * K // 3
    assert np.array_equal(
        np.asarray(grouped.prim_id).reshape(-1)[f_valid],
        np.asarray(flat.prim_id)[f_valid],
    )
    np.testing.assert_allclose(
        np.asarray(grouped.pos).reshape(-1, 3)[f_valid],
        np.asarray(flat.pos)[f_valid],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(grouped.t).reshape(-1)[f_valid],
        np.asarray(flat.t)[f_valid],
        rtol=1e-4,
    )


def test_raycast_grouped_chunked_matches_default(rng):
    """Forcing a small triangle chunk (multi-block lax.scan, winner
    carried across block boundaries) returns the same hits as the
    single-block power-of-two cover, including the post-scan
    barycentric recompute for winners found in any block."""
    from polychase_tpu.engine.raycast import raycast_grouped
    from synthetic import make_sphere_mesh

    mesh = make_sphere_mesh()
    G, K = 2, 48
    origins = np.array([[0, 0, 4], [1.5, -0.5, 3]], np.float32)
    dirs = np.zeros((G, K, 3), np.float32)
    for g in range(G):
        targets = rng.uniform(-1.1, 1.1, (K, 3)).astype(np.float32)
        dirs[g] = targets - origins[g]

    full = raycast_grouped(mesh, jnp.asarray(origins), jnp.asarray(dirs))
    parts = raycast_grouped(
        mesh, jnp.asarray(origins), jnp.asarray(dirs), chunk=64
    )
    assert np.array_equal(np.asarray(full.valid), np.asarray(parts.valid))
    v = np.asarray(full.valid)
    assert v.sum() > G * K // 3
    assert np.array_equal(
        np.asarray(full.prim_id)[v], np.asarray(parts.prim_id)[v]
    )
    np.testing.assert_allclose(
        np.asarray(full.barycentric)[v],
        np.asarray(parts.barycentric)[v],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(full.pos)[v], np.asarray(parts.pos)[v], atol=1e-6
    )
