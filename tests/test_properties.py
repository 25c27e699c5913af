"""Property-based invariants for the math core (hypothesis).

These pin algebraic laws the solvers rely on — quaternion group
structure, pose composition round-trips, projection inverses, greedy
suppression invariants — over randomized inputs rather than the
hand-picked cases in the unit suites.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax

jax.config.update("jax_platforms", "cpu")

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P

finite = st.floats(-10.0, 10.0, allow_nan=False, width=32)


def _quat(draw_vals):
    q = np.asarray(draw_vals, np.float32)
    n = np.linalg.norm(q)
    if n < 1e-3:
        q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        n = 1.0
    return q / n


quat_st = st.lists(finite, min_size=4, max_size=4).map(_quat)
vec3_st = st.lists(finite, min_size=3, max_size=3).map(
    lambda v: np.asarray(v, np.float32)
)


@settings(max_examples=40, deadline=None)
@given(quat_st, vec3_st)
def test_quat_rotation_preserves_norm_and_inverts(q, v):
    r = np.asarray(P.quat_rotate(q, v))
    np.testing.assert_allclose(
        np.linalg.norm(r), np.linalg.norm(v), rtol=1e-4, atol=1e-4
    )
    back = np.asarray(P.quat_rotate(P.quat_conj(q), r))
    np.testing.assert_allclose(back, v, rtol=1e-3, atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(quat_st, quat_st, vec3_st)
def test_quat_mul_is_composition(qa, qb, v):
    ab = np.asarray(P.quat_rotate(P.quat_mul(qa, qb), v))
    seq = np.asarray(P.quat_rotate(qa, P.quat_rotate(qb, v)))
    np.testing.assert_allclose(ab, seq, rtol=1e-3, atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(quat_st, vec3_st, vec3_st)
def test_pose_inverse_round_trip(q, t, p):
    pose = P.Pose(q=np.asarray(q), t=np.asarray(t))
    fwd = P.pose_apply(pose, p)
    back = np.asarray(P.pose_apply(P.pose_inverse(pose), fwd))
    np.testing.assert_allclose(back, p, rtol=1e-3, atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(quat_st, vec3_st)
def test_pose_matrix_round_trip(q, t):
    pose = P.Pose(q=np.asarray(q), t=np.asarray(t))
    mat = P.pose_rt4x4(pose)
    back = P.pose_from_rt(mat)
    # q and -q encode the same rotation
    qb = np.asarray(back.q)
    if np.dot(qb, q) < 0:
        qb = -qb
    np.testing.assert_allclose(qb, q, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(back.t), t, rtol=1e-3, atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(quat_st, vec3_st)
def test_quat_exp_step_consistency(q, w):
    w = w * 0.01  # small tangent step
    stepped = np.asarray(P.quat_step_post(q, w))
    np.testing.assert_allclose(np.linalg.norm(stepped), 1.0, atol=1e-4)
    # zero step is the identity
    same = np.asarray(P.quat_step_post(q, np.zeros(3, np.float32)))
    np.testing.assert_allclose(same, q, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(
    st.sampled_from([C.OPENGL, C.OPENCV]),
    st.floats(50, 2000), st.floats(50, 2000),
    st.floats(100, 700), st.floats(100, 500),
)
def test_project_unproject_inverse(conv, fx, fy, px, py):
    intr = C.Intrinsics.create(
        fx=fx, fy=fy, cx=320.0, cy=240.0,
        aspect_ratio=fx / fy, width=640, height=480, convention=conv,
    )
    p = np.array([px, py], np.float32)
    d = np.asarray(C.unproject(intr, p))
    # the ray direction must reproject onto the source pixel for any
    # positive depth along it
    for depth in (0.5, 1.0, 7.0):
        rp = np.asarray(C.project(intr, d * depth))
        np.testing.assert_allclose(rp, p, rtol=1e-3, atol=2e-2)
    assert not bool(np.asarray(C.is_behind(intr, d)))


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.floats(3.0, 25.0))
def test_gftt_suppression_invariants(seed, min_distance):
    from polychase_tpu.engine.gftt import _min_distance_suppress

    rng = np.random.default_rng(seed)
    n = 400
    xs = rng.uniform(0, 320, n).astype(np.float32)
    ys = rng.uniform(0, 240, n).astype(np.float32)
    vals = np.sort(rng.uniform(0.1, 10, n).astype(np.float32))[::-1]
    ox, oy, oq = _min_distance_suppress(
        xs, ys, vals, 320, 240, float(min_distance), 0
    )
    # Kept corners are pairwise >= min(min_distance, round(min_distance))
    # apart: the greedy grid checks only the 3x3 cell neighborhood with
    # cell = round(min_distance) (cpp gftt / cv2 use cvRound), so for
    # FRACTIONAL min_distance a pair in cells two apart can be up to
    # 0.5 px closer than min_distance — OpenCV's own blind spot, which
    # the bit-equal reimplementation must reproduce, not fix.
    pts = np.stack([ox, oy], -1)
    guaranteed = min(float(min_distance), float(round(min_distance)))
    if len(pts) > 1:
        d2 = np.sum((pts[None] - pts[:, None]) ** 2, -1)
        d2[np.arange(len(pts)), np.arange(len(pts))] = np.inf
        assert d2.min() >= guaranteed**2 - 1e-3
    # visiting order: kept qualities are non-increasing
    assert np.all(np.diff(oq) <= 1e-6)
    # every dropped corner is within min_distance of some kept one
    kept = set(zip(ox.tolist(), oy.tolist()))
    for x, y in zip(xs, ys):
        if (x, y) in kept:
            continue
        dd = np.min((ox - x) ** 2 + (oy - y) ** 2)
        assert dd < float(min_distance) ** 2 + 1e-3


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 400))
def test_spatial_sort_inverse_permutation(seed, n):
    from polychase_tpu.engine.lk import _spatial_sort

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-5, 500, (n, 2)).astype(np.float32)
    pts[rng.random(n) < 0.05] = -0.0
    srt, inv = _spatial_sort(pts)
    if inv is None:
        np.testing.assert_array_equal(srt, pts)
    else:
        np.testing.assert_array_equal(srt[inv], pts)
        ref = np.lexsort((pts[:, 0], pts[:, 1]))
        np.testing.assert_array_equal(srt, pts[ref])


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 5000), st.integers(1, 12))
def test_pad_pts_step_and_eight_aligned(n, d):
    from polychase_tpu.engine.lk import _pad_pts

    pts = np.ones((n, 2), np.float32)
    out = _pad_pts(pts, d)
    assert out.shape[0] % d == 0
    assert out.shape[0] % 8 == 0
    assert out.shape[0] >= n
    np.testing.assert_array_equal(out[:n], pts)
    assert not out[n:].any()


@settings(max_examples=40, deadline=None)
@given(
    st.sampled_from([0, 1, 2]),
    st.floats(0.1, 10.0),
    st.lists(st.floats(0.0, 1e4), min_size=1, max_size=32),
)
def test_robust_loss_laws(loss_type, scale, r2s):
    """ρ must be non-decreasing with ρ(r²) ≤ r² (robustness), the IRLS
    weight in (0, 1] and non-increasing, and w = ρ' numerically."""
    from polychase_tpu.engine.levmarq import loss_value, loss_weight

    r2 = np.sort(np.asarray(r2s, np.float64))
    v = np.asarray(loss_value(loss_type, scale, r2), np.float64)
    w = np.asarray(loss_weight(loss_type, scale, r2), np.float64)
    assert np.all(np.diff(v) >= -1e-6 * np.maximum(1, v[:-1]))
    assert np.all(v <= r2 * (1 + 1e-5) + 1e-6)
    assert np.all(w > 0) and np.all(w <= 1 + 1e-6)
    assert np.all(np.diff(w) <= 1e-9)
    # w ≈ dρ/d(r²) by central differences away from the Huber kink
    h = np.maximum(r2 * 1e-4, 1e-6)
    lo = np.asarray(loss_value(loss_type, scale, r2 - h), np.float64)
    hi = np.asarray(loss_value(loss_type, scale, r2 + h), np.float64)
    num = (hi - lo) / (2 * h)
    kink = np.abs(r2 - scale * scale) < 10 * h
    ok = ~kink & (r2 > 1e-3)
    np.testing.assert_allclose(w[ok], num[ok], rtol=5e-2, atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 300))
def test_database_flow_round_trip(seed, n):
    import tempfile

    from polychase_tpu.io.database import Database

    rng = np.random.default_rng(seed)
    kps = rng.uniform(0, 4096, (max(n, 1), 2)).astype(np.float32)
    idx = np.sort(
        rng.choice(max(n, 1), size=rng.integers(0, max(n, 1) + 1),
                   replace=False)
    ).astype(np.uint32)
    tgt = rng.uniform(-100, 4200, (len(idx), 2)).astype(np.float32)
    err = rng.uniform(0, 50, len(idx)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        db = Database(td + "/f.db")
        db.write_keypoints(7, kps)
        db.write_image_pair_flow(7, 9, idx, tgt, err)
        np.testing.assert_array_equal(db.read_keypoints(7), kps)
        flow = db.read_image_pair_flow(7, 9)
        np.testing.assert_array_equal(flow.src_kps_indices, idx)
        np.testing.assert_array_equal(flow.tgt_kps, tgt)
        np.testing.assert_array_equal(flow.flow_errors, err)
        db.close()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_raycast_three_backends_agree(seed):
    """Fused device sweep, grid-DDA, and the native C++ BVH must agree
    on random triangle soups: identical hit sets, matching t (prim ids
    may differ only on exact-t ties, which random soups don't produce)."""
    import jax.numpy as jnp

    from polychase_tpu import native
    from polychase_tpu.engine.geometry import Mesh
    from polychase_tpu.engine.gridcast import build_grid_accel, grid_raycast
    from polychase_tpu.engine.raycast import raycast

    rng = np.random.default_rng(seed)
    n_tri = 120
    centers = rng.uniform(-2, 2, (n_tri, 1, 3))
    tris_v = centers + rng.uniform(-0.4, 0.4, (n_tri, 3, 3))
    verts = tris_v.reshape(-1, 3).astype(np.float32)
    tris = np.arange(3 * n_tri, dtype=np.uint32).reshape(-1, 3)
    mesh = Mesh.create(verts, tris)

    n_rays = 64
    o = rng.normal(size=(n_rays, 3))
    o = 5.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = rng.normal(0, 1.0, (n_rays, 3)) - o
    o32, d32 = o.astype(np.float32), d.astype(np.float32)

    sweep = raycast(mesh, jnp.asarray(o32), jnp.asarray(d32))
    grid = grid_raycast(
        mesh, build_grid_accel(verts, tris), jnp.asarray(o32),
        jnp.asarray(d32),
    )
    sv, gv = np.asarray(sweep.valid), np.asarray(grid.valid)
    np.testing.assert_array_equal(sv, gv)
    np.testing.assert_allclose(
        np.asarray(sweep.t)[sv], np.asarray(grid.t)[sv], rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(sweep.prim_id)[sv], np.asarray(grid.prim_id)[sv]
    )

    if native.available():
        _, _, _, bt, bprim = native.BvhRaycaster(verts, tris).raycast(
            o32, d32
        )
        bvalid = bprim != 0xFFFFFFFF
        np.testing.assert_array_equal(sv, bvalid)
        np.testing.assert_allclose(
            np.asarray(sweep.t)[sv], bt[sv], rtol=1e-3, atol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(sweep.prim_id)[sv],
                                      bprim[sv])


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(6, 40),
    st.floats(0.0, 0.25),
)
def test_pnp_host_recovers_random_poses(seed, n, pert):
    """Randomized PnP recovery: noiseless correspondences from a random
    pose must be recovered by the host solver from a perturbed start
    within the basin (sub-1e-3 pose error, inlier ratio 1)."""
    import jax.numpy as jnp

    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine import pose as P
    from polychase_tpu.engine.pnp import PnPOptions
    from polychase_tpu.engine.pnp_host import solve_pnp_host
    from synthetic import make_intrinsics

    rng = np.random.default_rng(seed)
    intr = make_intrinsics()
    X = rng.normal(0.0, 0.5, (n, 3)).astype(np.float32)
    w = rng.normal(0, 0.08, 3).astype(np.float32)
    q_true = np.asarray(P.quat_step_post(
        jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.asarray(w)))
    t_true = np.array(
        [rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
         rng.uniform(2.2, 4.5)], np.float32)
    pose_true = P.Pose(jnp.asarray(q_true), jnp.asarray(t_true))
    x = np.asarray(C.project(intr, P.pose_apply(pose_true, jnp.asarray(X))))
    # drop configurations that project off-frame (unconstrained columns)
    if not (
        (x[:, 0] > 5).all() and (x[:, 0] < intr.width - 5).all()
        and (x[:, 1] > 5).all() and (x[:, 1] < intr.height - 5).all()
    ):
        return
    dq = rng.normal(0, pert * 0.3, 3).astype(np.float32)
    q0 = np.asarray(P.quat_step_post(jnp.asarray(q_true), jnp.asarray(dq)))
    t0 = t_true + rng.normal(0, pert, 3).astype(np.float32)
    cam0 = C.CameraState(intr, P.Pose(jnp.asarray(q0), jnp.asarray(t0)))

    res = solve_pnp_host(X, x, cam0, PnPOptions())
    qr = np.asarray(res.camera.pose.q)
    if np.dot(qr, q_true) < 0:
        qr = -qr
    assert np.linalg.norm(qr - q_true) < 2e-3, (qr, q_true)
    assert np.linalg.norm(np.asarray(res.camera.pose.t) - t_true) < 5e-3
    assert float(res.inlier_ratio) == 1.0


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 500))
def test_mask_bitmask_round_trip(seed, n_tris):
    """set/clear on the packed u32 triangle mask must round-trip per
    triangle and never disturb neighbors."""
    from polychase_tpu.engine.geometry import (
        Mesh, mask_array_size, set_mask_bits,
    )

    rng = np.random.default_rng(seed)
    masked = np.zeros(mask_array_size(n_tris), np.uint32)
    want = np.zeros(n_tris, bool)
    for _ in range(40):
        idx = int(rng.integers(0, n_tris))
        op = rng.choice(["mask", "unmask"])
        masked = set_mask_bits(masked, idx, op)
        want[idx] = op == "mask"
    verts = rng.normal(size=(3 * n_tris, 3)).astype(np.float32)
    tris = np.arange(3 * n_tris, dtype=np.uint32).reshape(-1, 3)
    mesh = Mesh.create(verts, tris, masked)
    got = np.asarray(
        mesh.is_triangle_masked(np.arange(n_tris, dtype=np.int32))
    )
    np.testing.assert_array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.integers(-20, 20), st.integers(0, 40), st.integers(0, 2**32 - 1))
def test_trajectory_fill_clear_semantics(first, count, seed):
    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine import pose as P
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from synthetic import make_intrinsics

    rng = np.random.default_rng(seed)
    traj = CameraTrajectory(first, count)
    intr = make_intrinsics()
    filled = set()
    for _ in range(min(count, 15)):
        fid = int(rng.integers(first, first + count))
        traj.set(fid, C.CameraState(intr, P.Pose.identity()))
        filled.add(fid)
    for fid in range(first - 2, first + count + 2):
        inside = first <= fid < first + count
        assert traj.is_valid_frame(fid) == inside
        if not inside:
            # out-of-range access raises (reference semantics)
            with pytest.raises(IndexError):
                traj.get(fid)
            continue
        assert traj.is_frame_filled(fid) == (fid in filled)
        assert (traj.get(fid) is not None) == (fid in filled)
    if filled:
        fid = next(iter(filled))
        traj.clear(fid)
        assert not traj.is_frame_filled(fid)
    assert traj.count == count
    assert traj.first_frame == first
