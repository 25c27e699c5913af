"""Parity and lowering pins for the whole-solve Pallas LM PnP kernel
(kernels/pnp_pallas.py) against the XLA reference implementation
(engine/pnp.solve_arrays -> engine/levmarq.lm_solve)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.levmarq import BundleOptions
from polychase_tpu.engine.pnp import pack_camera_params, solve_arrays
from polychase_tpu.kernels.pnp_pallas import MAX_POINTS, solve_arrays_pallas


def _scene(n=300, n_masked=50, seed=0, behind=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3)).astype(np.float32)
    X[:, 2] -= 6.0  # in front of an OpenGL camera (sign = -1)
    if behind:
        X[:behind, 2] += 14.0  # a few points behind the camera
    intr = C.Intrinsics.create(
        1800.0, 1800.0, 960.0, 540.0, 1.0, 1920, 1080
    )
    q_gt = np.array([0.99, 0.05, -0.08, 0.03], np.float32)
    q_gt /= np.linalg.norm(q_gt)
    t_gt = np.array([0.1, -0.2, 0.3], np.float32)
    pose_gt = P.Pose(jnp.asarray(q_gt), jnp.asarray(t_gt))
    x = np.asarray(
        jax.device_get(
            C.project(intr, P.pose_apply(pose_gt, jnp.asarray(X)))
        )
    ) + rng.normal(scale=0.4, size=(n, 2)).astype(np.float32)
    mask = np.ones(n, bool)
    if n_masked:
        mask[-n_masked:] = False
    w = np.where(mask, 1.0, 0.0).astype(np.float32)

    q0 = q_gt + np.array([0.01, -0.02, 0.015, 0.01], np.float32)
    q0 /= np.linalg.norm(q0)
    cam0 = C.CameraState(
        intr, P.Pose(jnp.asarray(q0), jnp.asarray(
            np.array([0.15, -0.1, 0.2], np.float32)
        ))
    )
    params = pack_camera_params(jax.device_get(cam0), 12.0)
    return X, x, w, mask, params, q_gt, t_gt


def _both(X, x, w, mask, params, opts, opt_f=False, opt_pp=False):
    ref = np.asarray(
        jax.device_get(
            solve_arrays(
                jnp.asarray(X), jnp.asarray(x), jnp.asarray(w),
                jnp.asarray(mask), jnp.asarray(params),
                opt_f=opt_f, opt_pp=opt_pp, opts=opts,
            )
        )
    )
    got = np.asarray(
        jax.device_get(
            solve_arrays_pallas(
                jnp.asarray(X), jnp.asarray(x), jnp.asarray(w),
                jnp.asarray(mask), jnp.asarray(params),
                opt_f=opt_f, opt_pp=opt_pp, opts=opts, interpret=True,
            )
        )
    )
    return ref, got


@pytest.mark.parametrize("loss_type", [0, 1, 2])
@pytest.mark.parametrize("ftol", [0.0, 1e-5])
def test_parity_losses(loss_type, ftol):
    X, x, w, mask, params, q_gt, t_gt = _scene()
    opts = BundleOptions(
        max_iterations=30, loss_type=loss_type, function_tol=ftol
    )
    ref, got = _both(X, x, w, mask, params, opts)
    # Pose parameters at float tolerance (different reduction order);
    # both must sit on the same optimum.
    np.testing.assert_allclose(got[:7], ref[:7], atol=5e-4)
    # Inlier ratio identical, costs within relative tolerance.
    np.testing.assert_allclose(got[18], ref[18], atol=1e-3)
    np.testing.assert_allclose(got[13], ref[13], rtol=1e-3)
    # Ground truth actually recovered (sanity of the test itself).
    err_q = min(
        np.linalg.norm(got[:4] - q_gt), np.linalg.norm(got[:4] + q_gt)
    )
    assert err_q < 2e-3
    assert np.abs(got[4:7] - t_gt).max() < 2e-2


def test_parity_behind_camera():
    X, x, w, mask, params, _, _ = _scene(behind=40)
    opts = BundleOptions(max_iterations=30, loss_type=2,
                         function_tol=1e-5)
    ref, got = _both(X, x, w, mask, params, opts)
    np.testing.assert_allclose(got[:7], ref[:7], atol=5e-4)
    np.testing.assert_allclose(got[18], ref[18], atol=1e-3)


def test_parity_all_masked_off():
    """Degenerate case: no valid points — must not produce NaN."""
    X, x, w, mask, params, _, _ = _scene()
    mask[:] = False
    w[:] = 0.0
    opts = BundleOptions(max_iterations=10, loss_type=1)
    ref, got = _both(X, x, w, mask, params, opts)
    assert np.all(np.isfinite(got[:11]))
    np.testing.assert_allclose(got[:7], ref[:7], atol=1e-5)
    assert got[18] == 0.0


def test_non_multiple_of_lane_n():
    """Point counts that need padding to the (8, C) layout."""
    X, x, w, mask, params, _, _ = _scene(n=333, n_masked=20)
    opts = BundleOptions(max_iterations=30, loss_type=1,
                         function_tol=1e-5)
    ref, got = _both(X, x, w, mask, params, opts)
    np.testing.assert_allclose(got[:7], ref[:7], atol=5e-4)
    np.testing.assert_allclose(got[18], ref[18], atol=1e-3)


def _scene_cv(n=300, seed=3, f_err=1.0, pp_err=(0.0, 0.0), n_valid=None):
    """OpenCV-convention scene (positive focal, +Z forward) for the
    variable-intrinsics cases: the FOV bounds of camera.intrinsics_bounds
    assume sign-consistent focals."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3)).astype(np.float32)
    X[:, 2] += 6.0
    intr_gt = C.Intrinsics.create(
        1800.0, 1800.0, 960.0, 540.0, 1.0, 1920, 1080, C.OPENCV
    )
    q_gt = np.array([0.99, 0.05, -0.08, 0.03], np.float32)
    q_gt /= np.linalg.norm(q_gt)
    t_gt = np.array([0.1, -0.2, 0.3], np.float32)
    pose_gt = P.Pose(jnp.asarray(q_gt), jnp.asarray(t_gt))
    x = np.asarray(
        jax.device_get(
            C.project(intr_gt, P.pose_apply(pose_gt, jnp.asarray(X)))
        )
    ) + rng.normal(scale=0.3, size=(n, 2)).astype(np.float32)
    mask = np.ones(n, bool)
    if n_valid is not None:
        mask[n_valid:] = False
    w = np.where(mask, 1.0, 0.0).astype(np.float32)

    intr0 = C.Intrinsics.create(
        1800.0 * f_err, 1800.0 * f_err,
        960.0 + pp_err[0], 540.0 + pp_err[1],
        1.0, 1920, 1080, C.OPENCV,
    )
    q0 = q_gt + np.array([0.01, -0.02, 0.015, 0.01], np.float32)
    q0 /= np.linalg.norm(q0)
    cam0 = C.CameraState(
        intr0, P.Pose(jnp.asarray(q0), jnp.asarray(
            np.array([0.15, -0.1, 0.2], np.float32)
        ))
    )
    params = pack_camera_params(jax.device_get(cam0), 12.0)
    return X, x, w, mask, params


@pytest.mark.parametrize(
    "opt_f,opt_pp", [(True, False), (False, True), (True, True)]
)
def test_parity_variable_intrinsics(opt_f, opt_pp):
    """9-param solves: the reference's -12.5% focal / 8px pp recovery."""
    X, x, w, mask, params = _scene_cv(
        f_err=0.875 if opt_f else 1.0,
        pp_err=(8.0, -6.0) if opt_pp else (0.0, 0.0),
    )
    opts = BundleOptions(max_iterations=50, loss_type=1,
                         function_tol=1e-5)
    ref, got = _both(X, x, w, mask, params, opts,
                     opt_f=opt_f, opt_pp=opt_pp)
    np.testing.assert_allclose(got[:7], ref[:7], atol=1e-3)
    # intrinsics land on the same optimum (f within 0.2%, pp within 1px)
    np.testing.assert_allclose(got[7:11], ref[7:11],
                               rtol=2e-3, atol=1.0)
    if opt_f:
        assert abs(got[8] - 1800.0) < 25.0  # focal actually recovered
    if opt_pp:
        assert abs(got[9] - 960.0) < 4.0
        assert abs(got[10] - 540.0) < 4.0


def test_intrinsics_gate_3_points():
    """<=3 valid points: intrinsics must stay frozen in both arms
    (cpp/pnp/pnp_problem.h:34-35)."""
    X, x, w, mask, params = _scene_cv(f_err=0.9, n_valid=3)
    opts = BundleOptions(max_iterations=20, loss_type=0)
    ref, got = _both(X, x, w, mask, params, opts,
                     opt_f=True, opt_pp=True)
    np.testing.assert_allclose(got[7:11], params[7:11], atol=0.0)
    np.testing.assert_allclose(ref[7:11], params[7:11], atol=0.0)
    np.testing.assert_allclose(got[:7], ref[:7], atol=5e-4)


def test_tpu_lowering():
    """Full Mosaic verification without hardware (CLAUDE.md: interpret
    mode does NOT catch layout/lowering errors; jax.export does)."""
    from functools import partial

    N = 2048
    args = (
        jnp.zeros((N, 3), jnp.float32), jnp.zeros((N, 2), jnp.float32),
        jnp.zeros((N,), jnp.float32), jnp.zeros((N,), bool),
        jnp.zeros((16,), jnp.float32),
    )
    for lt in (0, 1, 2):
        opts = BundleOptions(
            max_iterations=30, loss_type=lt, function_tol=1e-5
        )
        fn = jax.jit(
            partial(solve_arrays_pallas, opts=opts, interpret=False)
        )
        jax.export.export(fn, platforms=("tpu",))(*args)
    # The 9-param variable-intrinsics variant lowers too.
    opts = BundleOptions(max_iterations=30, loss_type=1,
                         function_tol=1e-5)
    fn = jax.jit(
        partial(solve_arrays_pallas, opt_f=True, opt_pp=True,
                opts=opts, interpret=False)
    )
    jax.export.export(fn, platforms=("tpu",))(*args)


def test_tpu_lowering_vmap():
    """The segment-parallel tracking path (parallel/tracking.py) vmaps
    the scan chain over segments; pin that a vmapped kernel solve still
    lowers for TPU before routing it there."""
    from functools import partial

    S, N = 4, 1024
    args = (
        jnp.zeros((S, N, 3), jnp.float32),
        jnp.zeros((S, N, 2), jnp.float32),
        jnp.zeros((S, N), jnp.float32), jnp.zeros((S, N), bool),
        jnp.zeros((S, 16), jnp.float32),
    )
    opts = BundleOptions(max_iterations=30, loss_type=1,
                         function_tol=1e-5)
    fn = jax.jit(
        jax.vmap(partial(solve_arrays_pallas, opts=opts,
                         interpret=False))
    )
    jax.export.export(fn, platforms=("tpu",))(*args)


def test_vmap_batched_parity_interpret():
    """The custom_vmap rule maps vmap onto the kernel's batch grid; the
    batched result must equal per-item single solves (the grid programs
    each index their own scalar-prefetch row)."""
    from functools import partial

    scenes = [_scene(seed=s, n=256, n_masked=17 * s) for s in range(3)]
    X = jnp.stack([jnp.asarray(s[0]) for s in scenes])
    x = jnp.stack([jnp.asarray(s[1]) for s in scenes])
    w = jnp.stack([jnp.asarray(s[2]) for s in scenes])
    mask = jnp.stack([jnp.asarray(s[3]) for s in scenes])
    params = jnp.stack([jnp.asarray(s[4]) for s in scenes])
    opts = BundleOptions(max_iterations=30, loss_type=1,
                         function_tol=1e-5)
    solve = partial(solve_arrays_pallas, opts=opts, interpret=True)
    got = np.asarray(jax.device_get(jax.vmap(solve)(X, x, w, mask, params)))
    for s in range(3):
        ref = np.asarray(
            jax.device_get(
                solve(X[s], x[s], w[s], mask[s], params[s])
            )
        )
        np.testing.assert_array_equal(got[s], ref)


def test_max_points_routing_guard():
    assert MAX_POINTS >= 16384
