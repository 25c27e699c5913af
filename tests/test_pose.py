"""Tests for pose/quaternion math vs numpy/scipy references and autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from polychase_tpu.engine import pose as P


def random_quat(rng, n=()):
    q = rng.normal(size=(*n, 4)).astype(np.float32)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def to_scipy(q_wxyz):
    # scipy uses xyzw
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


def test_quat_to_mat_matches_scipy(rng):
    q = random_quat(rng, (32,))
    R = np.asarray(P.quat_to_mat(jnp.asarray(q)))
    R_ref = to_scipy(q).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_mat_to_quat_roundtrip(rng):
    q = random_quat(rng, (64,))
    # canonical sign
    q = np.where(q[..., :1] < 0, -q, q)
    R = P.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(P.mat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_mat_to_quat_edge_cases():
    # 180-degree rotations about each axis (trace = -1 branch)
    for axis in range(3):
        R = -np.eye(3, dtype=np.float32)
        R[axis, axis] = 1.0
        q = np.asarray(P.mat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(P.quat_to_mat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_mul_matches_scipy(rng):
    a, b = random_quat(rng, (16,)), random_quat(rng, (16,))
    got = np.asarray(P.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    ref = (to_scipy(a) * to_scipy(b)).as_quat()  # xyzw
    ref = np.roll(ref, 1, axis=-1)
    # sign ambiguity
    sign = np.sign(np.sum(got * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, ref * sign, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (8,))
    v = rng.normal(size=(8, 3)).astype(np.float32)
    got = np.asarray(P.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    ref = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pose_apply_center_inverse(rng):
    q = random_quat(rng)
    t = rng.normal(size=3).astype(np.float32)
    pose = P.Pose(jnp.asarray(q), jnp.asarray(t))
    p = rng.normal(size=3).astype(np.float32)

    y = P.pose_apply(pose, jnp.asarray(p))
    R = np.asarray(P.quat_to_mat(pose.q))
    np.testing.assert_allclose(np.asarray(y), R @ p + t, atol=1e-5)

    # center: R·c + t = 0
    c = np.asarray(P.pose_center(pose))
    np.testing.assert_allclose(R @ c + t, 0, atol=1e-5)

    inv = P.pose_inverse(pose)
    roundtrip = P.pose_apply(inv, y)
    np.testing.assert_allclose(np.asarray(roundtrip), p, atol=1e-5)


def test_pose_rt4x4_and_from_rt(rng):
    q = random_quat(rng)
    t = rng.normal(size=3).astype(np.float32)
    pose = P.Pose(jnp.asarray(q), jnp.asarray(t))
    m = P.pose_rt4x4(pose)
    assert m.shape == (4, 4)
    pose2 = P.pose_from_rt(m)
    sign = np.sign(np.sum(np.asarray(pose2.q) * q))
    np.testing.assert_allclose(np.asarray(pose2.q) * sign, q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pose2.t), t, atol=1e-6)

    # from_srt with scale folded in
    scale = np.diag([2.0, 3.0, 0.5, 1.0]).astype(np.float32)
    pose3 = P.pose_from_srt(jnp.asarray(np.asarray(m) @ scale))
    sign = np.sign(np.sum(np.asarray(pose3.q) * q))
    np.testing.assert_allclose(np.asarray(pose3.q) * sign, q, atol=1e-5)


def test_quat_step_post_matches_reference_retraction(rng):
    """QuatStepPost = q * exp(w) via angle-axis (cpp/pnp/quaternion.h)."""
    q = random_quat(rng)
    w = rng.normal(size=3).astype(np.float32) * 0.3
    got = np.asarray(P.quat_step_post(jnp.asarray(q), jnp.asarray(w)))
    ref = (to_scipy(q) * Rotation.from_rotvec(w)).as_quat()
    ref = np.roll(ref, 1)
    sign = np.sign(np.sum(got * ref))
    np.testing.assert_allclose(got, ref * sign, atol=1e-6)
    # zero step is identity
    got0 = np.asarray(P.quat_step_post(jnp.asarray(q), jnp.zeros(3)))
    np.testing.assert_allclose(got0, q, atol=1e-7)


@pytest.mark.parametrize("fn", ["apply", "derotate", "center"])
def test_analytic_jacobians_match_autodiff(rng, fn):
    """Check the right-multiplicative so(3) Jacobians against jax.jacfwd
    through the retraction q·exp(w)."""
    q = jnp.asarray(random_quat(rng))
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    p = jnp.asarray(rng.normal(size=3).astype(np.float32))
    R = P.quat_to_mat(q)

    if fn == "apply":
        def f(w, dt):
            pose = P.Pose(P.quat_step_post(q, w), t + dt)
            return P.pose_apply(pose, p)
        _, jac_p, jac_R, jac_t = P.apply_with_jac(R, t, p)
        jw = jax.jacfwd(f, argnums=0)(jnp.zeros(3), jnp.zeros(3))
        jt = jax.jacfwd(f, argnums=1)(jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(jac_R), np.asarray(jw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jac_t), np.asarray(jt), atol=1e-5)
        jp = jax.jacfwd(lambda pp: P.pose_apply(P.Pose(q, t), pp))(p)
        np.testing.assert_allclose(np.asarray(jac_p), np.asarray(jp), atol=1e-5)
    elif fn == "derotate":
        def f(w):
            return P.pose_derotate(P.Pose(P.quat_step_post(q, w), t), p)
        _, jac_p, jac_R = P.derotate_with_jac(R, p)
        jw = jax.jacfwd(f)(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(jac_R), np.asarray(jw), atol=1e-5)
        jp = jax.jacfwd(lambda pp: P.pose_derotate(P.Pose(q, t), pp))(p)
        np.testing.assert_allclose(np.asarray(jac_p), np.asarray(jp), atol=1e-5)
    else:
        def f(w, dt):
            return P.pose_center(P.Pose(P.quat_step_post(q, w), t + dt))
        _, jac_R, jac_t = P.center_with_jac(R, t)
        jw = jax.jacfwd(f, argnums=0)(jnp.zeros(3), jnp.zeros(3))
        jt = jax.jacfwd(f, argnums=1)(jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(jac_R), np.asarray(jw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jac_t), np.asarray(jt), atol=1e-5)
