"""Camera model tests: projection math + Jacobians vs autodiff, conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polychase_tpu.engine import camera as C


def make_intr(convention=C.OPENGL):
    s = -1.0 if convention == C.OPENGL else 1.0
    return C.Intrinsics.create(
        fx=s * 1000.0, fy=s * 1000.0, cx=960.0, cy=540.0,
        aspect_ratio=1.0, width=1920.0, height=1080.0, convention=convention,
    )


def test_project_basic():
    intr = make_intr(C.OPENCV)
    p = C.project(intr, jnp.array([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(p), [960.0, 540.0], atol=1e-5)
    p = C.project(intr, jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), [1960.0, 1540.0], atol=1e-3)


@pytest.mark.parametrize("conv", [C.OPENGL, C.OPENCV])
def test_unproject_project_roundtrip(conv, rng):
    intr = make_intr(conv)
    pix = jnp.asarray(
        rng.uniform([0, 0], [1920, 1080], size=(16, 2)).astype(np.float32)
    )
    d = C.unproject(intr, pix)
    # direction z must have the convention sign
    sgn = 1.0 if conv == C.OPENCV else -1.0
    assert np.all(np.sign(np.asarray(d[..., 2])) == sgn)
    assert not np.any(np.asarray(C.is_behind(intr, d)))
    back = C.project(intr, d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-2)


@pytest.mark.parametrize("conv", [C.OPENGL, C.OPENCV])
def test_project_jacobians_vs_autodiff(conv, rng):
    intr = make_intr(conv)
    sgn = 1.0 if conv == C.OPENCV else -1.0
    x = jnp.asarray(
        np.array([0.3, -0.2, sgn * 2.5], np.float32)
    )
    _, jac_x, jac_intrin = C.project_with_jac(intr, x)

    jx = jax.jacfwd(lambda xx: C.project(intr, xx))(x)
    np.testing.assert_allclose(np.asarray(jac_x), np.asarray(jx), atol=1e-4)

    # intrinsics jacobian over (fy, cx, cy), with fx = aspect·fy
    def f(v):
        fy, cx, cy = v
        it = intr._replace(fy=fy, fx=intr.aspect_ratio * fy, cx=cx, cy=cy)
        return C.project(it, x)

    ji = jax.jacfwd(f)(jnp.stack([intr.fy, intr.cx, intr.cy]))
    np.testing.assert_allclose(
        np.asarray(jac_intrin), np.asarray(ji), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("conv", [C.OPENGL, C.OPENCV])
def test_unproject_jacobians_vs_autodiff(conv):
    intr = make_intr(conv)
    pix = jnp.array([123.0, 456.0])
    _, jac_p, jac_intrin = C.unproject_with_jac(intr, pix)

    jp = jax.jacfwd(lambda pp: C.unproject(intr, pp))(pix)
    np.testing.assert_allclose(
        np.asarray(jac_p)[:, :2], np.asarray(jp), atol=1e-6
    )

    def f(v):
        fy, cx, cy = v
        it = intr._replace(fy=fy, fx=intr.aspect_ratio * fy, cx=cx, cy=cy)
        return C.unproject(it, pix)

    ji = jax.jacfwd(f)(jnp.stack([intr.fy, intr.cx, intr.cy]))
    np.testing.assert_allclose(
        np.asarray(jac_intrin), np.asarray(ji), rtol=1e-4, atol=1e-6
    )


def test_bounds_opengl_negative_focals():
    intr = make_intr(C.OPENGL)
    b = C.intrinsics_bounds(intr)
    assert float(b.f_low) < float(b.f_high)
    assert float(b.f_high) < 0  # OpenGL focals are negative
    intr_cv = make_intr(C.OPENCV)
    b2 = C.intrinsics_bounds(intr_cv)
    assert 0 < float(b2.f_low) < float(b2.f_high)
    # magnitudes agree
    np.testing.assert_allclose(float(b.f_low), -float(b2.f_high), rtol=1e-6)


def test_is_behind():
    gl, cv = make_intr(C.OPENGL), make_intr(C.OPENCV)
    front_gl = jnp.array([0.0, 0.0, -1.0])
    assert not bool(C.is_behind(gl, front_gl))
    assert bool(C.is_behind(gl, -front_gl))
    assert not bool(C.is_behind(cv, -front_gl))
    assert bool(C.is_behind(cv, front_gl))
