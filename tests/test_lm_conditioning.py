"""Float32 conditioning: the reference documents a real-world 9x9 BA
system whose plain float32 LLT produces a ~3e-3 residual and a POSITIVE
expected cost change (cpp/examples/levmarq_ill_conditioned_float32_issue.cpp),
i.e. LM rejects a good step.  Our damped solve Jacobi-equilibrates the
damped system so float32 stays stable on the same class of problems."""

import numpy as np
import jax.numpy as jnp

from polychase_tpu.engine.levmarq import damped_cholesky_solve


def _make_illconditioned(rng, scales):
    """JtJ/Jtr from a random Jacobian with wildly mixed column scales,
    mimicking rotation (~5e5) vs intrinsics (~1e2) blocks of the
    reference's captured failure case."""
    n = 400
    J = rng.normal(size=(n, 9)) * np.asarray(scales)[None, :]
    # near-duplicate columns (rotation/translation coupling), the other
    # half of the reference failure: scale disparity * near-rank-deficiency
    J[:, 3] = 0.3 * J[:, 3] + 0.9995 * J[:, 0] * (scales[3] / scales[0])
    J[:, 7] = 0.2 * J[:, 7] + 0.9995 * J[:, 1] * (scales[7] / scales[1])
    r = rng.normal(size=n)
    JtJ = (J.T @ J).astype(np.float64)
    Jtr = (J.T @ r).astype(np.float64)
    return JtJ, Jtr


def test_equilibrated_f32_solve_matches_f64():
    rng = np.random.default_rng(0)
    scales = [7.5e4, 8e4, 6e4, 2.6e2, 2.6e2, 2.3e2, 1.0, 1.2, 1.2]
    JtJ, Jtr = _make_illconditioned(rng, scales)
    lam = 1.5607382e-06  # the reference repro's lambda

    cond = np.linalg.cond(JtJ)
    assert cond > 1e7  # genuinely ill-conditioned for f32

    # float64 ground truth of the damped system
    diag = np.clip(np.diag(JtJ), 1e-6, 1e32)
    A64 = JtJ.copy()
    A64[np.arange(9), np.arange(9)] = diag * (1.0 + lam)
    step64 = -np.linalg.solve(A64, Jtr)

    step32, ok = damped_cholesky_solve(
        jnp.asarray(JtJ, jnp.float32), jnp.asarray(Jtr, jnp.float32),
        jnp.float32(lam),
    )
    assert bool(ok)
    step32 = np.asarray(step32, np.float64)

    rel = np.linalg.norm(step32 - step64) / np.linalg.norm(step64)
    assert rel < 1e-3, rel

    # The reference failure mode: expected cost change came out positive.
    expected = step32 @ (2.0 * Jtr + JtJ @ step32)
    assert expected < 0.0, expected

    # And the un-equilibrated float32 factorization really is the problem
    # this guards against: its residual is orders of magnitude worse.
    A32 = A64.astype(np.float32)
    try:
        L = np.linalg.cholesky(A32)
        y = np.linalg.solve(L, -Jtr.astype(np.float32))
        naive = np.linalg.solve(L.T, y).astype(np.float64)
        naive_rel = np.linalg.norm(naive - step64) / np.linalg.norm(step64)
        ours_res = np.linalg.norm(A64 @ step32 + Jtr)
        naive_res = np.linalg.norm(A64 @ naive + Jtr)
        assert ours_res <= naive_res * 1.5
    except np.linalg.LinAlgError:
        pass  # f32 factorization failing outright also proves the point
