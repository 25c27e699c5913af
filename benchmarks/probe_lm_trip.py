"""Microbench the LM trip's pieces on device (round 4, tracking push).

The tracking scan chain costs ~0.3 ms per LM while_loop trip on a
v5e chip (probe_track_floor.py).  Candidates for that budget, timed
here as device-resident fori_loops of 512 dependent iterations (so
dispatch cost amortizes away and nothing is DCE'd):

- solve9: damped_cholesky_solve (engine/levmarq.py — jnp.linalg.cholesky
  + two solve_triangular, each a sequential dynamic-slice loop on TPU);
- elim9:  unrolled static Gaussian elimination of the same damped,
  equilibrated system (SPD ⇒ no pivoting; 9 static rank-1 updates);
- cost:   _total_cost sweep over the config-3 shape (4096×2 residuals);
- ne:     _normal_equations over the same shape.

Run with the tunnel live: python benchmarks/probe_lm_trip.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 512


def timed(fn, *args):
    fn(*args)  # compile + warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        reps.append(time.perf_counter() - t0)
    best = min(reps)
    return 1e6 * best / ITERS  # µs per inner iteration


def main():
    from polychase_tpu.engine.levmarq import damped_cholesky_solve

    rng = np.random.default_rng(0)
    Jh = rng.normal(size=(4096, 9)).astype(np.float32)
    JtJ = jnp.asarray(Jh.T @ Jh + 9 * np.eye(9, dtype=np.float32))
    Jtr = jnp.asarray(rng.normal(size=9).astype(np.float32))

    @jax.jit
    def loop_solve9(JtJ, Jtr):
        def body(i, acc):
            step, ok = damped_cholesky_solve(JtJ, Jtr + acc[:9], 1e-3)
            return jnp.concatenate([step * 1e-6, acc[9:]])

        return jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((10,), jnp.float32)
        )

    def elim_solve(A, b):
        """Unrolled no-pivot elimination on the damped+equilibrated
        system; bit-for-bit this is LDLᵀ without the sqrt."""
        diag = jnp.clip(jnp.diagonal(A), 1e-6, 1e32)
        damped = diag * (1.0 + 1e-3)
        n = A.shape[0]
        A = A.at[jnp.arange(n), jnp.arange(n)].set(damped)
        d = 1.0 / jnp.sqrt(damped)
        M = A * d[:, None] * d[None, :]
        rhs = b * d
        aug = jnp.concatenate([M, rhs[:, None]], axis=1)  # (n, n+1)
        for k in range(n):
            piv = aug[k] / aug[k, k]
            below = aug[k + 1 :, k : k + 1]
            aug = aug.at[k + 1 :].add(-below * piv[None, :])
            aug = aug.at[k].set(piv)
        x = jnp.zeros((n,), A.dtype)
        for k in range(n - 1, -1, -1):
            tail = (
                jnp.dot(aug[k, k + 1 : n], x[k + 1 :]) if k < n - 1 else 0.0
            )
            x = x.at[k].set(aug[k, n] - tail)
        return -(x * d)

    @jax.jit
    def loop_elim9(JtJ, Jtr):
        def body(i, acc):
            step = elim_solve(JtJ, Jtr + acc[:9])
            return jnp.concatenate([step * 1e-6, acc[9:]])

        return jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((10,), jnp.float32)
        )

    # Reference-shape residual sweeps (config 3: 8 groups × 256 kps × 2)
    X = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32) + 5)
    x = jnp.asarray(rng.normal(size=(4096, 2)).astype(np.float32))
    w = jnp.ones((4096,), jnp.float32)

    def residuals(p):
        # stand-in with the real arithmetic intensity: project + diff
        z = X[:, 2] + p[0]
        res = X[:, :2] / z[:, None] * (1.0 + p[1]) - x
        return res, z > 0, w

    def residuals_jac(p):
        res, valid, _ = residuals(p)
        J = jnp.stack(
            [jnp.broadcast_to(x, res.shape)] * 9, axis=-1
        ) * (1.0 + p[0])
        return res, J, valid, w

    @jax.jit
    def loop_cost(p0):
        def body(i, p):
            res, valid, wt = residuals(p)
            c = jnp.sum(
                jnp.where(valid, wt * jnp.sum(res * res, -1), jnp.inf)
            )
            return p + c * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, p0)

    @jax.jit
    def loop_ne(p0):
        hi = jax.lax.Precision.HIGHEST

        def body(i, p):
            res, J, valid, wt = residuals_jac(p)
            wv = jnp.where(valid, wt, 0.0)
            JtJ = jnp.einsum("nlp,nlq,n->pq", J, J, wv, precision=hi)
            Jtr = jnp.einsum("nlp,nl,n->p", J, res, wv, precision=hi)
            return p + (JtJ[0, 0] + Jtr[0]) * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, p0)

    p0 = jnp.asarray(np.zeros(9, np.float32))
    print(f"solve9 (cholesky+tri): {timed(loop_solve9, JtJ, Jtr):8.1f} µs/iter")
    print(f"elim9 (unrolled GE):   {timed(loop_elim9, JtJ, Jtr):8.1f} µs/iter")
    print(f"cost sweep 4096x2:     {timed(loop_cost, p0):8.1f} µs/iter")
    print(f"NE build 4096x2x9:     {timed(loop_ne, p0):8.1f} µs/iter")

    # agreement check
    s_ref, _ = damped_cholesky_solve(JtJ, Jtr, 1e-3)
    s_new = elim_solve(JtJ, Jtr)
    err = float(jnp.max(jnp.abs(s_ref - s_new)))
    print(f"elim-vs-cholesky max |Δstep| = {err:.3e}")


if __name__ == "__main__":
    main()
