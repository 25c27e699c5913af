"""Whole-solve Levenberg-Marquardt PnP as ONE Pallas TPU kernel.

Why this exists: the tracking chain (engine/tracker.py) runs one PnP
solve per frame inside a ``lax.scan``.  The XLA formulation
(engine/pnp.solve_arrays -> engine/levmarq.lm_solve) is a
``lax.while_loop`` whose body is ~a hundred small fused ops over a few
thousand points — under 1 MFLOP of math per iteration, yet measured
~200-250 us per LM trip on a v5e chip (BENCHMARKS.md round-5): the cost
is op-dispatch and loop-sync overhead, not arithmetic.  This kernel
runs the ENTIRE solve — residuals, Jacobians, IRLS-weighted normal
equations, damped/equilibrated Cholesky, the Nielsen lambda schedule,
and every termination rule — in one kernel invocation with all
operands resident in VMEM, so an LM trip costs vector-unit microseconds
instead of XLA-op overhead.

Semantics are those of ``solve_arrays`` for every (opt_f, opt_pp)
combination (reference chain: cpp/tracker.cc:36-131 ->
cpp/pnp/lev_marq.h:99-389):

- residuals/Jacobians of cpp/pnp/pnp_problem.h:63-99 with the
  behind-camera convention of engine/pnp._residuals (cost sees a huge
  residual; the NE pass sees the raw one, mirroring the XLA split);
- with intrinsics fixed, Jacobian columns 6:9 are identically zero, so
  the damped 9x9 system is block-diagonal and its 6x6 pose block is
  solved exactly (the zero block contributes zero step — bitwise the
  same parameters as the XLA 9x9 path); with ``opt_f``/``opt_pp`` the
  full 9x9 system is solved, with the intrinsic columns gated exactly
  like engine/pnp (``fx = aspect·fy`` folding, the >3-valid-points
  intrinsics gate of cpp/pnp/pnp_problem.h:34-35, and the FOV-derived
  clamps of camera.intrinsics_bounds / cpp/pnp/types.h:156-192);
- Nielsen schedule, Jacobi equilibration and all exits (gradient, step,
  lambda saturation, optional ``function_tol`` stagnation) mirror
  engine/levmarq.lm_solve line for line.

Parity with the XLA path is float-tolerance (different reduction
order), pinned by tests/test_pnp_pallas.py; Mosaic lowering is
validated hardware-free via ``jax.export`` in the same test file.

Batching: the kernel is dispatched over a 1-D grid of independent
solves, with the per-solve 16-float parameter rows riding the scalar
prefetch channel (SMEM block specs cannot carry a batch axis, so the
full (S, 16) table is prefetched and indexed by ``program_id``).
``solve_arrays_pallas`` registers a ``custom_vmap`` rule that maps a
single ``jax.vmap`` level onto that grid axis — this is what lets the
segment-parallel tracking path (parallel/tracking.py) run the kernel
per segment under ``shard_map``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.levmarq import BundleOptions, TRIVIAL, HUBER, CAUCHY

_BEHIND_RESIDUAL = 1e18
# Largest point count routed to the kernel: beyond this the (8, N/8)
# vector temporaries stop fitting comfortably in VMEM.
MAX_POINTS = 32768


def _loss_value(loss_type: int, scale: float, r2):
    if loss_type == TRIVIAL:
        return r2
    if loss_type == HUBER:
        thr2 = scale * scale
        r = jnp.sqrt(jnp.maximum(r2, 0.0))
        return jnp.where(r2 <= thr2, r2, scale * (2.0 * r - scale))
    if loss_type == CAUCHY:
        thr2 = scale * scale
        return thr2 * jnp.log1p(r2 / thr2)
    raise ValueError(f"unknown loss type {loss_type}")


def _loss_weight(loss_type: int, scale: float, r2):
    if loss_type == TRIVIAL:
        return jnp.ones_like(r2)
    if loss_type == HUBER:
        thr2 = scale * scale
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        return jnp.where(r2 <= thr2, 1.0, scale / r)
    if loss_type == CAUCHY:
        inv_thr2 = 1.0 / (scale * scale)
        return jnp.maximum(1.18e-38, 1.0 / (1.0 + r2 * inv_thr2))
    raise ValueError(f"unknown loss type {loss_type}")


def _quat_to_mat_scalars(q0, q1, q2, q3):
    """Rotation-matrix entries from a quaternion (engine/pose.quat_to_mat)."""
    xx, yy, zz = q1 * q1, q2 * q2, q3 * q3
    xy, xz, yz = q1 * q2, q1 * q3, q2 * q3
    wx, wy, wz = q0 * q1, q0 * q2, q0 * q3
    return (
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    )


def _quat_step_post_scalars(q, dw0, dw1, dw2):
    """q * exp(dw): right-multiplicative SO(3) retraction
    (engine/pose.quat_step_post / cpp/pnp/quaternion.h:11-20)."""
    sq = dw0 * dw0 + dw1 * dw1 + dw2 * dw2
    small = sq < 1e-12
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    cos_half = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    e0, e1, e2, e3 = cos_half, k * dw0, k * dw1, k * dw2
    a0, a1, a2, a3 = q
    return (
        a0 * e0 - a1 * e1 - a2 * e2 - a3 * e3,
        a0 * e1 + a1 * e0 + a2 * e3 - a3 * e2,
        a0 * e2 - a1 * e3 + a2 * e0 + a3 * e1,
        a0 * e3 + a1 * e2 - a2 * e1 + a3 * e0,
    )


def _chol_solve(A, b, lam, n: int):
    """Damped, Jacobi-equilibrated n×n Cholesky solve on scalars.

    ``A`` is a dict {(i,j): scalar, i<=j}, ``b`` a list of n scalars.
    Mirrors engine/levmarq.damped_cholesky_solve: diagonal clamped to
    [1e-6, 1e32] and scaled by (1+lambda); symmetric equilibration makes
    the scaled diagonal exactly 1.  Returns (step list, ok scalar)."""
    one = jnp.float32(1.0)
    dd = [jnp.clip(A[(i, i)], 1e-6, 1e32) * (one + lam) for i in range(n)]
    d = [jax.lax.rsqrt(dd[i]) for i in range(n)]
    # Scaled system: diag == 1, off-diag A[i,j]*d[i]*d[j].
    As = {}
    for i in range(n):
        As[(i, i)] = one
        for j in range(i + 1, n):
            As[(i, j)] = A[(i, j)] * d[i] * d[j]
    bs = [b[i] * d[i] for i in range(n)]

    # Cholesky (lower L), fully unrolled at trace time.
    L = {}
    for j in range(n):
        s = As[(j, j)]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        Ljj = jnp.sqrt(s)
        L[(j, j)] = Ljj
        inv = one / Ljj
        for i in range(j + 1, n):
            s = As[(j, i)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s * inv

    # Forward then backward substitution.
    y = [None] * n
    for i in range(n):
        s = bs[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    xsol = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[(k, i)] * xsol[k]
        xsol[i] = s / L[(i, i)]

    step = [-(xsol[i] * d[i]) for i in range(n)]
    ok = jnp.bool_(True)
    for j in range(n):
        ok = ok & jnp.isfinite(L[(j, j)])
        for i in range(j + 1, n):
            ok = ok & jnp.isfinite(L[(i, j)])
    for i in range(n):
        ok = ok & jnp.isfinite(step[i])
    step = [jnp.where(ok, step[i], 0.0) for i in range(n)]
    return step, ok


def _make_kernel(opts: BundleOptions, opt_f: bool, opt_pp: bool):
    import math

    loss_type = int(opts.loss_type)
    loss_scale = float(opts.loss_scale)
    f32 = jnp.float32
    OPT = opt_f or opt_pp
    NP = 9 if OPT else 6

    def kernel(params_ref, pk_ref, out_ref):
        X0, X1, X2 = pk_ref[0], pk_ref[1], pk_ref[2]   # (8, C) f32
        px, py = pk_ref[3], pk_ref[4]
        w_in = pk_ref[5]
        mf = pk_ref[6]                                  # 1.0 / 0.0 mask
        m = mf > 0.0

        # params_ref is the FULL (S, 16) scalar-prefetch table; this
        # program's row is selected by the batch grid index.
        s_id = pl.program_id(0)
        p = [params_ref[s_id, i] for i in range(16)]
        intr0 = (p[7], p[8], p[9], p[10])               # fx fy cx cy
        aspect = p[11]
        sign = p[14]
        mie = p[15]

        if OPT:
            # camera.intrinsics_bounds (cpp/pnp/types.h:156-192): FOV in
            # [15, 160] deg; OpenGL focals are negative so the bounds
            # flip sign.  >3-valid-points gate: cpp/pnp/pnp_problem.h:34.
            min_tan = math.tan(math.radians(15.0) / 2.0)
            max_tan = math.tan(math.radians(160.0) / 2.0)
            half_w = p[12] * 0.5
            f_low_cv = half_w * f32(1.0 / max_tan)
            f_high_cv = half_w * f32(1.0 / min_tan)
            is_gl = sign < 0.0
            f_low = jnp.where(is_gl, -f_high_cv, f_low_cv)
            f_high = jnp.where(is_gl, -f_low_cv, f_high_cv)
            cx_high, cy_high = p[12], p[13]
            gate = jnp.where(jnp.sum(mf) > 3.0, f32(1.0), f32(0.0))

        def cam_rows(q, t):
            """Camera-space coordinates of every point."""
            r = _quat_to_mat_scalars(*q)
            Z0 = r[0] * X0 + r[1] * X1 + r[2] * X2 + t[0]
            Z1 = r[3] * X0 + r[4] * X1 + r[5] * X2 + t[1]
            Z2 = r[6] * X0 + r[7] * X1 + r[8] * X2 + t[2]
            return r, Z0, Z1, Z2

        def total_cost(q, t, intr):
            """engine/pnp._residuals + levmarq._total_cost."""
            fx, fy, cx, cy = intr
            _, Z0, Z1, Z2 = cam_rows(q, t)
            behind = (sign * Z2) < 0.0
            iz = 1.0 / Z2
            r0 = jnp.where(behind, _BEHIND_RESIDUAL, fx * Z0 * iz + cx - px)
            r1 = jnp.where(behind, _BEHIND_RESIDUAL, fy * Z1 * iz + cy - py)
            r0 = jnp.where(m, r0, 0.0)
            r1 = jnp.where(m, r1, 0.0)
            r2 = r0 * r0 + r1 * r1
            ci = w_in * _loss_value(loss_type, loss_scale, r2)
            return jnp.sum(jnp.where(m, ci, 0.0))

        def normal_eq(q, t, intr):
            """engine/pnp._residuals_jac + levmarq._normal_equations.
            Intrinsic columns only materialize when opt_f/opt_pp (with
            opt off the 9x9 system is block-diagonal and the 6x6 pose
            block solves identically — see the module docstring)."""
            fx, fy, cx, cy = intr
            r, Z0, Z1, Z2 = cam_rows(q, t)
            iz = 1.0 / Z2
            gx = fx * iz
            gy = fy * iz
            hx = -fx * Z0 * iz * iz     # dz0/dZ2
            hy = -fy * Z1 * iz * iz     # dz1/dZ2
            # A = dz_dZ @ R, rows of the chain rule (2x3 per point).
            A00 = gx * r[0] + hx * r[6]
            A01 = gx * r[1] + hx * r[7]
            A02 = gx * r[2] + hx * r[8]
            A10 = gy * r[3] + hy * r[6]
            A11 = gy * r[4] + hy * r[7]
            A12 = gy * r[5] + hy * r[8]
            zero = jnp.zeros_like(gx)
            # J_rot = A @ (-skew(X))  (cpp/pose.h:69-87 jac_R with the
            # object-space point), J_t = dz_dZ.
            J0 = [
                A01 * (-X2) + A02 * X1,
                A00 * X2 + A02 * (-X0),
                A00 * (-X1) + A01 * X0,
                gx, zero, hx,
            ]
            J1 = [
                A11 * (-X2) + A12 * X1,
                A10 * X2 + A12 * (-X0),
                A10 * (-X1) + A11 * X0,
                zero, gy, hy,
            ]
            if OPT:
                # d(z)/d(fy, cx, cy) with fx = aspect·fy folded
                # (camera.project_with_jac / cpp/pnp/types.h:69-93),
                # gated by the >3-points rule like engine/pnp
                # (J.at[:, :, 6:].multiply(int_gate)).
                one = jnp.ones_like(gx)
                J0.append((aspect * Z0 * iz) * gate if opt_f else zero)
                J1.append((Z1 * iz) * gate if opt_f else zero)
                J0.append(one * gate if opt_pp else zero)
                J1.append(zero)
                J0.append(zero)
                J1.append(one * gate if opt_pp else zero)
            r0 = jnp.where(m, fx * Z0 * iz + cx - px, 0.0)
            r1 = jnp.where(m, fy * Z1 * iz + cy - py, 0.0)
            r2 = r0 * r0 + r1 * r1
            w = w_in * _loss_weight(loss_type, loss_scale, r2)
            w = jnp.where(m, w, 0.0)
            J0 = [jnp.where(m, c, 0.0) for c in J0]
            J1 = [jnp.where(m, c, 0.0) for c in J1]
            JtJ = {}
            for i in range(NP):
                for j in range(i, NP):
                    JtJ[(i, j)] = jnp.sum(
                        w * (J0[i] * J0[j] + J1[i] * J1[j])
                    )
            Jtr = [
                jnp.sum(w * (J0[i] * r0 + J1[i] * r1)) for i in range(NP)
            ]
            return JtJ, Jtr

        def apply_step(q, t, intr, step):
            """engine/pnp._step: SO(3) retraction + clamped intrinsics,
            the whole intrinsics update annulled when gate == 0."""
            q_new = _quat_step_post_scalars(q, step[0], step[1], step[2])
            t_new = (t[0] + step[3], t[1] + step[4], t[2] + step[5])
            if not OPT:
                return q_new, t_new, intr
            fx, fy, cx, cy = intr
            if opt_f:
                fy_n = jnp.clip(fy + step[6], f_low, f_high)
                fx_n = jnp.clip(fy_n * aspect, f_low, f_high)
            else:
                fx_n, fy_n = fx, fy
            if opt_pp:
                cx_n = jnp.clip(cx + step[7], 0.0, cx_high)
                cy_n = jnp.clip(cy + step[8], 0.0, cy_high)
            else:
                cx_n, cy_n = cx, cy
            on = gate > 0.0
            intr_new = (
                jnp.where(on, fx_n, fx), jnp.where(on, fy_n, fy),
                jnp.where(on, cx_n, cx), jnp.where(on, cy_n, cy),
            )
            return q_new, t_new, intr_new

        def grad_norm_of(Jtr):
            s = jnp.float32(0.0)
            for i in range(NP):
                s = s + Jtr[i] * Jtr[i]
            return jnp.sqrt(s)

        q0 = (p[0], p[1], p[2], p[3])
        t0 = (p[4], p[5], p[6])
        init_cost = total_cost(q0, t0, intr0)
        JtJ0, Jtr0 = normal_eq(q0, t0, intr0)
        gn0 = grad_norm_of(Jtr0)

        def pack_ne(JtJ, Jtr):
            flat = [JtJ[(i, j)] for i in range(NP) for j in range(i, NP)]
            return tuple(flat) + tuple(Jtr)

        def unpack_ne(ne):
            JtJ = {}
            k = 0
            for i in range(NP):
                for j in range(i, NP):
                    JtJ[(i, j)] = ne[k]
                    k += 1
            return JtJ, list(ne[k : k + NP])

        # Carry: q(4) t(3) intr(4) cost lam v grad step iters invalid
        # done ne(NP*(NP+1)/2 + NP)
        init = (
            q0, t0, intr0, init_cost,
            f32(opts.initial_lambda), f32(2.0),
            gn0, f32(-1.0),
            jnp.int32(0), jnp.int32(0),
            gn0 < opts.gradient_tol,
            pack_ne(JtJ0, Jtr0),
        )

        def cond(s):
            return (~s[10]) & (s[8] < opts.max_iterations)

        def body(s):
            (q, t, intr, cost, lam, v, _gn, _sn, iters, invalid, _done,
             ne) = s
            JtJ, Jtr = unpack_ne(ne)
            step, ok = _chol_solve(JtJ, Jtr, lam, NP)
            sn2 = jnp.float32(0.0)
            for i in range(NP):
                sn2 = sn2 + step[i] * step[i]
            step_norm = jnp.sqrt(sn2)

            q_new, t_new, intr_new = apply_step(q, t, intr, step)
            cost_new = total_cost(q_new, t_new, intr_new)

            improved = ok & (cost_new < cost)
            tiny = ok & (step_norm < opts.step_tol)

            actual = cost_new - cost
            expected = jnp.float32(0.0)
            for i in range(NP):
                Ai = jnp.float32(0.0)
                for j in range(NP):
                    Ai = Ai + JtJ[(min(i, j), max(i, j))] * step[j]
                expected = expected + step[i] * (2.0 * Jtr[i] + Ai)
            rho = actual / expected
            factor = jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
            )
            lam_accept = jnp.where(
                rho > 0,
                jnp.clip(lam * factor, opts.min_lambda, opts.max_lambda),
                lam,
            )
            lam_saturated = lam >= opts.max_lambda
            lam_reject = jnp.minimum(f32(opts.max_lambda), lam * v)

            accept = improved & ~tiny
            q_out = tuple(
                jnp.where(accept, n, o) for n, o in zip(q_new, q)
            )
            t_out = tuple(
                jnp.where(accept, n, o) for n, o in zip(t_new, t)
            )
            intr_out = tuple(
                jnp.where(accept, n, o) for n, o in zip(intr_new, intr)
            )
            cost_out = jnp.where(accept, cost_new, cost)
            lam_out = jnp.where(accept, lam_accept, lam_reject)
            v_out = jnp.where(accept, 2.0, 2.0 * v)
            invalid_out = invalid + jnp.where(
                improved | tiny, 0, 1
            ).astype(jnp.int32)

            # Rebuild the normal equations from the (possibly unchanged)
            # output parameters: on rejection the inputs are identical so
            # the recomputed values equal the carried ones — same
            # semantics as the XLA path's lax.cond skip, minus a branch.
            JtJ_out, Jtr_out = normal_eq(q_out, t_out, intr_out)
            gn = grad_norm_of(Jtr_out)

            done = (
                tiny
                | (accept & (gn < opts.gradient_tol))
                | (~improved & ~tiny & lam_saturated)
            )
            if opts.function_tol > 0.0:
                stagnated = jnp.abs(actual) <= opts.function_tol * cost
                done = done | (
                    (accept | (~improved & ~tiny)) & stagnated
                )

            return (
                q_out, t_out, intr_out, cost_out, lam_out, v_out, gn,
                step_norm, iters + 1, invalid_out, done,
                pack_ne(JtJ_out, Jtr_out),
            )

        fin = jax.lax.while_loop(cond, body, init)
        (qf, tf, intr_f, cost_f, lam_f, _v, gn_f, sn_f, iters_f,
         invalid_f, _d, _ne) = fin
        fx, fy, cx, cy = intr_f

        # Inlier ratio (cpp/pnp/solvers.cc:30-47), same masking as
        # engine/pnp.solve_arrays.
        _, Z0, Z1, Z2 = cam_rows(qf, tf)
        behind = (sign * Z2) < 0.0
        iz = 1.0 / Z2
        r0 = jnp.where(behind, _BEHIND_RESIDUAL, fx * Z0 * iz + cx - px)
        r1 = jnp.where(behind, _BEHIND_RESIDUAL, fy * Z1 * iz + cy - py)
        r0 = jnp.where(m, r0, 0.0)
        r1 = jnp.where(m, r1, 0.0)
        err2 = r0 * r0 + r1 * r1
        err2 = jnp.where(m & ~behind, err2, jnp.inf)
        num_points = jnp.maximum(jnp.sum(mf), 1.0)
        inliers = jnp.sum(
            jnp.where((err2 < mie * mie) & m, 1.0, 0.0)
        )
        ratio = jnp.where(mie > 0.0, inliers / num_points, 0.0)

        out = [
            qf[0], qf[1], qf[2], qf[3], tf[0], tf[1], tf[2],
            fx, fy, cx, cy,
            iters_f.astype(f32), init_cost, cost_f, lam_f,
            invalid_f.astype(f32), sn_f, gn_f, ratio,
        ]
        # Mosaic forbids scalar stores to VMEM: build the result row with
        # iota-selects and store it in one vector write.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = jnp.zeros((1, 128), f32)
        for i, val in enumerate(out):
            acc = jnp.where(lane == i, val, acc)
        out_ref[...] = acc

    return kernel


def _call_batched(params, pk, *, opt_f, opt_pp, opts, interpret):
    """Grid-batched kernel dispatch: one grid program per solve.

    ``params`` is (S, 16), ``pk`` is (S, 7, 8, C); returns (S, 19).
    The parameter table rides the scalar-prefetch channel because SMEM
    block specs cannot be sliced along a batch axis (Mosaic's
    last-two-dims rule); each program indexes its row by program_id.
    """
    S, _, _, C = pk.shape
    out = pl.pallas_call(
        _make_kernel(opts, bool(opt_f), bool(opt_pp)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((None, 7, 8, C), lambda s, pref: (s, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (None, 1, 128), lambda s, pref: (s, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, 1, 128), jnp.float32),
        interpret=interpret,
    )(params.astype(jnp.float32), pk)
    return out[:, 0, :19]


_SOLVER_CACHE: dict = {}


def _solver(opt_f: bool, opt_pp: bool, opts, interpret: bool):
    """custom_vmap-wrapped single solve for one static configuration.

    ``jax.vmap`` of the public entry maps onto the kernel's batch grid
    (ONE vmap level — a second level would re-enter pallas_call's
    default batching, which the SMEM operand cannot lower under)."""
    key = (opt_f, opt_pp, opts, interpret)
    fn = _SOLVER_CACHE.get(key)
    if fn is not None:
        return fn

    batched = partial(
        _call_batched, opt_f=opt_f, opt_pp=opt_pp, opts=opts,
        interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def call(params, pk):
        return batched(params[None], pk[None])[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, params, pk):
        pb, kb = in_batched
        if not pb:
            params = jnp.broadcast_to(params, (axis_size,) + params.shape)
        if not kb:
            pk = jnp.broadcast_to(pk, (axis_size,) + pk.shape)
        return batched(params, pk), True

    _SOLVER_CACHE[key] = call
    return call


@partial(
    jax.jit, static_argnames=("opt_f", "opt_pp", "opts", "interpret")
)
def solve_arrays_pallas(
    X, x, weights, mask, params,
    *, opt_f: bool = False, opt_pp: bool = False,
    opts: BundleOptions, interpret: bool = False,
):
    """Drop-in for ``solve_arrays`` running the whole LM solve in one
    Pallas kernel.  Returns the same 19-float result vector
    (float-tolerance parity; iteration counts and accept/reject
    decisions match except at exact decision boundaries).  Supports one
    level of ``jax.vmap`` (batched over independent solves) via the
    kernel's batch grid.
    """
    N = X.shape[0]
    C = max(128, int(np.ceil(N / 8 / 128)) * 128)
    Np = 8 * C

    def chan(v):
        return jnp.pad(
            v.astype(jnp.float32), (0, Np - N)
        ).reshape(8, C)

    pk = jnp.stack(
        [
            chan(X[:, 0]), chan(X[:, 1]), chan(X[:, 2]),
            chan(x[:, 0]), chan(x[:, 1]),
            chan(weights),
            chan(mask.astype(jnp.float32)),
        ]
    )
    call = _solver(bool(opt_f), bool(opt_pp), opts, bool(interpret))
    return call(params.astype(jnp.float32), pk)
