"""Interleaved A/B of the whole-solve Pallas LM PnP kernel
(kernels/pnp_pallas.py) inside the config-3 tracking chain.

Arms (flipped on the live tracker module per rep, same process — the
scan-chain jit caches key on the flag so both arms stay compiled):

- pallas=1: per-frame PnP runs as ONE Pallas kernel (VMEM-resident LM);
- pallas=0: the XLA lax.while_loop solver (engine/levmarq.lm_solve).

Prints per-arm fps (min of reps) and the max pose delta between the two
arms' final trajectories (parity check on hardware, not interpret mode).

Run on an idle host with the tunnel live:
    python benchmarks/probe_pnp_pallas.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import run_all as RA

N = int(os.environ.get("POLYCHASE_PROBE_FRAMES", "120"))
REPS = int(os.environ.get("POLYCHASE_PROBE_REPS", "3"))
# --varintr: config-5 shape (4K masked mesh, optimize f+pp, Cauchy)
VARINTR = "--varintr" in sys.argv[1:]


def _build():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    if VARINTR:
        from polychase_tpu.engine.geometry import mask_array_size

        mesh, intr, poses = RA.make_scene(
            N, width=3840, height=2160, focal=3600.0
        )
        bits = np.zeros(mask_array_size(mesh.num_triangles), np.uint32)
        for t in range(0, mesh.num_triangles // 10):
            bits[t // 32] |= np.uint32(1 << (t % 32))
        mesh = mesh._replace(masked_triangles=jnp.asarray(bits))
    else:
        mesh, intr, poses = RA.make_scene(N)
    td = tempfile.mkdtemp()
    db_path = os.path.join(td, "flow.db")
    RA.build_synth_db(db_path, mesh, intr, poses, rng)
    return mesh, intr, poses, db_path


def _run_once(db_path, mesh, intr, poses, pallas: bool, lam0=None):
    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine import tracker as T
    from polychase_tpu.engine.levmarq import BundleOptions
    from polychase_tpu.engine.tracker import track_camera_trajectory
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database

    if VARINTR:
        from polychase_tpu.engine.levmarq import CAUCHY

        opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0)
    else:
        opts = BundleOptions()
    if lam0 is not None:
        opts = opts._replace(initial_lambda=lam0)
    old = T.PALLAS_PNP
    T.PALLAS_PNP = pallas
    try:
        traj = CameraTrajectory(0, N)
        traj.set(0, C.CameraState(intr, poses[0]))
        db = Database(db_path)
        t0 = time.perf_counter()
        track_camera_trajectory(
            db, traj, 0, N - 1, np.eye(4, dtype=np.float32), mesh,
            optimize_focal_length=VARINTR, optimize_principal_point=VARINTR,
            bundle_opts=opts,
        )
        dt = time.perf_counter() - t0
        db.close()
        qt = np.stack(
            [
                np.concatenate(
                    [
                        np.asarray(traj.get(i).pose.q),
                        np.asarray(traj.get(i).pose.t),
                    ]
                )
                for i in range(N)
                if traj.get(i) is not None
            ]
        )
        return dt, qt
    finally:
        T.PALLAS_PNP = old


def _gt_err(qt, poses):
    """Per-arm error against the synthetic scene's ground truth."""
    q_gt = np.stack([np.asarray(p.q) for p in poses])[: qt.shape[0]]
    t_gt = np.stack([np.asarray(p.t) for p in poses])[: qt.shape[0]]
    q = qt[:, :4] / np.linalg.norm(qt[:, :4], axis=1, keepdims=True)
    # quaternion distance up to sign
    dq = np.minimum(
        np.linalg.norm(q - q_gt, axis=1), np.linalg.norm(q + q_gt, axis=1)
    )
    dt = np.linalg.norm(qt[:, 4:] - t_gt, axis=1)
    return dq, dt


def main():
    mesh, intr, poses, db_path = _build()
    print(f"# scene: {int(mesh.num_triangles)} tris, {N} frames", flush=True)

    # Compile both arms first.
    _, qt_on = _run_once(db_path, mesh, intr, poses, True)
    _, qt_off = _run_once(db_path, mesh, intr, poses, False)

    dq = np.abs(qt_on - qt_off)
    print(
        f"parity: max |dq| {dq[:, :4].max():.2e}  "
        f"max |dt| {dq[:, 4:].max():.2e}  frames {qt_on.shape[0]}",
        flush=True,
    )
    # Chaos control: the XLA arm again with an infinitesimally perturbed
    # initial lambda.  If XLA-vs-XLA' spreads like pallas-vs-xla, the
    # chain is chaotic and the cross-arm delta is not a quality signal.
    _, qt_off2 = _run_once(
        db_path, mesh, intr, poses, False, lam0=1.02e-5
    )
    d2 = np.abs(qt_off - qt_off2)
    print(
        f"xla-vs-xla' (lam0 1e-5 vs 1.02e-5): max |dq| "
        f"{d2[:, :4].max():.2e}  max |dt| {d2[:, 4:].max():.2e}",
        flush=True,
    )
    for name, qt in (
        ("pallas", qt_on), ("xla   ", qt_off), ("xla'  ", qt_off2)
    ):
        eq, et = _gt_err(qt, poses)
        print(
            f"gt err {name}: |dq| mean {eq.mean():.2e} max {eq.max():.2e}"
            f"  |dt| mean {et.mean():.2e} max {et.max():.2e}",
            flush=True,
        )

    times = {True: [], False: []}
    for rep in range(REPS):
        for arm in (True, False):
            dt, _ = _run_once(db_path, mesh, intr, poses, arm)
            times[arm].append(dt)
            print(
                f"rep {rep} pallas={int(arm)}: {dt:.3f}s "
                f"= {(N - 1) / dt:.1f} fps",
                flush=True,
            )

    for arm in (True, False):
        best = min(times[arm])
        print(
            f"pallas={int(arm)}: min {best:.3f}s = {(N - 1) / best:.1f} fps "
            f"({1000 * best / (N - 1):.2f} ms/frame)",
            flush=True,
        )


if __name__ == "__main__":
    main()
