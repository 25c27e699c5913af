"""Pure device time of the tracking scan-chunk program (round 4).

e2e tracking (probe_track_floor.py) mixes device compute with the
tunnel's RPC/link floor.  Here the REAL compiled chunk program runs
B back-to-back dispatches on device-resident inputs with the carry fed
forward (a genuine dependency chain) and ONE final fetch, so

    device ms/chunk = (wall - rpc_floor) / B

isolates what attached hardware would pay.  Variants:
- full solve (default opts, tracker ftol);
- max_iterations=1 (the fixed per-frame cost: raycast + initial NE +
  one trip);
- 4-tri mesh (no raycast work).

Run with the tunnel live: python benchmarks/probe_scan_device.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from probe_track_floor import _build

B = int(os.environ.get("POLYCHASE_PROBE_CHAIN", "16"))


def main():
    import jax
    import jax.numpy as jnp

    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine import tracker as T
    from polychase_tpu.engine.levmarq import BundleOptions
    from polychase_tpu.engine.pnp import normalize_bundle_opts
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database

    mesh, tiny, intr, poses, db_path = _build()
    N = len(poses)
    print(f"# scene: {int(mesh.num_triangles)} tris, chunk={T.SCAN_CHUNK}, "
          f"B={B}", flush=True)

    # Reuse the real packer by capturing its dispatch inputs via a probe
    # wrapper around the compiled program.
    captured = {}
    real_fn = T._scan_track_fn

    def capture_fn(*a, **kw):
        run = real_fn(*a, **kw)

        def wrapper(mesh_, model, model_inv, q0, t0, in0, const5, kps, xs):
            captured.setdefault("args", (
                mesh_, model, model_inv, q0, t0, in0, const5, kps, xs
            ))
            captured["run"] = run
            return run(mesh_, model, model_inv, q0, t0, in0, const5,
                       kps, xs)

        return wrapper

    def chain_time(use_mesh, opts):
        captured.clear()
        T._scan_track_fn = capture_fn
        try:
            traj = CameraTrajectory(0, N)
            traj.set(0, C.CameraState(intr, poses[0]))
            db = Database(db_path)
            T.track_camera_trajectory(
                db, traj, 0, N - 1, np.eye(4, dtype=np.float32), use_mesh,
                bundle_opts=opts,
            )
            db.close()
        finally:
            T._scan_track_fn = real_fn
        run = captured["run"]
        (mesh_, model, model_inv, q0, t0, in0, const5, kps, xs) = (
            captured["args"]
        )
        args = jax.device_put(
            (mesh_, model, model_inv, q0, t0, in0, const5, kps, xs)
        )
        (mesh_, model, model_inv, q0, t0, in0, const5, kps, xs) = args

        def chain():
            c = (q0, t0, in0)
            out = None
            for _ in range(B):
                c, vecs, counts = run(
                    mesh_, model, model_inv, *c, const5, kps, xs
                )
            return jax.device_get(vecs)

        chain()  # warm
        reps = []
        for _ in range(4):
            t0w = time.perf_counter()
            chain()
            reps.append(time.perf_counter() - t0w)
        best = min(reps)
        per_chunk = 1000 * (best - 0.028) / B
        per_frame = per_chunk / T.SCAN_CHUNK
        return best, per_chunk, per_frame

    ftol = BundleOptions(function_tol=1e-5)
    one = BundleOptions(function_tol=1e-5, max_iterations=1)

    for label, m, o in (
        ("full solve, real mesh", mesh, ftol),
        ("max_iterations=1     ", mesh, one),
        ("full solve, 4-tri    ", tiny, ftol),
    ):
        best, per_chunk, per_frame = chain_time(m, o)
        print(
            f"{label}: wall {best:.3f}s -> {per_chunk:6.2f} ms/chunk = "
            f"{per_frame * 1000:7.1f} µs/frame device",
            flush=True,
        )


if __name__ == "__main__":
    main()
