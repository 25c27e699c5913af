"""Interleaved A/B of the scan-chain upload format (round 4).

Arms, alternated within one process/session (the ±20% cross-session
rule makes anything else incomparable):

- legacy:  f32 keypoint pixels re-uploaded per target frame + bool mask
- packed:  clip-wide keypoint table uploaded once + u16 indices + counts
  (bit-identical solves — tests/test_tracker.py::test_packed_idx_upload_bit_exact)
- packed @ chunk 64 / 120: post-ftol the per-step device time dropped
  ~3×, so the dispatch-amortization sweet spot may have moved.

Run on an idle host with the tunnel live:
    python benchmarks/probe_track_upload.py
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

N = int(os.environ.get("POLYCHASE_PROBE_FRAMES", "120"))
REPS = int(os.environ.get("POLYCHASE_PROBE_REPS", "4"))


def _one_run(db_path, mesh, intr, poses):
    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine.tracker import track_camera_trajectory
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database

    traj = CameraTrajectory(0, N)
    traj.set(0, C.CameraState(intr, poses[0]))
    db = Database(db_path)
    t0 = time.perf_counter()
    track_camera_trajectory(
        db, traj, 0, N - 1, np.eye(4, dtype=np.float32), mesh
    )
    dt = time.perf_counter() - t0
    db.close()
    return dt


def main():
    mesh, _tiny, intr, poses, db_path = _build()
    print(f"# scene: {int(mesh.num_triangles)} tris, {N} frames",
          flush=True)

    from polychase_tpu.engine import tracker as T

    arms = [
        ("legacy  chunk=32", False, 32),
        ("packed  chunk=32", True, 32),
        ("packed  chunk=64", True, 64),
        ("packed  chunk=120", True, 120),
    ]

    # Warm every arm's compile before timing.
    for label, packed, chunk in arms:
        T.PACKED_IDX, T.SCAN_CHUNK = packed, chunk
        _one_run(db_path, mesh, intr, poses)
        print(f"compiled: {label}", flush=True)

    times = {label: [] for label, _, _ in arms}
    for rep in range(REPS):
        for label, packed, chunk in arms:
            T.PACKED_IDX, T.SCAN_CHUNK = packed, chunk
            times[label].append(_one_run(db_path, mesh, intr, poses))

    print()
    for label, _, _ in arms:
        ts = times[label]
        best = min(ts)
        print(
            f"{label}: {[round(t, 3) for t in ts]} min {best:.3f}s = "
            f"{(N - 1) / best:.1f} fps ({1000 * best / (N - 1):.2f} "
            "ms/frame)",
            flush=True,
        )


if __name__ == "__main__":
    main()
