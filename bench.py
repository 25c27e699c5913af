"""Headline benchmark: Analyze-Video throughput (BASELINE.md config 1).

Drives the REAL analyze pipeline end-to-end on a synthetic 640x480 clip:
GFTT detection + pyramidal LK into the +-{1,2,4,8} skip targets + SQLite
flow-database writes, for:

- this framework via ``generate_optical_flow_database`` on the default
  JAX device (the TPU chip when run by the driver), with its pipelined
  dispatch (GFTT lookahead, deferred LK transfers, Pallas LK kernels);
- the reference's actual hot path: OpenCV ``goodFeaturesToTrack`` +
  ``calcOpticalFlowPyrLK`` on CPU with the reference's 4-thread cap
  (cpp/opticalflow.cc:269-271), writing the same database schema.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import tempfile
import time

import numpy as np

W, H = 640, 480
N_FRAMES = 12


def make_clip():
    import cv2

    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (H + 80, W + 120)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 1.5)
    big = (255 * (big - big.min()) / np.ptp(big)).astype(np.uint8)
    frames = []
    for t in range(N_FRAMES):
        crop = big[3 * t : 3 * t + H, 5 * t : 5 * t + W]
        frames.append(np.ascontiguousarray(crop))
    return frames


def bench_ours(frames):
    from polychase_tpu.engine.opticalflow import (
        VideoInfo,
        generate_optical_flow_database,
    )

    info = VideoInfo(W, H, 0, len(frames))

    def run():
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "flow.db")
            t0 = time.perf_counter()
            generate_optical_flow_database(
                info, lambda fid: frames[fid], None, path
            )
            return time.perf_counter() - t0

    run()  # warmup: compiles every shape
    dt = min(run() for _ in range(3))  # the shared chip is noisy
    return len(frames) / dt


def bench_opencv(frames):
    import cv2

    from polychase_tpu.io.database import Database

    cv2.setNumThreads(4)  # the reference's analysis-thread cap
    win = (10, 10)
    crit = (cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01)

    def run():
        with tempfile.TemporaryDirectory() as td:
            db = Database(os.path.join(td, "flow.db"))
            t0 = time.perf_counter()
            feats = {}
            for i in range(len(frames)):
                pts = cv2.goodFeaturesToTrack(
                    frames[i], maxCorners=0, qualityLevel=0.01,
                    minDistance=5.0, blockSize=3,
                )
                feats[i] = pts.reshape(-1, 1, 2).astype(np.float32)
                db.write_keypoints(i, feats[i].reshape(-1, 2))
                for skip in (-8, -4, -2, -1, 1, 2, 4, 8):
                    j = i + skip
                    if not 0 <= j < len(frames):
                        continue
                    if db.image_pair_flow_exists(i, j):
                        continue
                    nxt, st, err = cv2.calcOpticalFlowPyrLK(
                        frames[i], frames[j], feats[i], None,
                        winSize=win, maxLevel=3, criteria=crit,
                        flags=0, minEigThreshold=1e-4,
                    )
                    keep = st.reshape(-1) == 1
                    db.write_image_pair_flow(
                        i, j,
                        np.nonzero(keep)[0].astype(np.uint32),
                        nxt.reshape(-1, 2)[keep],
                        err.reshape(-1)[keep],
                    )
            dt = time.perf_counter() - t0
            db.close()
            return dt

    run()
    dt = min(run() for _ in range(3))
    return len(frames) / dt


def _require_device(
    timeout_s: int = 150,
    attempts: int = 3,
    backoff_s: float = 75.0,
    _probe=None,
) -> bool:
    """Fail when the accelerator backend is unreachable — but not fast.

    A dead TPU tunnel blocks ``jax.devices()`` forever inside a C gRPC
    call that Python signals cannot interrupt, so the probe runs in a
    killable subprocess.  Tunnel outages are usually transient while the
    driver's capture window is a single moment (round 3 lost its
    scoreboard entry to exactly this), so the probe retries with a
    bounded backoff: ``attempts`` tries, ``backoff_s`` sleep between
    them — worst case 3x150 s probes + 2x75 s waits = 10 min — before the bench
    emits its error-marked JSON line instead of hanging the driver.
    """
    import subprocess
    import sys

    def probe() -> bool:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, capture_output=True,
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    probe = _probe or probe
    for attempt in range(attempts):
        if probe():
            return True
        if attempt + 1 < attempts:
            time.sleep(backoff_s)
    return False


def main():
    if not _require_device():
        print(
            json.dumps(
                {
                    "metric": "analyze_fps_640x480",
                    "value": None,
                    "unit": "frames/sec",
                    "vs_baseline": None,
                    "error": "accelerator backend unreachable "
                             "(device init timed out)",
                    "host_nproc": os.cpu_count(),
                    "host_loadavg_1m": round(os.getloadavg()[0], 2),
                }
            )
        )
        return
    frames = make_clip()
    ours_fps = bench_ours(frames)
    # The TPU number must survive a baseline failure: compute the ratio
    # defensively and always print the JSON line.  The measured baseline
    # fps rides along so the ratio is auditable per run (the OpenCV number
    # halves under concurrent host load — see BENCHMARKS.md).
    try:
        cv_fps = bench_opencv(frames)
        vs_baseline = round(ours_fps / cv_fps, 3)
        baseline_value = round(cv_fps, 3)
    except Exception:
        vs_baseline = None
        baseline_value = None
    print(
        json.dumps(
            {
                "metric": "analyze_fps_640x480",
                "value": round(ours_fps, 3),
                "unit": "frames/sec",
                "vs_baseline": vs_baseline,
                "baseline_value": baseline_value,
                # Host context: the OpenCV baseline halves under
                # concurrent load and is capped by this host's core
                # count (the reference runs 4 analysis threads) — a
                # ratio is only auditable next to these.
                "host_nproc": os.cpu_count(),
                "host_loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
