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
import sys
import tempfile
import time

import numpy as np

W, H = 640, 480
N_FRAMES = 12


def calibration_probe() -> float:
    """Session-speed calibration: a FIXED committed kernel timed the same
    way as the benchmarks (dispatch + device compute + one 1 MB result
    fetch).  The tunneled chip's e2e timings swing ±20% between sessions
    (BENCHMARKS.md); dividing two rounds' headline numbers by their
    calib_ms ratio normalizes that swing post-hoc.  Do NOT change this
    kernel — its value is only comparable against other rounds' runs of
    the same program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        def body(i, a):
            return jnp.tanh(
                jnp.dot(a, x, preferred_element_type=jnp.float32)
            )

        return jax.lax.fori_loop(0, 32, body, x)

    x = jnp.asarray(np.full((512, 512), 0.001, np.float32))
    jax.device_get(f(x))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2] * 1000.0, 2)


def bench_track():
    """Config-3 forward tracking (the BASELINE.json north-star metric),
    sharing run_all's scene/db builder so the number matches the
    committed battery rows.  Returns (fps, baseline_fps | None)."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    )
    import run_all as RA

    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine.tracker import track_camera_trajectory
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database

    rng = np.random.default_rng(1)
    n = 120
    mesh, intr, poses = RA.make_scene(n)
    with tempfile.TemporaryDirectory() as td:
        db_path = os.path.join(td, "flow.db")
        RA.build_synth_db(db_path, mesh, intr, poses, rng)

        def run():
            traj = CameraTrajectory(0, n)
            traj.set(0, C.CameraState(intr, poses[0]))
            db = Database(db_path)
            t0 = time.perf_counter()
            track_camera_trajectory(
                db, traj, 0, n - 1, np.eye(4, dtype=np.float32), mesh
            )
            dt = time.perf_counter() - t0
            db.close()
            return dt

        run()  # warm/compile
        fps = (n - 1) / min(run() for _ in range(3))
        base_fps = None
        try:
            base_fps = RA._baseline_track_fps(db_path, mesh, intr, poses, n)
        except Exception:
            pass
        return fps, base_fps


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
    track_only = "--track" in sys.argv[1:]
    metric = (
        "tracking_fps_120f_1080p" if track_only else "analyze_fps_640x480"
    )
    if not _require_device():
        print(
            json.dumps(
                {
                    "metric": metric,
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
    calib_ms = None
    try:
        calib_ms = calibration_probe()
    except Exception:
        pass

    if track_only:
        # Dedicated tracking line (`python bench.py --track`): the
        # BASELINE.json north-star metric with the same retry/backoff
        # and JSON shape as the headline.
        fps, base_fps = bench_track()
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(fps, 3),
                    "unit": "frames/sec",
                    "vs_baseline": (
                        round(fps / base_fps, 3) if base_fps else None
                    ),
                    "baseline_value": (
                        round(base_fps, 3) if base_fps else None
                    ),
                    "calib_ms": calib_ms,
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
    # Config-3 tracking rides the same driver-captured line as extra
    # fields (the driver records ONE line; extra keys are additive).
    track_fps = track_vs = track_base = None
    if os.environ.get("POLYCHASE_BENCH_NO_TRACK", "0") != "1":
        try:
            fps, base_fps = bench_track()
            track_fps = round(fps, 3)
            if base_fps:
                track_vs = round(fps / base_fps, 3)
                track_base = round(base_fps, 3)
        except Exception:
            pass
    print(
        json.dumps(
            {
                "metric": "analyze_fps_640x480",
                "value": round(ours_fps, 3),
                "unit": "frames/sec",
                "vs_baseline": vs_baseline,
                "baseline_value": baseline_value,
                # Session-speed normalizer (fixed kernel, see
                # calibration_probe) and the second audited metric.
                "calib_ms": calib_ms,
                "track_fps": track_fps,
                "track_vs_baseline": track_vs,
                "track_baseline_value": track_base,
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
