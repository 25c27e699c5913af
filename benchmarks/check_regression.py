#!/usr/bin/env python3
"""Perf-regression gate for the flagship device paths.

Re-measures each flagship metric INTERLEAVED (round-robin across metrics,
several reps each, min taken) and compares against the committed baseline
``benchmarks/perf_baseline.json``.  The tunneled chip's e2e timings drift
±25% between sessions (BENCHMARKS.md), so the envelope is ±35%: a genuine
2× kernel regression still trips it, session noise does not.

Usage:
    python benchmarks/check_regression.py            # gate (exit 1 on fail)
    python benchmarks/check_regression.py --update   # re-measure + rewrite
                                                     # the baseline file
    python benchmarks/check_regression.py --only lk_chain_ms

Metrics:
    lk_chain_ms      12-frame analyze LK fan-out (Pallas kernels), full
                     dispatch + result fetch, everything else removed
    raycast_sweep_ms fused brute ray-cast sweep, 32k rays x 100k tris
    tracking_ms      40-frame tracking scan chain (raycast+PnP on device)
    analyze_clip_ms  bench.py config-1 clip end-to-end, ms per 12-frame
                     clip (stored as ms so bigger = slower like the rest)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "perf_baseline.json"
)
ENVELOPE = 1.35
REPS = 4


def _metric_lk_chain():
    import jax

    import bench as B
    from polychase_tpu.engine import gftt as G
    from polychase_tpu.engine import lk as L
    from polychase_tpu.engine.opticalflow import IMAGE_SKIPS

    frames = B.make_clip()
    opts = L.LKOptions()
    feats = [
        G.good_features_to_track(f, None, G.GFTTOptions())[0]
        for f in frames
    ]
    devs = [jax.device_put(f) for f in frames]
    pyrs = [L.prepare_pyramid(d, opts) for d in devs]

    def run():
        t0 = time.perf_counter()
        handles = []
        for i in range(len(frames)):
            targets = [
                i + s for s in IMAGE_SKIPS if 0 <= i + s < len(frames)
            ]
            handles.append(
                L.calc_optical_flow_multi_async(
                    pyrs[i], [pyrs[t] for t in targets], feats[i], opts
                )
            )
        for h in handles:
            L.calc_optical_flow_multi_finish(h)
        return (time.perf_counter() - t0) * 1e3

    return run


def _metric_raycast_sweep():
    import jax
    import jax.numpy as jnp

    from bench_raycast_grid import make_mesh, rays
    from polychase_tpu.engine.geometry import Mesh
    from polychase_tpu.engine.raycast import raycast_grouped

    v, t = make_mesh(100_000)
    mesh = Mesh.create(v, t)
    o, d = rays(64, 512)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    def run():
        t0 = time.perf_counter()
        hits = raycast_grouped(mesh, oj, dj, True)
        jax.device_get(hits.t)
        return (time.perf_counter() - t0) * 1e3

    return run


def _metric_tracking():
    import jax

    from run_all import build_synth_db, make_scene
    from polychase_tpu.engine import camera as C
    from polychase_tpu.engine.tracker import track_camera_trajectory
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database

    rng = np.random.default_rng(1)
    n = 40
    mesh, intr, poses = make_scene(n)
    td = tempfile.mkdtemp()
    db_path = os.path.join(td, "flow.db")
    build_synth_db(db_path, mesh, intr, poses, rng)

    def run():
        traj = CameraTrajectory(0, n)
        traj.set(0, C.CameraState(intr, poses[0]))
        db = Database(db_path)
        t0 = time.perf_counter()
        track_camera_trajectory(
            db, traj, 0, n - 1, np.eye(4, dtype=np.float32), mesh
        )
        dt = (time.perf_counter() - t0) * 1e3
        db.close()
        return dt

    return run


def _metric_analyze_fps():
    import bench as B

    frames = B.make_clip()
    from polychase_tpu.engine.opticalflow import (
        VideoInfo,
        generate_optical_flow_database,
    )

    info = VideoInfo(B.W, B.H, 0, len(frames))

    def run():
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "flow.db")
            t0 = time.perf_counter()
            generate_optical_flow_database(
                info, lambda fid: frames[fid], None, path
            )
            dt = time.perf_counter() - t0
        # store as ms-per-clip so "bigger = slower" like the others
        return dt * 1e3

    return run


def _metric_lk_chain_seeded():
    """The chained-seeding variant of the 12-frame LK fan (opt-in since
    the round-4 A/B; `_metric_lk_chain` is the default independent
    route).  Forces POLYCHASE_LK_CHAIN=1 so the metric keeps tracking
    the chained kernels even though the package default is off."""
    import jax

    import bench as B
    from polychase_tpu.engine import gftt as G
    from polychase_tpu.engine import lk as L
    from polychase_tpu.engine.opticalflow import IMAGE_SKIPS

    frames = B.make_clip()
    opts = L.LKOptions()
    feats = [
        G.good_features_to_track(f, None, G.GFTTOptions())[0]
        for f in frames
    ]
    devs = [jax.device_put(f) for f in frames]
    pyrs = [L.prepare_pyramid(d, opts) for d in devs]

    def run():
        prev = os.environ.get("POLYCHASE_LK_CHAIN")
        os.environ["POLYCHASE_LK_CHAIN"] = "1"  # scoped: interleaved
        try:                                    # metrics keep defaults
            t0 = time.perf_counter()
            handles = []
            for i in range(len(frames)):
                skips = [
                    s for s in IMAGE_SKIPS if 0 <= i + s < len(frames)
                ]
                handles.append(L.calc_optical_flow_multi_async(
                    pyrs[i], [pyrs[i + s] for s in skips], feats[i],
                    opts, skips=skips,
                ))
            for h in handles:
                L.calc_optical_flow_multi_finish(h)
            return (time.perf_counter() - t0) * 1e3
        finally:
            if prev is None:
                del os.environ["POLYCHASE_LK_CHAIN"]
            else:
                os.environ["POLYCHASE_LK_CHAIN"] = prev

    return run


METRICS = {
    "lk_chain_ms": _metric_lk_chain,
    "lk_chain_seeded_ms": _metric_lk_chain_seeded,
    "raycast_sweep_ms": _metric_raycast_sweep,
    "tracking_ms": _metric_tracking,
    "analyze_clip_ms": _metric_analyze_fps,
}


def measure(only=None):
    if only is not None and only not in METRICS:
        raise SystemExit(
            f"unknown metric {only!r}; choose from {sorted(METRICS)}"
        )
    runners = {}
    for name, factory in METRICS.items():
        if only and name != only:
            continue
        runners[name] = factory()
    # warm (compiles)
    for name, run in runners.items():
        t = run()
        print(f"# warm {name}: {t:.1f} ms", file=sys.stderr)
    results = {name: [] for name in runners}
    for _ in range(REPS):
        for name, run in runners.items():  # interleaved round-robin
            results[name].append(run())
    return {name: min(vals) for name, vals in results.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    vals = measure(args.only)
    print(json.dumps({k: round(v, 2) for k, v in vals.items()}))

    if args.update:
        base = {}
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                base = json.load(f)
        base.update({k: round(v, 2) for k, v in vals.items()})
        base["_meta"] = {
            "envelope": ENVELOPE,
            "note": "min of interleaved reps, ms, single v5e via tunnel",
        }
        with open(BASELINE_PATH, "w") as f:
            json.dump(base, f, indent=2, sort_keys=True)
        print(f"baseline written: {BASELINE_PATH}")
        return 0

    if not os.path.exists(BASELINE_PATH):
        print("no baseline file; run with --update first", file=sys.stderr)
        return 2
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    rc = 0
    for name, v in vals.items():
        b = base.get(name)
        if b is None:
            print(f"{name:18s} {v:9.1f} ms  (no baseline)")
            continue
        ratio = v / b
        flag = "OK"
        if ratio > ENVELOPE:
            flag = "REGRESSION"
            rc = 1
        elif ratio < 1.0 / ENVELOPE:
            flag = "faster — consider --update"
        print(f"{name:18s} {v:9.1f} ms  vs {b:9.1f}  x{ratio:.2f}  {flag}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
