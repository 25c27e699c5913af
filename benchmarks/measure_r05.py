"""Round-5 measurement battery.  Run on an IDLE host with the tunnel up:

    python benchmarks/measure_r05.py [--phase N]

VERDICT r4 agenda: (1) tracking north star after the host-floor work
(quantized i16 uploads, batched DB reads, lazy packing), (2) fused
GFTT-into-prep A/B at 640p, (3) quality-neutral coarse-eps A/B at 4K,
(4) refine function_tol A/B on config 4, then the driver artifacts.

Each phase runs in its own subprocess so compile caches stay honest per
comparison; a dead tunnel mid-battery loses only the remaining phases.
NEVER run CPU work (pytest, builds) concurrently — 1-core host.
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_code(tag, code, timeout, env=None):
    print(f"=== {tag} ===", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    e["POLYCHASE_REPO"] = REPO
    e.update(env or {})
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=timeout, cwd=REPO, env=e,
        )
        print(r.stdout[-5000:])
        if r.returncode != 0:
            print("STDERR:", r.stderr[-2500:])
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout}s")
    print(f"({time.time() - t0:.0f}s)", flush=True)


def run_script(tag, argv, timeout):
    print(f"=== {tag} ===", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable] + argv, capture_output=True,
            text=True, timeout=timeout, cwd=REPO,
        )
        print(r.stdout[-6000:])
        if r.returncode != 0:
            print("STDERR:", r.stderr[-2500:])
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout}s")
    print(f"({time.time() - t0:.0f}s)", flush=True)


# ---- Phase 1: fused GFTT-into-prep A/B, 640p headline clip -----------
# Routing happens per dispatch (outside jit) -> in-process interleave.
AB_FUSED = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
import importlib
bench = importlib.import_module("bench")
frames = bench.make_clip()
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
info = VideoInfo(bench.W, bench.H, 0, len(frames))
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
os.environ["POLYCHASE_GFTT_PREP_FUSED"] = "0"; run()
os.environ["POLYCHASE_GFTT_PREP_FUSED"] = "1"; run()
a, b = [], []
for i in range(5):
    os.environ["POLYCHASE_GFTT_PREP_FUSED"] = "0"; a.append(run())
    os.environ["POLYCHASE_GFTT_PREP_FUSED"] = "1"; b.append(run())
print("fused=0 (split):", [round(x,3) for x in a], "min", round(min(a),3), "fps", round(12/min(a),2))
print("fused=1 (deflt):", [round(x,3) for x in b], "min", round(min(b),3), "fps", round(12/min(b),2))
'''

# ---- Phase 2: coarse-eps A/B at 4K (the quality-neutral replacement
# for the opt-in iteration cap).  Static jit arg -> env flips retrace;
# all arms stay warm after their first run.
AB_COARSE_EPS_4K = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
import numpy as np, cv2
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
W4, H4, NF = 3840, 2160, 6
rng = np.random.default_rng(3)
big = rng.integers(0, 255, (H4 + 40, W4 + 60)).astype(np.float32)
big = cv2.GaussianBlur(big, (0, 0), 1.5)
big = (255 * (big - big.min()) / np.ptp(big)).astype(np.uint8)
frames = [np.ascontiguousarray(big[3*t:3*t+H4, 5*t:5*t+W4]) for t in range(NF)]
info = VideoInfo(W4, H4, 0, NF)
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
ARMS = ["0", "0.02", "0.05"]
for v in ARMS:
    os.environ["POLYCHASE_LK_COARSE_EPS"] = v; run()   # compile each arm
res = {v: [] for v in ARMS}
for i in range(3):
    for v in ARMS:
        os.environ["POLYCHASE_LK_COARSE_EPS"] = v; res[v].append(run())
for v in ARMS:
    r = res[v]
    print(f"4k coarse_eps={v}:", [round(x,2) for x in r],
          "min", round(min(r),2), "fps", round(NF/min(r),3))
'''

# ---- Phase 3: coarse-eps A/B at 640p (headline config) ---------------
AB_COARSE_EPS_640 = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
import importlib
bench = importlib.import_module("bench")
frames = bench.make_clip()
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
info = VideoInfo(bench.W, bench.H, 0, len(frames))
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
ARMS = ["0", "0.02"]
for v in ARMS:
    os.environ["POLYCHASE_LK_COARSE_EPS"] = v; run()
res = {v: [] for v in ARMS}
for i in range(4):
    for v in ARMS:
        os.environ["POLYCHASE_LK_COARSE_EPS"] = v; res[v].append(run())
for v in ARMS:
    r = res[v]
    print(f"640p coarse_eps={v}:", [round(x,3) for x in r],
          "min", round(min(r),3), "fps", round(12/min(r),2))
'''

# ---- Phase 5: tracking quantized-upload A/B + headline fps -----------
AB_TRACK = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
sys.path.insert(0, os.path.join(os.environ["POLYCHASE_REPO"], "benchmarks"))
import numpy as np
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
        track_camera_trajectory(db, traj, 0, n - 1,
                                np.eye(4, dtype=np.float32), mesh)
        dt = time.perf_counter() - t0
        db.close()
        return dt
    # QUANT_TGT is read at module import -> flip the module attribute
    # (routing is per-dispatch host logic, so interleaving is safe).
    import polychase_tpu.engine.tracker as TR
    TR.QUANT_TGT = False; run()
    TR.QUANT_TGT = True; run()
    a, b = [], []
    for i in range(5):
        TR.QUANT_TGT = False; a.append(run())
        TR.QUANT_TGT = True; b.append(run())
    print("qtgt=0 (f32 tgt):", [round(x,3) for x in a],
          "min", round(min(a),3), "fps", round((n-1)/min(a),1))
    print("qtgt=1 (deflt):  ", [round(x,3) for x in b],
          "min", round(min(b),3), "fps", round((n-1)/min(b),1))
'''

# ---- Phase 6: refine function_tol A/B, config 4 ----------------------
AB_REFINE_FTOL = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
sys.path.insert(0, os.path.join(os.environ["POLYCHASE_REPO"], "benchmarks"))
import numpy as np, jax.numpy as jnp
import run_all as RA
from polychase_tpu.engine import camera as C, pose as P
from polychase_tpu.engine.levmarq import BundleOptions, CAUCHY
from polychase_tpu.engine.refiner import refine_trajectory
from polychase_tpu.engine.trajectory import CameraTrajectory
rng = np.random.default_rng(2)
n = 250
mesh, intr, poses = RA.make_scene(n)
with tempfile.TemporaryDirectory() as td:
    db_path = os.path.join(td, "flow.db")
    RA.build_synth_db(db_path, mesh, intr, poses, rng, kp_per_frame=128)
    def make_traj():
        traj = CameraTrajectory(0, n)
        for i, p in enumerate(poses):
            t = np.asarray(p.t)
            if i not in (0, n - 1):
                t = t + rng.normal(0, 0.005, 3).astype(np.float32)
            traj.set(i, C.CameraState(intr, P.Pose(p.q, jnp.asarray(t))))
        return traj
    def run(ftol):
        opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0,
                             max_iterations=30, function_tol=ftol)
        stats = []
        t0 = time.perf_counter()
        refine_trajectory(db_path, make_traj(),
                          np.eye(4, dtype=np.float32), mesh,
                          optimize_focal_length=True, bundle_opts=opts,
                          callback=lambda u: stats.append(u.stats) or True)
        return time.perf_counter() - t0, stats[-1]
    run(0.0); run(1e-5)   # warm both arms (ftol rides a traced vector)
    a, b = [], []
    for i in range(3):
        a.append(run(0.0)); b.append(run(1e-5))
    for tag, r in (("ftol=0    ", a), ("ftol=1e-5 ", b)):
        walls = [round(x[0], 2) for x in r]
        s = r[-1][1]
        print(f"{tag}: {walls} min {min(walls)}s  iters {int(s.iterations)}"
              f" cost {float(s.cost):.4f}")
'''

PHASES = [
    ("1 fused GFTT-into-prep A/B 640p",
     lambda: run_code("fused A/B", AB_FUSED, 3600)),
    ("2 coarse-eps A/B 4K",
     lambda: run_code("coarse-eps A/B 4K", AB_COARSE_EPS_4K, 6000)),
    ("3 coarse-eps A/B 640p",
     lambda: run_code("coarse-eps A/B 640p", AB_COARSE_EPS_640, 3600)),
    ("4 tracking decomposition probe",
     lambda: run_script("probe_track_floor",
                        [os.path.join(HERE, "probe_track_floor.py")], 3600)),
    ("5 tracking quantized-upload A/B + headline fps",
     lambda: run_code("track A/B", AB_TRACK, 3600)),
    ("6 refine function_tol A/B config 4",
     lambda: run_code("refine ftol A/B", AB_REFINE_FTOL, 4800)),
    ("7 bench.py driver lines (analyze + track, calib)",
     lambda: run_script("bench.py", [os.path.join(REPO, "bench.py")], 3600)),
    ("8 full battery artifact",
     lambda: run_script("run_all --json",
                        [os.path.join(HERE, "run_all.py"), "--json",
                         os.path.join(HERE, "results_r05.json")], 9000)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, default=None,
                    help="run only phase N (1-based)")
    args = ap.parse_args()
    for i, (name, fn) in enumerate(PHASES, 1):
        if args.phase is not None and i != args.phase:
            continue
        print(f"\n##### PHASE {name} #####", flush=True)
        fn()


if __name__ == "__main__":
    main()
