"""Round-4 measurement battery.  Run on an IDLE host with the tunnel up:

    python benchmarks/measure_r04.py [--phase N]

Priority order (VERDICT r3): the round-3 pending battery first (chain
A/B + bench + 4K A/B — measure_pending.py), then the round-4 kernel
experiments (narrow-span blend A/B, MXU blend A/B), the tracking
decomposition probe, and finally the full battery artifact.

Each phase runs in its own subprocess so compile caches stay honest per
comparison; a dead tunnel mid-battery loses only the remaining phases.
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

AB_BLEND = r'''
import os, sys, time, tempfile
sys.path.insert(0, os.environ["POLYCHASE_REPO"])
import importlib
bench = importlib.import_module("bench")
frames = bench.make_clip()
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
info = VideoInfo(bench.W, bench.H, 0, len(frames))
VAR = os.environ["AB_VARIANT"]          # narrow | mxu
if VAR == "mxu":
    raise SystemExit("the MXU blend was deleted in round 5 (measured "
                     "7.6x slower in round 4; see BENCHMARKS.md)")
FLAG = {"narrow": "POLYCHASE_LK_NARROW", "mxu": "POLYCHASE_LK_MXU"}[VAR]
ARMS = ["0", "1", "2"] if VAR == "narrow" else ["0", "1"]
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
# the blend variant is a static jit arg, so in-process env flips retrace
for v in ARMS:
    os.environ[FLAG] = v; run()   # compile each arm
res = {v: [] for v in ARMS}
for i in range(4):
    for v in ARMS:
        os.environ[FLAG] = v; res[v].append(run())
for v in ARMS:
    r = res[v]
    print(f"{VAR}={v}:", [round(x,3) for x in r],
          "min", round(min(r),3), "fps", round(12/min(r),2))
'''

AB_BLEND_4K = r'''
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
ARMS = ["0", "1", "2"]
for v in ARMS:
    os.environ["POLYCHASE_LK_NARROW"] = v; run()   # compile each arm
res = {v: [] for v in ARMS}
for i in range(3):
    for v in ARMS:
        os.environ["POLYCHASE_LK_NARROW"] = v; res[v].append(run())
for v in ARMS:
    r = res[v]
    print(f"4k narrow={v}:", [round(x,2) for x in r],
          "min", round(min(r),2), "fps", round(NF/min(r),3))
'''


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
        print(r.stdout[-4000:])
        if r.returncode != 0:
            print("STDERR:", r.stderr[-2000:])
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
            print("STDERR:", r.stderr[-2000:])
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout}s")
    print(f"({time.time() - t0:.0f}s)", flush=True)


AB_GFTT = r'''
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
# routing happens per dispatch (outside jit) -> in-process interleave is safe
os.environ["POLYCHASE_GFTT_TOPK"] = "0"; run()
os.environ["POLYCHASE_GFTT_TOPK"] = "1"; run()
a, b = [], []
for i in range(5):
    os.environ["POLYCHASE_GFTT_TOPK"] = "0"; a.append(run())
    os.environ["POLYCHASE_GFTT_TOPK"] = "1"; b.append(run())
print("topk=0 (raw maps):", [round(x,3) for x in a], "min", round(min(a),3), "fps", round(12/min(a),2))
print("topk=1 (default): ", [round(x,3) for x in b], "min", round(min(b),3), "fps", round(12/min(b),2))
'''

AB_COARSE_4K = AB_BLEND_4K.replace(
    "POLYCHASE_LK_NARROW", "POLYCHASE_LK_COARSE_ITERS"
).replace('ARMS = ["0", "1", "2"]', 'ARMS = ["0", "8"]').replace(
    "4k narrow=", "4k coarse="
)

PHASES = [
    ("1 pending r3 battery (chain A/B + bench + 4K A/B)",
     lambda: run_script("measure_pending",
                        [os.path.join(HERE, "measure_pending.py")], 7200)),
    ("2 narrow blend A/B 640p",
     lambda: run_code("narrow A/B", AB_BLEND, 3000,
                      {"AB_VARIANT": "narrow"})),
    ("3 MXU blend A/B 640p",
     lambda: run_code("mxu A/B", AB_BLEND, 3000, {"AB_VARIANT": "mxu"})),
    ("4 narrow blend A/B 4K",
     lambda: run_code("narrow A/B 4K", AB_BLEND_4K, 4800)),
    ("5 tracking decomposition probe",
     lambda: run_script("probe_track_floor",
                        [os.path.join(HERE, "probe_track_floor.py")], 3600)),
    ("6 full battery artifact",
     lambda: run_script("run_all --json",
                        [os.path.join(HERE, "run_all.py"), "--json",
                         os.path.join(HERE, "results_r04.json")], 7200)),
    ("7 coarse-iteration cap A/B 4K (quality trade recorded in "
     "tests/test_lk_blend_variants.py)",
     lambda: run_code("coarse A/B 4K", AB_COARSE_4K, 4800)),
    ("8 GFTT raw-maps-vs-topk A/B 640p",
     lambda: run_code("gftt A/B", AB_GFTT, 3000)),
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
