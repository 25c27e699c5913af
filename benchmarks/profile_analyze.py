"""Stage-level profile of the Analyze pipeline (bench.py config 1)."""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench as B

frames = B.make_clip()

from polychase_tpu.engine import gftt as G, lk as L
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database, rgb_to_gray

# monkeypatch timers
import polychase_tpu.engine.opticalflow as OF
acc = {}
def wrap(mod, name, key):
    fn = getattr(mod, name)
    def wrapped(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[key] = acc.get(key, 0.0) + time.perf_counter() - t0
        return r
    setattr(mod, name, wrapped)

wrap(OF, 'prepare_pyramid', 'prepare_pyramid')
wrap(OF, 'gftt_dispatch', 'gftt_dispatch')
wrap(OF, 'gftt_finish', 'gftt_finish')
wrap(OF, 'calc_optical_flow_multi_async', 'lk_async_dispatch')
wrap(OF, 'calc_optical_flow_multi_finish', 'lk_finish')

info = VideoInfo(B.W, B.H, 0, len(frames))
def run():
    acc.clear()
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, os.path.join(td, 'f.db'))
        return time.perf_counter() - t0

run()  # warmup
for rep in range(2):
    dt = run()
    print(f"total={dt*1e3:.0f}ms  fps={len(frames)/dt:.2f}")
    other = dt - sum(acc.values())
    for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v*1e3:7.0f}ms")
    print(f"  {'other(host/db)':20s} {other*1e3:7.0f}ms")
