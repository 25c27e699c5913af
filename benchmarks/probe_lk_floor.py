"""Pipelined device floor for the Analyze clip (config 1).

Measures, on the real chip, the wall time of the clip's LK work alone
with everything else removed: all 12 frames' multi-target dispatches
enqueued back-to-back (async), results drained at the end.  This is the
fps ceiling of a perfectly overlapped pipeline; the gap between it and
bench.py is the cost of un-overlapped host stages.

Also probes the GFTT device program and the fused pyramid prep the same
way, giving the per-stage device budget.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench as B

frames = B.make_clip()

import jax

from polychase_tpu.engine import gftt as G
from polychase_tpu.engine import lk as L
from polychase_tpu.engine.opticalflow import IMAGE_SKIPS

opts = L.LKOptions()
det = G.GFTTOptions()

# Host-side GFTT once to get realistic feature sets.
feats = {}
for i, f in enumerate(frames):
    pts, _ = G.good_features_to_track(f, None, det)
    feats[i] = pts
print("features/frame:", [len(feats[i]) for i in range(len(frames))])

devs = [jax.device_put(f) for f in frames]
pyrs = [L.prepare_pyramid(d, opts) for d in devs]
jax.block_until_ready(pyrs[0].levels[0][0])


def drain(outs):
    """Force execution with device_get (block_until_ready is unreliable
    over the tunnel — see CLAUDE.md); fetch a tiny slice so the transfer
    itself stays negligible."""
    for o in outs:
        jax.device_get(o.ravel()[:8])


def lk_all(fetch=True, chain=False):
    handles = []
    for i in range(len(frames)):
        skips = [s for s in IMAGE_SKIPS if 0 <= i + s < len(frames)]
        targets = [i + s for s in skips]
        h = L.calc_optical_flow_multi_async(
            pyrs[i], [pyrs[t] for t in targets], feats[i], opts,
            skips=skips if chain else None,
        )
        handles.append(h)
    if fetch:
        return [L.calc_optical_flow_multi_finish(h) for h in handles]
    drain(
        jax.tree.leaves(
            [h[2] for h in handles if h[0] not in ("empty",)]
        )
    )
    return handles


def timeit(fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


mn, med = timeit(lambda: lk_all(fetch=False))
print(
    f"LK only, no result fetch : min {mn*1e3:7.1f} ms"
    f"  ({len(frames)/mn:.2f} fps ceiling)  med {med*1e3:.1f}"
)
mn, med = timeit(lambda: lk_all(fetch=True))
print(
    f"LK + result device_get   : min {mn*1e3:7.1f} ms"
    f"  ({len(frames)/mn:.2f} fps)  med {med*1e3:.1f}"
)
mn, med = timeit(lambda: lk_all(fetch=False, chain=True))
print(
    f"LK chained, no fetch     : min {mn*1e3:7.1f} ms"
    f"  ({len(frames)/mn:.2f} fps ceiling)  med {med*1e3:.1f}"
)
mn, med = timeit(lambda: lk_all(fetch=True, chain=True))
print(
    f"LK chained + device_get  : min {mn*1e3:7.1f} ms"
    f"  ({len(frames)/mn:.2f} fps)  med {med*1e3:.1f}"
)


def gftt_all():
    hs = [G.gftt_dispatch(d, None, det) for d in devs]
    drain([h.vals for h in hs])


mn, med = timeit(gftt_all)
print(f"GFTT device (12 frames)  : min {mn*1e3:7.1f} ms  med {med*1e3:.1f}")


def gftt_full():
    hs = [G.gftt_dispatch(d, None, det) for d in devs]
    return [G.gftt_finish(h) for h in hs]


mn, med = timeit(gftt_full)
print(f"GFTT + host finish (12)  : min {mn*1e3:7.1f} ms  med {med*1e3:.1f}")


def prep_all():
    ps = [L.prepare_pyramid(d, opts) for d in devs]
    drain([p.levels[0][0] for p in ps])


mn, med = timeit(prep_all)
print(f"pyramid prep (12 frames) : min {mn*1e3:7.1f} ms  med {med*1e3:.1f}")


def upload_all():
    ds = [jax.device_put(f) for f in frames]
    drain(ds)


mn, med = timeit(upload_all)
print(f"u8 uploads (12 frames)   : min {mn*1e3:7.1f} ms  med {med*1e3:.1f}")
