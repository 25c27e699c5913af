import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from run_all import make_scene, build_synth_db
from polychase_tpu.engine import camera as C, refiner as R, pose as P
from polychase_tpu.io.database import Database
from polychase_tpu.engine.trajectory import CameraTrajectory

rng = np.random.default_rng(1)
n = 250
mesh, intr, poses = make_scene(n)
td = tempfile.mkdtemp(); db_path = os.path.join(td, "flow.db")
build_synth_db(db_path, mesh, intr, poses, rng)

def make_traj():
    traj = CameraTrajectory(0, n)
    r2 = np.random.default_rng(3)
    for i, p in enumerate(poses):
        q = np.asarray(jax.device_get(p.q)); t = np.asarray(jax.device_get(p.t))
        if 0 < i < n-1:
            q = q + r2.normal(0, 0.005, 4).astype(np.float32); q/=np.linalg.norm(q)
            t = t + r2.normal(0, 0.01, 3).astype(np.float32)
        traj.set(i, C.CameraState(intr, P.Pose(jnp.asarray(q), jnp.asarray(t))))
    return traj

import polychase_tpu.engine.refiner as RF
acc = {}
orig_build = RF.build_refiner_data
def build_timed(*a, **k):
    t0 = time.perf_counter(); r = orig_build(*a, **k)
    acc['build_refiner_data'] = acc.get('build_refiner_data', 0) + time.perf_counter() - t0
    return r
RF.build_refiner_data = build_timed

orig_chunk = RF.lm_chunk_device
def chunk_timed(*a, **k):
    t0 = time.perf_counter(); r = orig_chunk(*a, **k)
    jax.block_until_ready(r[4])
    acc['lm_chunks'] = acc.get('lm_chunks', 0) + time.perf_counter() - t0
    acc['n_chunks'] = acc.get('n_chunks', 0) + 1
    return r
RF.lm_chunk_device = chunk_timed

for rep in range(2):
    acc.clear()
    traj = make_traj()
    stats_holder = []
    t0 = time.perf_counter()
    RF.refine_trajectory(db_path, traj, np.eye(4, dtype=np.float32), mesh,
                         optimize_focal_length=True,
                         callback=lambda u: stats_holder.append(u) or True)
    total = time.perf_counter() - t0
    print(f"total={total:.2f}s chunks={acc.get('n_chunks')} iters={int(stats_holder[-1].stats.iterations)}")
    for k, v in sorted(acc.items()):
        if k != 'n_chunks':
            print(f"  {k:22s} {v:7.2f}s")
