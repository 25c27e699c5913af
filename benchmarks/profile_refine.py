"""Component-level timing of the 250-frame refine problem on device."""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from run_all import make_scene, build_synth_db
from polychase_tpu.engine import camera as C, refiner as R
from polychase_tpu.engine.levmarq import CAUCHY
from polychase_tpu.io.database import Database

rng = np.random.default_rng(1)
n = 250
mesh, intr, poses = make_scene(n)
td = tempfile.mkdtemp()
db_path = os.path.join(td, "flow.db")
t0=time.perf_counter(); build_synth_db(db_path, mesh, intr, poses, rng); print(f"db {time.perf_counter()-t0:.0f}s")

from polychase_tpu.engine.trajectory import CameraTrajectory
from polychase_tpu.engine import pose as P
traj = CameraTrajectory(0, n)
r2 = np.random.default_rng(3)
for i, p in enumerate(poses):
    q = np.asarray(jax.device_get(p.q)); t = np.asarray(jax.device_get(p.t))
    if 0 < i < n-1:
        q = q + r2.normal(0, 0.005, 4).astype(np.float32); q/=np.linalg.norm(q)
        t = t + r2.normal(0, 0.01, 3).astype(np.float32)
    traj.set(i, C.CameraState(intr, P.Pose(jnp.asarray(q), jnp.asarray(t))))

db = Database(db_path)
data = R.build_refiner_data(db, traj, mesh, np.eye(4, dtype=np.float32))
db.close()
params = R.traj_to_params(traj)
model = jnp.eye(4); tri = mesh.triangle_corners()
scale = jnp.float32(1.0)
bounds = C.intrinsics_bounds(intr)
ppc = 9
print("E,M,F,K:", data.src_kp.shape, data.kps.shape)

prims = R.refresh_prims(params, data, mesh, model)

def timed(name, fn, reps=5):
    out = fn(); jax.block_until_ready(jax.device_get(jax.tree.leaves(out)[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn()
        jax.block_until_ready(jax.device_get(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter()-t0)
    print(f"{name:28s} {best*1e3:8.1f} ms")
    return out

JtJ, Jtr = timed("build_normal_equations", lambda: R.build_normal_equations(
    params, data, prims, tri, model, model, scale, loss_type=CAUCHY, opt_f=True, opt_pp=True, ppc=ppc))
timed("total_cost", lambda: R.total_cost(params, data, prims, tri, model, model, scale, loss_type=CAUCHY))
timed("try_lm_step", lambda: R.try_lm_step(JtJ, Jtr, params, data, prims, tri, model, model, scale, jnp.float32(1e-3), bounds, loss_type=CAUCHY, opt_f=True, opt_pp=True, ppc=ppc))
timed("refresh_prims_and_cost", lambda: R.refresh_prims_and_cost(params, data, mesh, model, model, tri, scale, loss_type=CAUCHY))
tol4 = jnp.asarray([1e-8, 1e-8, 1e-10, 1e3], jnp.float32)
Pn = n*ppc
scal = jnp.asarray([1.0, 1e-3, 2.0, 1.0, 0.0, 0.0, 0.0, 1000.0], jnp.float32)
timed("lm_chunk_device(4 iters)", lambda: R.lm_chunk_device(
    params, prims, jnp.zeros((Pn,Pn)), jnp.zeros((Pn,)), scal, data, mesh, model, model,
    tri, scale, bounds, tol4, None, loss_type=CAUCHY, opt_f=True, opt_pp=True, ppc=ppc, n_iters=4))
