import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial

from run_all import make_scene, build_synth_db
from polychase_tpu.engine import camera as C, refiner as R, pose as P
from polychase_tpu.engine.levmarq import CAUCHY
from polychase_tpu.io.database import Database
from polychase_tpu.engine.trajectory import CameraTrajectory

rng = np.random.default_rng(1)
n = 250
mesh, intr, poses = make_scene(n)
td = tempfile.mkdtemp(); db_path = os.path.join(td, "flow.db")
build_synth_db(db_path, mesh, intr, poses, rng)
traj = CameraTrajectory(0, n)
for i, p in enumerate(poses):
    traj.set(i, C.CameraState(intr, p))
db = Database(db_path)
data = R.build_refiner_data(db, traj, mesh, np.eye(4, dtype=np.float32))
db.close()
params = R.traj_to_params(traj)
model = jnp.eye(4); tri = mesh.triangle_corners(); scale = jnp.float32(1.0)
prims = R.refresh_prims(params, data, mesh, model)
E, M = data.src_kp.shape
ppc = 9

@partial(jax.jit, static_argnames=())
def jac_only(params, prims):
    res, valid, J_src, J_tgt = R._edge_eval(
        params, data, prims, tri, model, model, with_jac=True, opt_f=True, opt_pp=True)
    return res.sum() + J_src.sum() + J_tgt.sum() + valid.sum()

rngj = np.random.default_rng(0)
J_pair = jnp.asarray(rngj.normal(size=(E, M, 2, 18)).astype(np.float32))
res = jnp.asarray(rngj.normal(size=(E, M, 2)).astype(np.float32))
w = jnp.asarray(rngj.random((E, M)).astype(np.float32))
HI = jax.lax.Precision.HIGHEST

@jax.jit
def einsum_only(J_pair, res, w):
    JtJ_pair = jnp.einsum("emli,emlj,em->eij", J_pair, J_pair, w, precision=HI)
    Jtr_pair = jnp.einsum("emli,eml,em->ei", J_pair, res, w, precision=HI)
    return JtJ_pair, Jtr_pair

@jax.jit
def einsum_default(J_pair, res, w):
    JtJ_pair = jnp.einsum("emli,emlj,em->eij", J_pair, J_pair, w)
    Jtr_pair = jnp.einsum("emli,eml,em->ei", J_pair, res, w)
    return JtJ_pair, Jtr_pair

JtJ_pair = jnp.asarray(rngj.normal(size=(E, 18, 18)).astype(np.float32))
Jtr_pair = jnp.asarray(rngj.normal(size=(E, 18)).astype(np.float32))
sf = data.src_frame; tf = data.tgt_frame

@jax.jit
def scatter_only(JtJ_pair, Jtr_pair):
    off = jnp.arange(ppc)
    rows = jnp.concatenate([sf[:, None]*ppc + off, tf[:, None]*ppc + off], axis=1)
    Pn = n * ppc
    JtJ = jnp.zeros((Pn, Pn), jnp.float32)
    JtJ = JtJ.at[rows[:, :, None], rows[:, None, :]].add(JtJ_pair)
    Jtr = jnp.zeros((Pn,), jnp.float32).at[rows].add(Jtr_pair)
    return JtJ, Jtr

@jax.jit
def scatter_blocks(JtJ_pair, Jtr_pair):
    # 4 block scatters into (F,F,9,9) then transpose-reshape
    B11 = JtJ_pair[:, :9, :9]; B12 = JtJ_pair[:, :9, 9:]
    B21 = JtJ_pair[:, 9:, :9]; B22 = JtJ_pair[:, 9:, 9:]
    blocks = jnp.zeros((n, n, 9, 9), jnp.float32)
    blocks = blocks.at[sf, sf].add(B11)
    blocks = blocks.at[sf, tf].add(B12)
    blocks = blocks.at[tf, sf].add(B21)
    blocks = blocks.at[tf, tf].add(B22)
    JtJ = blocks.transpose(0, 2, 1, 3).reshape(n*9, n*9)
    Jtr_b = jnp.zeros((n, 9), jnp.float32)
    Jtr_b = Jtr_b.at[sf].add(Jtr_pair[:, :9]).at[tf].add(Jtr_pair[:, 9:])
    return JtJ, Jtr_b.reshape(-1)

def timed(name, fn, *a):
    out = fn(*a); jax.block_until_ready(jax.device_get(jax.tree.leaves(out)[0]))
    best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); out = fn(*a)
        jax.block_until_ready(jax.device_get(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter()-t0)
    print(f"{name:24s} {best*1e3:8.1f} ms")
    return out

timed("jac_chain_only", jac_only, params, prims)
timed("einsum_HIGHEST", einsum_only, J_pair, res, w)
timed("einsum_default", einsum_default, J_pair, res, w)
a1 = timed("scatter_rows", scatter_only, JtJ_pair, Jtr_pair)
a2 = timed("scatter_blocks", scatter_blocks, JtJ_pair, Jtr_pair)
print("scatter parity:", float(jnp.abs(a1[0]-a2[0]).max()))
