"""End-to-end RMSE parity vs the independent CPU implementation.

BASELINE.json's quality metric is "BA reprojection RMSE parity (within
1%)".  benchmarks/baseline_cpu.py is a from-scratch numpy + native-BVH
implementation of the reference's tracker and refiner (it shares no
solver code with the device path beyond the host PnP LM); these tests
drive both implementations over the same synthetic flow database and
assert the end-to-end reprojection RMSE agrees within 1%.
"""

import os
import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "benchmarks")
)
import baseline_cpu as bc  # noqa: E402

from polychase_tpu.engine import camera as C  # noqa: E402
from polychase_tpu.engine import pose as P  # noqa: E402
from polychase_tpu.engine.levmarq import BundleOptions, CAUCHY  # noqa: E402
from polychase_tpu.engine.trajectory import CameraTrajectory  # noqa: E402
from polychase_tpu.io.database import Database  # noqa: E402
from polychase_tpu.native import BvhRaycaster, available  # noqa: E402

from synthetic import make_intrinsics, make_sphere_mesh, orbit_pose  # noqa: E402

pytestmark = pytest.mark.skipif(
    not available(), reason="native BVH unavailable"
)

N_FRAMES = 20
KP = 96


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Sphere mesh + orbit trajectory + consistent flow DB (0.3px noise)."""
    rng = np.random.default_rng(5)
    mesh = make_sphere_mesh(16, 24)
    verts = np.asarray(mesh.vertices)
    tris = np.asarray(mesh.triangles)
    intr = make_intrinsics()
    bvh = BvhRaycaster(verts, tris)

    poses = [orbit_pose(0.02 * t) for t in range(N_FRAMES)]
    poses_np = [
        (np.asarray(p.q, np.float64), np.asarray(p.t, np.float64))
        for p in jax.device_get(poses)
    ]
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)

    db_path = str(tmp_path_factory.mktemp("parity") / "flow.db")
    db = Database(db_path)
    pts3d = {}
    for i, (q, t) in enumerate(poses_np):
        R = bc._rotmat(q)
        pix = rng.uniform((200, 150), (440, 330), (KP, 2))
        d_cam = bc._unproject(intr, pix)
        d_world = d_cam @ R
        origin = -(R.T @ t)
        pos, _n, _b, _t, prim = bvh.raycast(
            np.broadcast_to(origin, d_world.shape).astype(np.float32),
            d_world.astype(np.float32),
        )
        hit = prim != bc._INVALID
        db.write_keypoints(i, pix[hit].astype(np.float32))
        pts3d[i] = pos[hit].astype(np.float64)

    for i in range(N_FRAMES):
        X = pts3d[i]
        for skip in (-8, -4, -2, -1, 1, 2, 4, 8):
            j = i + skip
            if not 0 <= j < N_FRAMES:
                continue
            qj, tj = poses_np[j]
            Rj = bc._rotmat(qj)
            Z = X @ Rj.T + tj
            proj = np.stack(
                [fx * Z[:, 0] / Z[:, 2] + cx, fy * Z[:, 1] / Z[:, 2] + cy],
                axis=-1,
            )
            inb = (
                (proj[:, 0] > 0) & (proj[:, 0] < float(intr.width))
                & (proj[:, 1] > 0) & (proj[:, 1] < float(intr.height))
            )
            idx = np.nonzero(inb)[0].astype(np.uint32)
            noise = rng.normal(0, 0.3, (idx.size, 2))
            db.write_image_pair_flow(
                i, j, idx, (proj[inb] + noise).astype(np.float32),
                np.zeros(idx.size, np.float32),
            )
    db.close()
    return dict(
        mesh=mesh, verts=verts, tris=tris, intr=intr, bvh=bvh,
        poses=poses_np, db_path=db_path,
    )


def _rmse(sc, traj_dict):
    db = Database(sc["db_path"])
    try:
        return bc.reprojection_rmse(
            db, traj_dict, 0, N_FRAMES - 1, np.eye(4), sc["bvh"],
            sc["intr"], sc["verts"], sc["tris"],
        )
    finally:
        db.close()


def _our_traj_to_dict(traj):
    states = jax.device_get(
        [traj.get(f) for f in range(traj.first_frame, traj.last_frame + 1)]
    )
    return {
        traj.first_frame + i: (
            np.asarray(s.pose.q, np.float64),
            np.asarray(s.pose.t, np.float64),
        )
        for i, s in enumerate(states)
    }


def test_ba_jacobian_matches_finite_difference(scene):
    """The independent BA's analytic Jacobian is validated numerically —
    the parity tests below lean on it being independently correct."""
    sc = scene
    db = Database(sc["db_path"])
    traj = {i: sc["poses"][i] for i in range(N_FRAMES)}
    prob = bc._BAProblem(
        db, traj, 0, 7, np.eye(4), sc["bvh"], sc["intr"], None,
        sc["verts"], sc["tris"],
    )
    db.close()
    cams = [
        bc.HostCam(*traj[i], sc["intr"].fy, sc["intr"].cx, sc["intr"].cy)
        for i in range(8)
    ]
    res0, valid, J_src, J_tgt = prob.evaluate(cams, True, True, True)

    # Perturb one non-anchor camera's params, compare against J prediction
    ci = 3
    eps = 1e-5
    for k in range(9):
        dp = np.zeros(9)
        dp[k] = eps
        cams2 = [
            bc.HostCam(c.q, c.t, c.fy, c.cx, c.cy) for c in cams
        ]
        c = cams2[ci]
        c.q = bc._quat_step_post(c.q, dp[0:3])
        c.t = c.t + dp[3:6]
        c.fy += dp[6]; c.cx += dp[7]; c.cy += dp[8]
        res1, valid1, _, _ = prob.evaluate(cams2, True, True, True)
        num = (res1 - res0) / eps
        pred = np.zeros_like(num)
        m_src = prob.sf == ci
        m_tgt = prob.tf == ci
        pred[m_src] += J_src[m_src, :, k]
        pred[m_tgt] += J_tgt[m_tgt, :, k]
        both = valid & valid1
        np.testing.assert_allclose(
            num[both], pred[both], atol=2e-3 * max(1.0, np.abs(
                pred[both]).max()),
        )


def test_tracking_rmse_parity(scene, monkeypatch):
    """Our tracker vs the independent CPU tracker on the same DB: final
    trajectory reprojection RMSE within 1%."""
    from polychase_tpu.engine.tracker import track_camera_trajectory

    sc = scene
    opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0)

    # Ours
    traj = CameraTrajectory(0, N_FRAMES)
    q0, t0 = sc["poses"][0]
    traj.set(0, C.CameraState(
        sc["intr"],
        P.Pose(jnp.asarray(q0, jnp.float32), jnp.asarray(t0, jnp.float32)),
    ))
    db = Database(sc["db_path"])
    track_camera_trajectory(
        db, traj, 0, N_FRAMES - 1, np.eye(4, dtype=np.float32),
        sc["mesh"], bundle_opts=opts,
    )
    db.close()
    ours = _our_traj_to_dict(traj)
    assert len(ours) == N_FRAMES

    # Independent CPU implementation
    cpu = {0: sc["poses"][0]}
    db = Database(sc["db_path"])
    ratios = bc.cpu_track_trajectory(
        db, cpu, 0, N_FRAMES - 1, np.eye(4), sc["bvh"], sc["intr"],
        bundle_opts=opts,
    )
    db.close()
    assert len(cpu) == N_FRAMES
    assert min(ratios.values()) > 0.8

    rmse_ours = _rmse(sc, ours)
    rmse_cpu = _rmse(sc, cpu)
    assert rmse_ours < 1.0 and rmse_cpu < 1.0
    assert abs(rmse_ours - rmse_cpu) <= 0.01 * max(rmse_ours, rmse_cpu), (
        rmse_ours, rmse_cpu,
    )


def test_refine_rmse_parity(scene):
    """Our BA vs the independent sparse-LM BA on the same perturbed
    trajectory: final reprojection RMSE within 1%."""
    from polychase_tpu.engine.refiner import refine_trajectory

    sc = scene
    rng = np.random.default_rng(11)
    opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0,
                         max_iterations=30)

    noise = {
        i: rng.normal(0, 0.004, 3)
        for i in range(1, N_FRAMES - 1)
    }

    traj = CameraTrajectory(0, N_FRAMES)
    cpu0 = {}
    for i in range(N_FRAMES):
        q, t = sc["poses"][i]
        t = t + noise.get(i, 0.0)
        cpu0[i] = (q.copy(), t.copy())
        traj.set(i, C.CameraState(
            sc["intr"],
            P.Pose(jnp.asarray(q, jnp.float32),
                   jnp.asarray(t, jnp.float32)),
        ))

    refined = refine_trajectory(
        sc["db_path"], traj, np.eye(4, dtype=np.float32), sc["mesh"],
        bundle_opts=opts,
    )
    ours = _our_traj_to_dict(refined)

    db = Database(sc["db_path"])
    cpu, _cost = bc.cpu_refine_trajectory(
        db, cpu0, 0, N_FRAMES - 1, np.eye(4), sc["bvh"], sc["intr"],
        sc["verts"], sc["tris"], bundle_opts=opts,
    )
    db.close()

    rmse0 = _rmse(sc, cpu0)
    rmse_ours = _rmse(sc, ours)
    rmse_cpu = _rmse(sc, cpu)
    # Both reduce the perturbation and land on the same optimum
    assert rmse_ours < 0.8 * rmse0
    assert rmse_cpu < 0.8 * rmse0
    assert abs(rmse_ours - rmse_cpu) <= 0.01 * max(rmse_ours, rmse_cpu), (
        rmse0, rmse_ours, rmse_cpu,
    )
