"""Full-pipeline end-to-end on rendered images.

Renders a procedurally-textured sphere with the engine's own ray caster,
then drives the ENTIRE public pipeline on those images: GFTT + pyramidal
LK into a flow database -> sequential tracking from one ground-truth
pose -> bundle-adjustment refinement of a perturbed trajectory.  This is
the closest thing to the reference's real Blender workflow that runs
headless (SURVEY §4b)."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polychase_tpu.polychase_core as pc
from polychase_tpu.engine import camera as C, pose as P
from polychase_tpu.engine.geometry import Mesh
from polychase_tpu.engine.raycast import raycast_grouped
from polychase_tpu.engine.tracker import unproject_np, _np_quat_to_mat

from synthetic import make_sphere_mesh, orbit_pose
from test_tracker import pose_errors

W, H = 240, 180
FOCAL = 260.0
N_FRAMES = 8


def _intr():
    return C.Intrinsics.create(
        FOCAL, FOCAL, W / 2, H / 2, 1.0, W, H, C.OPENCV
    )


def _noise_fn(rng):
    ks = rng.normal(0, 18.0, (6, 3))
    phases = rng.uniform(0, 2 * np.pi, 6)
    amps = rng.uniform(0.5, 1.0, 6)

    def tex(p):  # p (N, 3) -> (N,) in [-1, 1]-ish
        acc = np.zeros(p.shape[0])
        for k, ph, a in zip(ks, phases, amps):
            acc += a * np.sin(p @ k + ph)
        return acc / np.sum(amps)

    return tex


def _render(mesh, intr, pose, tex):
    """Shade every pixel by a smooth 3D texture at the hit point."""
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1).astype(
        np.float32
    )
    dirs_cam = unproject_np(intr, pix)
    R = _np_quat_to_mat(np.asarray(pose.q))
    t = np.asarray(pose.t, np.float64)
    origin = (-(R.T @ t)).astype(np.float32)
    dirs = (dirs_cam @ R).astype(np.float32)
    hits = raycast_grouped(
        mesh, jnp.asarray(origin[None]), jnp.asarray(dirs[None]), True
    )
    valid = np.asarray(hits.valid[0])
    pos = np.asarray(hits.pos[0])
    img = np.full(W * H, 64.0)
    img[valid] = 150.0 + 70.0 * tex(pos[valid].astype(np.float64))
    return np.clip(img, 0, 255).astype(np.uint8).reshape(H, W)


@pytest.fixture(scope="module")
def rendered_scene():
    rng = np.random.default_rng(11)
    mesh = make_sphere_mesh()
    intr = _intr()
    poses = [orbit_pose(0.035 * i) for i in range(N_FRAMES)]
    tex = _noise_fn(rng)
    frames = [_render(mesh, intr, p, tex) for p in poses]
    # the sphere must actually be textured and visible
    assert frames[0].std() > 15
    return mesh, intr, poses, frames


def test_full_pipeline_on_rendered_images(rendered_scene, tmp_path):
    mesh, intr, poses, frames = rendered_scene
    db_path = str(tmp_path / "flow.db")

    # --- 1. Analyze: real GFTT + LK on the rendered frames --------------
    info = pc.VideoInfo(width=W, height=H, first_frame=0,
                        num_frames=N_FRAMES)
    pc.generate_optical_flow_database(
        info, lambda fid: frames[fid], None, db_path
    )
    db = pc.Database(db_path)
    assert db.get_max_image_id_with_keypoints() == N_FRAMES - 1
    n_kp = db.read_keypoints(0).shape[0]
    assert n_kp > 60, n_kp
    db.close()

    # --- 2. Track forward from the ground-truth first pose --------------
    core_intr = pc.CameraIntrinsics(
        FOCAL, FOCAL, W / 2, H / 2, 1.0, W, H, pc.CameraConvention.OpenCV,
    )
    from polychase_tpu.engine.tracker import pose_rt4x4_np

    view0 = pose_rt4x4_np(poses[0]).astype(np.float32)
    st = pc.SceneTransformations(
        model_matrix=np.eye(4, dtype=np.float32),
        view_matrix=view0, intrinsics=core_intr,
    )
    accel = pc.AcceleratedMesh(
        np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    )
    results = []
    pc.track_sequence(
        db_path, 0, N_FRAMES - 1, st, accel,
        lambda r: results.append(r) or True,
    )
    assert len(results) == N_FRAMES - 1
    for r in results:
        assert r.inlier_ratio > 0.8, (r.frame, r.inlier_ratio)
        gt = poses[r.frame]
        rot_err, t_err = pose_errors(
            P.Pose(jnp.asarray(r.pose.q), jnp.asarray(r.pose.t)), gt
        )
        # LK flow on the low-res rendered texture carries sub-pixel noise
        # that accumulates along the chain; refinement below tightens it.
        assert rot_err < 2.5e-2, (r.frame, rot_err)
        assert t_err < 6e-2, (r.frame, t_err)

    # --- 3. Refine a perturbed trajectory over the same database --------
    traj = pc.CameraTrajectory(0, N_FRAMES)
    rng = np.random.default_rng(3)
    for i, p in enumerate(poses):
        t = np.asarray(p.t)
        if i not in (0, N_FRAMES - 1):
            t = t + rng.normal(0, 0.01, 3).astype(np.float32)
        state = pc.CameraState(
            core_intr,
            pc.Pose(np.asarray(p.q, np.float32), t.astype(np.float32)),
        )
        traj.set(i, state)

    pc.refine_trajectory(
        db_path, traj, np.eye(4, dtype=np.float32), accel.inner(),
        False, False, None,
    )
    for i in range(1, N_FRAMES - 1):
        s = traj.get(i)
        rot_err, t_err = pose_errors(
            P.Pose(jnp.asarray(s.pose.q), jnp.asarray(s.pose.t)), poses[i]
        )
        assert t_err < 8e-3, (i, t_err)
