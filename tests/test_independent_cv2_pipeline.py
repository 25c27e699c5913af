"""End-to-end tracking parity vs a FULLY independent OpenCV pipeline.

The independent side shares no solver code with this framework: OpenCV
``goodFeaturesToTrack`` + ``calcOpticalFlowPyrLK`` + ``solvePnP``
(ITERATIVE) chained frame-to-frame over the same rendered clip, with 3D
lookups through the native BVH.  Both pipelines must recover the
ground-truth orbit to comparable accuracy — the independence complement
to tests/test_baseline_parity.py's same-input 1% RMSE checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polychase_tpu.polychase_core as pc
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.tracker import pose_rt4x4_np, unproject_np
from polychase_tpu.native import BvhRaycaster, available

from synthetic import make_sphere_mesh, orbit_pose
from test_e2e_images import (
    FOCAL, H, N_FRAMES, W, _intr, _noise_fn, _render,
)
from test_tracker import pose_errors

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not available(), reason="native BVH unavailable"
)


@pytest.fixture(scope="module")
def rendered():
    rng = np.random.default_rng(11)
    mesh = make_sphere_mesh()
    intr = _intr()
    poses = jax.device_get(
        [orbit_pose(0.035 * i) for i in range(N_FRAMES)]
    )
    tex = _noise_fn(rng)
    frames = [_render(mesh, intr, p, tex) for p in poses]
    return mesh, intr, poses, frames


def _cv2_track(mesh, intr, poses, frames):
    """The reference algorithm in pure OpenCV: detect → LK → raycast →
    solvePnP, chained forward from the ground-truth first pose."""
    bvh = BvhRaycaster(
        np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    )
    K = np.array(
        [[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]], np.float64
    )
    out = {0: (np.asarray(poses[0].q, np.float64),
               np.asarray(poses[0].t, np.float64))}
    for j in range(1, N_FRAMES):
        q_prev, t_prev = out[j - 1]
        kps = cv2.goodFeaturesToTrack(
            frames[j - 1], maxCorners=0, qualityLevel=0.01,
            minDistance=5.0, blockSize=3,
        ).reshape(-1, 2).astype(np.float32)
        nxt, st, _err = cv2.calcOpticalFlowPyrLK(
            frames[j - 1], frames[j], kps.reshape(-1, 1, 2), None,
            winSize=(10, 10), maxLevel=3,
            criteria=(
                cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01
            ),
        )
        tracked = st.reshape(-1) == 1
        # 3D points: rays through the previous solved pose
        from polychase_tpu.engine.pnp_host import _rotmat

        R = _rotmat(q_prev)
        d_cam = unproject_np(_intr(), kps)
        d_world = d_cam @ R
        origin = -(R.T @ t_prev)
        pos, _n, _b, _t, prim = bvh.raycast(
            np.broadcast_to(origin, d_world.shape).astype(np.float32),
            d_world.astype(np.float32),
        )
        hit = (prim != np.uint32(0xFFFFFFFF)) & tracked
        X = pos[hit].astype(np.float64)
        x = nxt.reshape(-1, 2)[hit].astype(np.float64)
        assert X.shape[0] > 30

        rvec0, _ = cv2.Rodrigues(R)
        tvec0 = t_prev.reshape(3, 1).copy()
        ok, rvec, tvec = cv2.solvePnP(
            X, x, K, None, rvec0, tvec0, useExtrinsicGuess=True,
            flags=cv2.SOLVEPNP_ITERATIVE,
        )
        assert ok
        Rj, _ = cv2.Rodrigues(rvec)
        out[j] = (P.mat_to_quat_np(Rj), tvec.reshape(3))
    return out


def test_ours_matches_independent_cv2(rendered, tmp_path):
    mesh, intr, poses, frames = rendered

    # Ours: full public pipeline (analyze → track)
    db_path = str(tmp_path / "flow.db")
    info = pc.VideoInfo(width=W, height=H, first_frame=0,
                        num_frames=N_FRAMES)
    pc.generate_optical_flow_database(
        info, lambda fid: frames[fid], None, db_path
    )
    core_intr = pc.CameraIntrinsics(
        FOCAL, FOCAL, W / 2, H / 2, 1.0, W, H,
        pc.CameraConvention.OpenCV,
    )
    st = pc.SceneTransformations(
        model_matrix=np.eye(4, dtype=np.float32),
        view_matrix=pose_rt4x4_np(poses[0]).astype(np.float32),
        intrinsics=core_intr,
    )
    accel = pc.AcceleratedMesh(
        np.asarray(mesh.vertices), np.asarray(mesh.triangles)
    )
    ours = {}
    pc.track_sequence(
        db_path, 0, N_FRAMES - 1, st, accel,
        lambda r: ours.__setitem__(r.frame, r) or True,
    )

    theirs = _cv2_track(mesh, intr, poses, frames)

    ours_err, cv2_err = [], []
    for f in range(1, N_FRAMES):
        r = ours[f]
        _, te_ours = pose_errors(
            P.Pose(jnp.asarray(r.pose.q), jnp.asarray(r.pose.t)), poses[f]
        )
        q_c, t_c = theirs[f]
        _, te_cv2 = pose_errors(
            P.Pose(jnp.asarray(q_c.astype(np.float32)),
                   jnp.asarray(t_c.astype(np.float32))),
            poses[f],
        )
        ours_err.append(te_ours)
        cv2_err.append(te_cv2)

    ours_rms = float(np.sqrt(np.mean(np.square(ours_err))))
    cv2_rms = float(np.sqrt(np.mean(np.square(cv2_err))))
    # Both pipelines recover the orbit; ours must be at least as
    # accurate as the independent OpenCV chain (same clip, same seeds).
    assert cv2_rms < 0.08, cv2_rms
    assert ours_rms < 0.08, ours_rms
    assert ours_rms < 1.5 * cv2_rms, (ours_rms, cv2_rms)
