"""Sequential frame-by-frame pose tracking.

TPU-native rebuild of the reference tracker (cpp/tracker.{h,cc}).  The
frame chain stays sequential (each frame's solve warm-starts from its
neighbor, cpp/tracker.cc:133-192), but everything inside a frame is
batched on device:

- all matches from all solved source frames are ray-cast **at once**
  (one batched Möller–Trumbore sweep instead of the reference's
  per-keypoint Embree query loop, cpp/tracker.cc:64-92);
- the PnP solve evaluates every correspondence in parallel and runs its
  whole LM iteration as a single XLA program (engine/pnp.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.database import Database
from ..obs import get_logger, profile_region
from . import camera as C
from . import pose as P
from .geometry import Mesh, SceneTransformations
from .levmarq import BundleOptions, BundleStats
from .pnp import PnPOptions, solve_pnp
from .raycast import raycast_grouped
from .trajectory import CameraTrajectory


class FrameTrackingResult(NamedTuple):
    """Per-frame tracking output (cpp/tracker.h:15-21)."""

    frame: int
    pose: P.Pose
    intrinsics: C.Intrinsics
    bundle_stats: BundleStats
    inlier_ratio: float


# TrackingCallback: FrameTrackingResult -> continue?
TrackingCallback = Callable[[FrameTrackingResult], bool]

# Max reprojection error for the inlier ratio (cpp/tracker.cc:123)
MAX_INLIER_ERROR = 12.0

_log = get_logger("tracker")


class TrackingError(RuntimeError):
    pass


# Host-side pose helpers live in engine.pose; keep these names for
# existing importers.
_np_quat_to_mat = P.quat_to_mat_np
pose_rt4x4_np = P.pose_rt4x4_np


def unproject_np(intrinsics: C.Intrinsics, pixels: np.ndarray) -> np.ndarray:
    """Host copy of camera.unproject (cpp/pnp/types.h:95-98)."""
    intr = jax.device_get(intrinsics)
    s = float(intr.sign)
    p = np.asarray(pixels, np.float64).reshape(-1, 2)
    return np.stack(
        [
            s * (p[:, 0] - float(intr.cx)) / float(intr.fx),
            s * (p[:, 1] - float(intr.cy)) / float(intr.fy),
            np.full(p.shape[0], s),
        ],
        axis=-1,
    )


def rays_object_space(
    model_matrix: np.ndarray,
    view_matrix: np.ndarray,
    intrinsics: C.Intrinsics,
    pixels: np.ndarray,
):
    """Batched pixel → object-space ray (cpp/ray_casting.h:53-63)."""
    mv = np.asarray(view_matrix, np.float64) @ np.asarray(
        model_matrix, np.float64
    )
    inv = np.linalg.inv(mv).astype(np.float32)
    dirs_cam = unproject_np(intrinsics, pixels).astype(np.float32)
    origins = np.broadcast_to(inv[:3, 3], dirs_cam.shape)
    dirs = dirs_cam @ inv[:3, :3].T
    return origins, dirs


def gather_correspondences(
    database: Database,
    camera_traj: CameraTrajectory,
    model_matrix: np.ndarray,
    frame_id: int,
    mesh: Mesh,
):
    """Collect 3D world ↔ 2D pixel matches for ``frame_id``.

    For every already-solved source frame with flow into ``frame_id``,
    ray-cast the source keypoints through the source camera onto the mesh
    (mask-aware) and pair the world-space hits with the flowed target
    pixels (cpp/tracker.cc:36-97).  Returns (X (N,3), x (N,2)).
    """
    model_matrix = np.asarray(model_matrix, np.float32)

    # Collect all source flows first, then do ONE grouped (shared-origin
    # per source frame) cast padded to bucket shapes — a cast per flow
    # would compile a fresh program for every distinct match count and
    # pay a device round trip each (cpp/tracker.cc:43-92 does this with
    # per-keypoint Embree queries instead).
    groups = []
    for flow_frame_id in database.find_optical_flows_to_image(frame_id):
        if flow_frame_id == frame_id:
            raise TrackingError("self-flow in database")
        if not camera_traj.is_frame_filled(flow_frame_id):
            continue
        keypoints = database.read_keypoints(flow_frame_id)
        flow = database.read_image_pair_flow(flow_frame_id, frame_id)
        if flow.src_kps_indices.size == 0:
            continue
        cam = camera_traj.get(flow_frame_id)
        src_px = keypoints[flow.src_kps_indices]
        view = pose_rt4x4_np(jax.device_get(cam.pose)).astype(np.float32)
        origins, dirs = rays_object_space(
            model_matrix, view, cam.intrinsics, src_px
        )
        groups.append((origins[0], dirs, flow.tgt_kps))

    if not groups:
        return np.empty((0, 3), np.float32), np.empty((0, 2), np.float32)

    from .pnp import bucket_size

    G = len(groups)
    # Pad the group axis to multiples of 8 so frames reuse compiled
    # shapes (a frame can receive up to 16 flows when both directions of
    # the +-{1,2,4,8} skip pattern are filled).
    Gp = -(-max(8, G) // 8) * 8
    K = bucket_size(max(d.shape[0] for _, d, _ in groups))
    origins_arr = np.zeros((Gp, 3), np.float32)
    dirs_arr = np.zeros((Gp, K, 3), np.float32)
    dirs_arr[..., 2] = 1.0  # padding rays: unit z, masked by count below
    counts = np.zeros(Gp, np.int32)
    for g, (o, d, _) in enumerate(groups):
        origins_arr[g] = o
        dirs_arr[g, : d.shape[0]] = d
        counts[g] = d.shape[0]

    hits = raycast_grouped(
        mesh, jnp.asarray(origins_arr), jnp.asarray(dirs_arr), True
    )
    valid_all, pos_all = jax.device_get((hits.valid, hits.pos))

    obj_pts, img_pts = [], []
    for g, (_, d, tgt_kps) in enumerate(groups):
        n = counts[g]
        valid = valid_all[g, :n]
        if not valid.any():
            continue
        pos_obj = pos_all[g, :n][valid]
        pos_world = pos_obj @ model_matrix[:3, :3].T + model_matrix[:3, 3]
        obj_pts.append(pos_world)
        img_pts.append(tgt_kps[valid])

    if not obj_pts:
        return np.empty((0, 3), np.float32), np.empty((0, 2), np.float32)
    return (
        np.concatenate(obj_pts).astype(np.float32),
        np.concatenate(img_pts).astype(np.float32),
    )


def solve_frame(
    database: Database,
    camera_traj: CameraTrajectory,
    model_matrix: np.ndarray,
    frame_id: int,
    mesh: Mesh,
    optimize_focal_length: bool,
    optimize_principal_point: bool,
    bundle_opts: BundleOptions,
):
    """Solve one frame's camera from flows into it (cpp/tracker.cc:36-131).

    Returns a PnPResult or None when fewer than 3 correspondences exist.
    """
    with profile_region("tracker.gather"):
        X, x = gather_correspondences(
            database, camera_traj, model_matrix, frame_id, mesh
        )
    if X.shape[0] < 3:
        _log.info(
            "frame %d: only %d correspondences, cannot solve",
            frame_id, X.shape[0],
        )
        return None
    _log.debug("frame %d: %d correspondences", frame_id, X.shape[0])

    # Warm start from current/prev/next pose (cpp/tracker.cc:112-119)
    cam0: Optional[C.CameraState] = None
    for fid in (frame_id, frame_id - 1, frame_id + 1):
        if camera_traj.is_frame_filled(fid):
            cam0 = camera_traj.get(fid)
            break
    if cam0 is None:
        raise TrackingError(f"no warm-start pose near frame {frame_id}")

    opts = PnPOptions(
        bundle_opts=bundle_opts,
        max_inlier_error=MAX_INLIER_ERROR,
        optimize_focal_length=optimize_focal_length,
        optimize_principal_point=optimize_principal_point,
    )
    with profile_region("tracker.pnp"):
        result = solve_pnp(X, x, cam0, opts)
    _log.debug(
        "frame %d: inlier_ratio=%.3f cost=%.3f iters=%d",
        frame_id, float(result.inlier_ratio), float(result.stats.cost),
        int(result.stats.iterations),
    )
    return result


def track_camera_trajectory(
    database: Database,
    camera_traj: CameraTrajectory,
    frame_from: int,
    frame_to_inclusive: int,
    model_matrix: np.ndarray,
    mesh: Mesh,
    callback: Optional[TrackingCallback] = None,
    optimize_focal_length: bool = False,
    optimize_principal_point: bool = False,
    bundle_opts: BundleOptions = BundleOptions(),
) -> None:
    """Chain solves frame by frame (cpp/tracker.cc:133-192).

    The callback may return False to stop; solved poses are written into
    ``camera_traj`` as they are produced.
    """
    first = min(frame_from, frame_to_inclusive)
    last = max(frame_from, frame_to_inclusive)
    direction = 1 if frame_from < frame_to_inclusive else -1

    if not camera_traj.is_valid_frame(first) or not camera_traj.is_valid_frame(
        last
    ):
        raise TrackingError("tracking range outside trajectory")
    if not camera_traj.is_frame_filled(frame_from):
        raise TrackingError("start frame has no pose")

    frame_id = frame_from + direction
    while frame_id != frame_to_inclusive + direction:
        result = solve_frame(
            database, camera_traj, model_matrix, frame_id, mesh,
            optimize_focal_length, optimize_principal_point, bundle_opts,
        )
        if result is None:
            raise TrackingError(
                f"Could not track to frame: {frame_id}. Not enough features."
            )

        if callback is not None:
            ok = callback(
                FrameTrackingResult(
                    frame=frame_id,
                    pose=result.camera.pose,
                    intrinsics=result.camera.intrinsics,
                    bundle_stats=result.stats,
                    inlier_ratio=float(result.inlier_ratio),
                )
            )
            if not ok:
                return

        camera_traj.set(frame_id, result.camera)
        frame_id += direction


def track_sequence(
    database_path: str,
    frame_from: int,
    frame_to_inclusive: int,
    scene_transform: SceneTransformations,
    mesh: Mesh,
    callback: Optional[TrackingCallback] = None,
    optimize_focal_length: bool = False,
    optimize_principal_point: bool = False,
    bundle_opts: BundleOptions = BundleOptions(),
) -> None:
    """Seed a trajectory from the scene transform and track
    (cpp/tracker.cc:194-213)."""
    db = Database(database_path)
    try:
        num_frames = abs(frame_to_inclusive - frame_from) + 1
        traj = CameraTrajectory(
            min(frame_from, frame_to_inclusive), num_frames
        )
        traj.set(
            frame_from,
            C.CameraState(
                scene_transform.intrinsics,
                P.pose_from_rt(jnp.asarray(scene_transform.view_matrix)),
            ),
        )
        track_camera_trajectory(
            db, traj, frame_from, frame_to_inclusive,
            np.asarray(scene_transform.model_matrix), mesh, callback,
            optimize_focal_length, optimize_principal_point, bundle_opts,
        )
    finally:
        db.close()
