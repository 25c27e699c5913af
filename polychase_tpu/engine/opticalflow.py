"""Optical-flow database generation (the "Analyze Video" pipeline).

TPU-native rebuild of the reference pipeline (cpp/opticalflow.cc:209-321):
for every frame, detect-or-load keypoints, build an LK pyramid, and track
into the neighbor frames of the ±{1, 2, 4, 8} skip pattern
(cpp/opticalflow.cc:76-78), writing each pair's surviving flows to the
SQLite database.  Differences from the reference, by design:

- the per-skip-pair TBB thread pool (cpp/opticalflow.cc:269-309) is
  replaced by the device itself: each LK solve already batches every
  feature, so pairs are dispatched back-to-back to the accelerator;
- decoded frames are cached as *prepared pyramids* (padded levels +
  Scharr derivatives, the expensive part) in an LRU keyed by frame id —
  the analogue of the reference's 17-frame ring buffer
  (cpp/opticalflow_thread.h:34-79);
- the pipeline is resumable exactly like the reference: existing
  keypoints are reused and existing pair flows skipped
  (cpp/opticalflow.cc:168-178, :286).

The progress callback returns False to cancel (cpp/opticalflow.cc:238-247).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, NamedTuple, Optional

import numpy as np

from ..io.database import Database
from .gftt import GFTTOptions, good_features_to_track
from .lk import (
    LKOptions,
    PyramidCache,
    calc_optical_flow,
    calc_optical_flow_multi,
    prepare_pyramid,
)

# Skip pattern (cpp/opticalflow.cc:76-78)
IMAGE_SKIPS = (-8, -4, -2, -1, 1, 2, 4, 8)

# FrameAccessorFunction: frame_id -> (H, W, 3) uint8 RGB or None
FrameAccessor = Callable[[int], Optional[np.ndarray]]
# OpticalFlowProgressCallback: (progress, message) -> continue?
ProgressCallback = Callable[[float, str], bool]

OpticalFlowOptions = LKOptions  # same fields (cpp/opticalflow.h:27-33)


class VideoInfo(NamedTuple):
    """Clip geometry (cpp/opticalflow.h:20-25)."""

    width: int
    height: int
    first_frame: int
    num_frames: int


def rgb_to_gray(frame: np.ndarray) -> np.ndarray:
    """RGB→gray with OpenCV's fixed-point BT.601 weights
    (cv::COLOR_RGB2GRAY; used at cpp/opticalflow.cc:259)."""
    f = frame.astype(np.uint32)
    y = (f[..., 0] * 4899 + f[..., 1] * 9617 + f[..., 2] * 1868 + 8192) >> 14
    return y.astype(np.uint8)


class _PyramidLRU:
    """LRU of prepared pyramids, the 17-slot ring-buffer analogue."""

    def __init__(self, capacity: int = 17):
        self.capacity = capacity
        self._store: OrderedDict[int, PyramidCache] = OrderedDict()

    def get(self, frame_id: int) -> Optional[PyramidCache]:
        pyr = self._store.get(frame_id)
        if pyr is not None:
            self._store.move_to_end(frame_id)
        return pyr

    def put(self, frame_id: int, pyr: PyramidCache) -> None:
        self._store[frame_id] = pyr
        self._store.move_to_end(frame_id)
        while len(self._store) > self.capacity:
            self._store.popitem(last=False)


class FrameNotProvidedError(RuntimeError):
    pass


def generate_optical_flow_database(
    video_info: VideoInfo,
    frame_accessor: FrameAccessor,
    callback: Optional[ProgressCallback],
    database_path: str,
    detector_options: GFTTOptions = GFTTOptions(),
    flow_options: OpticalFlowOptions = OpticalFlowOptions(),
    write_images: bool = False,
) -> None:
    """Generate keypoints + pairwise flows for a clip
    (cpp/opticalflow.cc:209-321).

    ``write_images`` dumps debug PNGs next to the database like the
    reference (cpp/opticalflow.cc:80-96) when a ``frames`` directory is
    writable; it is best-effort.
    """
    if frame_accessor is None:
        raise ValueError("frame_accessor is required")

    db = Database(database_path)
    try:
        _run(
            db, video_info, frame_accessor, callback,
            detector_options, flow_options, write_images, database_path,
        )
    finally:
        db.close()


def _get_gray(
    frame_accessor: FrameAccessor, video_info: VideoInfo, frame_id: int
) -> np.ndarray:
    frame = frame_accessor(frame_id)
    if frame is None:
        raise FrameNotProvidedError(
            f"Requested frame #{frame_id} was not provided"
        )
    frame = np.asarray(frame)
    if frame.ndim == 3 and frame.shape[2] == 3:
        if (
            frame.shape[0] != video_info.height
            or frame.shape[1] != video_info.width
        ):
            raise ValueError(
                f"frame #{frame_id} has shape {frame.shape[:2]}, expected "
                f"({video_info.height}, {video_info.width})"
            )
        return rgb_to_gray(frame)
    if frame.ndim == 2:
        return frame.astype(np.uint8, copy=False)
    raise ValueError("frames must be (H, W, 3) RGB or (H, W) gray")


def _run(
    db: Database,
    video_info: VideoInfo,
    frame_accessor: FrameAccessor,
    callback: Optional[ProgressCallback],
    detector_options: GFTTOptions,
    flow_options: OpticalFlowOptions,
    write_images: bool,
    database_path: str,
) -> None:
    first = video_info.first_frame
    last = video_info.first_frame + video_info.num_frames  # exclusive
    cache = _PyramidLRU()

    frames_dir = None
    if write_images:
        import os

        frames_dir = os.path.join(
            os.path.dirname(os.path.abspath(database_path)), "frames"
        )
        os.makedirs(frames_dir, exist_ok=True)

    def get_pyramid(frame_id: int, gray: Optional[np.ndarray] = None):
        pyr = cache.get(frame_id)
        if pyr is None:
            if gray is None:
                gray = _get_gray(frame_accessor, video_info, frame_id)
            pyr = prepare_pyramid(gray, flow_options)
            cache.put(frame_id, pyr)
        return pyr

    for frame_id1 in range(first, last):
        if callback is not None:
            progress = (frame_id1 - first) / max(video_info.num_frames, 1)
            if not callback(progress, f"Processing frame {frame_id1}"):
                callback(1.0, "Cancelled")
                return

        gray1 = _get_gray(frame_accessor, video_info, frame_id1)

        # Read-or-generate keypoints (cpp/opticalflow.cc:154-178)
        features = db.read_keypoints(frame_id1)
        if features.shape[0] == 0:
            features, _quality = good_features_to_track(
                gray1, None, detector_options
            )
            db.write_keypoints(frame_id1, features)

        if write_images and frames_dir is not None:
            _save_debug_image(gray1, frame_id1, frames_dir, features)

        if features.shape[0] == 0:
            continue

        pyr1 = get_pyramid(frame_id1, gray1)

        # Batch every needed skip target into one device dispatch
        # (the reference's 4-thread pair pool, cpp/opticalflow.cc:269-309,
        # becomes a batch axis).
        targets = []
        for skip in IMAGE_SKIPS:
            frame_id2 = frame_id1 + skip
            if frame_id2 < first or frame_id2 >= last:
                continue
            if db.image_pair_flow_exists(frame_id1, frame_id2):
                continue
            targets.append(frame_id2)

        if not targets:
            continue
        pyrs2 = [get_pyramid(f2) for f2 in targets]
        tracked, status, err = calc_optical_flow_multi(
            pyr1, pyrs2, features, flow_options
        )
        for i, frame_id2 in enumerate(targets):
            st = status[i]
            keep = np.nonzero(st)[0].astype(np.uint32)
            db.write_image_pair_flow(
                frame_id1, frame_id2, keep, tracked[i][st], err[i][st]
            )

    if callback is not None:
        callback(1.0, "Done")


def _save_debug_image(gray, frame_id, frames_dir, features):
    """Best-effort debug dump (cpp/opticalflow.cc:80-96)."""
    try:
        import cv2

        cv2.imwrite(f"{frames_dir}/{frame_id:06d}.png", gray)
        vis = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
        for x, y in features.astype(int):
            cv2.drawMarker(vis, (int(x), int(y)), (0, 255, 0),
                           cv2.MARKER_CROSS, 10)
        cv2.imwrite(f"{frames_dir}/keypoints_{frame_id:06d}.png", vis)
    except Exception:
        pass
