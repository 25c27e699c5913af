"""Per-frame camera trajectory (cpp/camera_trajectory.h:14-91).

A dense host-side array of ``Optional[CameraState]`` with a first-frame
offset.  Kept as plain Python — trajectory bookkeeping is inherently
sequential control flow; the math lives on device.
"""

from __future__ import annotations

from typing import List, Optional

from .camera import CameraState


class CameraTrajectory:
    """Dense per-frame camera states (cpp/camera_trajectory.h:14-91)."""

    def __init__(self, first_frame_id: int = 0, count: int = 0):
        self.first_frame_id = int(first_frame_id)
        self.states: List[Optional[CameraState]] = [None] * int(count)

    # -- frame id helpers ---------------------------------------------------

    def index(self, frame_id: int) -> int:
        return int(frame_id) - self.first_frame_id

    def is_valid_frame(self, frame_id: int) -> bool:
        return 0 <= self.index(frame_id) < len(self.states)

    def is_frame_filled(self, frame_id: int) -> bool:
        return (
            self.is_valid_frame(frame_id)
            and self.states[self.index(frame_id)] is not None
        )

    # -- access -------------------------------------------------------------

    def get(self, frame_id: int) -> Optional[CameraState]:
        idx = self.index(frame_id)
        if not 0 <= idx < len(self.states):
            raise IndexError(f"frame {frame_id} outside trajectory")
        return self.states[idx]

    def set(self, frame_id: int, state: CameraState) -> None:
        idx = self.index(frame_id)
        if not 0 <= idx < len(self.states):
            raise IndexError(f"frame {frame_id} outside trajectory")
        self.states[idx] = state

    def clear(self, frame_id: int) -> None:
        idx = self.index(frame_id)
        if not 0 <= idx < len(self.states):
            raise IndexError(f"frame {frame_id} outside trajectory")
        self.states[idx] = None

    # -- extents ------------------------------------------------------------

    @property
    def count(self) -> int:
        return len(self.states)

    @property
    def first_frame(self) -> int:
        return self.first_frame_id

    @property
    def last_frame(self) -> int:
        return self.first_frame_id + len(self.states) - 1
