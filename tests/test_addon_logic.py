"""bpy-free tests of the addon's pure logic: camera intrinsics
conversion (utils.py) and tracking/refine segment computation."""

import sys
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest

import fake_mathutils as mu


BPY_MODULES = [
    "bpy", "bpy.types", "bpy.props", "bpy.utils", "bpy.path",
    "gpu", "gpu.types", "gpu.state", "gpu.shader",
    "gpu_extras", "gpu_extras.batch",
]


@pytest.fixture
def addon():
    saved = {
        name: sys.modules.get(name) for name in BPY_MODULES + ["mathutils"]
    }
    bpy = mock.MagicMock(name="bpy")
    bpy.types.PropertyGroup = type("PG", (), {})
    bpy.types.Operator = type("Op", (), {})
    for name in BPY_MODULES:
        sys.modules[name] = (
            bpy if name.startswith("bpy") else mock.MagicMock(name=name)
        )
    sys.modules["mathutils"] = mu

    import polychase_tpu.blender_addon.keyframes as keyframes
    import polychase_tpu.blender_addon.operators.refiner as refiner_op
    import polychase_tpu.blender_addon.operators.tracking as tracking_op
    import polychase_tpu.blender_addon.utils as utils

    yield SimpleNamespace(
        utils=utils, keyframes=keyframes,
        tracking=tracking_op, refiner=refiner_op,
    )

    for name, modv in saved.items():
        if modv is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = modv
    for m in list(sys.modules):
        if m.startswith("polychase_tpu.blender_addon"):
            sys.modules.pop(m, None)


# -- camera intrinsics conversion (reference utils.py:50-122) ---------------


def test_camera_params_horizontal_fit(addon):
    fx, fy, cx, cy = addon.utils.calc_camera_params_expanded(
        lens=35.0, shift_x=0.1, shift_y=-0.05,
        sensor_width=36.0, sensor_height=24.0, sensor_fit="HORIZONTAL",
        width=1920, height=1080,
    )
    assert fx == pytest.approx(35.0 * 1920 / 36.0)
    assert fy == pytest.approx(fx)
    assert cx == pytest.approx(0.1 * 1920 - 960)
    assert cy == pytest.approx(-0.05 * 1920 - 540)


def test_camera_params_vertical_fit(addon):
    fx, fy, cx, cy = addon.utils.calc_camera_params_expanded(
        lens=50.0, shift_x=0.0, shift_y=0.0,
        sensor_width=36.0, sensor_height=24.0, sensor_fit="VERTICAL",
        width=1920, height=1080,
    )
    assert fx == pytest.approx(50.0 * 1080 / 24.0)
    assert cx == pytest.approx(-960)


def test_camera_params_auto_fit_matches_horizontal_for_landscape(addon):
    a = addon.utils.calc_camera_params_expanded(
        35.0, 0.0, 0.0, 36.0, 24.0, "AUTO", 1920, 1080,
    )
    h = addon.utils.calc_camera_params_expanded(
        35.0, 0.0, 0.0, 36.0, 24.0, "HORIZONTAL", 1920, 1080,
    )
    assert a == h


def test_camera_params_round_trip(addon):
    """set_camera_params inverts calc_camera_params (fx == fy)."""
    data = SimpleNamespace(
        lens=35.0, shift_x=0.07, shift_y=-0.03,
        sensor_width=36.0, sensor_height=24.0, sensor_fit="AUTO",
        clip_start=0.1, clip_end=100.0,
    )
    cam = SimpleNamespace(data=data)
    fx, fy, cx, cy = addon.utils.calc_camera_params(cam, 1280, 720)
    data.lens = 1.0
    data.shift_x = data.shift_y = 0.0
    addon.utils.set_camera_params(cam, 1280, 720, fx, fy, cx, cy)
    assert data.lens == pytest.approx(35.0)
    assert data.shift_x == pytest.approx(0.07)
    assert data.shift_y == pytest.approx(-0.03)

    with pytest.raises(ValueError):
        addon.utils.set_camera_params(cam, 1280, 720, fx, fx * 1.5, cx, cy)


# -- segment computation (reference tracking.py:396-415, refiner.py:58-136) -


def _fake_fcurves(frames_types):
    kps = [
        SimpleNamespace(co=(float(f), 0.0), type=t) for f, t in frames_types
    ]
    return [SimpleNamespace(keyframe_points=kps)]


def _fake_tracker(frames_types, clip_start=1, duration=100):
    return SimpleNamespace(
        clip=SimpleNamespace(frame_start=clip_start, frame_duration=duration),
        _fcurves=_fake_fcurves(frames_types),
    )


@pytest.fixture
def patched_fcurves(addon, monkeypatch):
    monkeypatch.setattr(
        addon.keyframes, "tracker_fcurves",
        lambda tracker, include_lens=False: tracker._fcurves,
    )
    return addon


def test_compute_segment_end_forward_backward(patched_fcurves):
    addon = patched_fcurves
    tracker = _fake_tracker([(10, "KEYFRAME"), (40, "KEYFRAME"),
                             (25, "GENERATED")])
    f = addon.tracking.compute_segment_end
    # forward: next user keyframe, skipping GENERATED
    assert f(tracker, 12, backward=False, single_frame=False) == 40
    # backward: previous user keyframe
    assert f(tracker, 30, backward=True, single_frame=False) == 10
    # no keyframe in that direction -> clip edge
    assert f(tracker, 50, backward=False, single_frame=False) == 100
    assert f(tracker, 5, backward=True, single_frame=False) == 1
    # single frame
    assert f(tracker, 12, backward=False, single_frame=True) == 13
    assert f(tracker, 12, backward=True, single_frame=True) == 11


def test_compute_segments_all(patched_fcurves):
    addon = patched_fcurves
    tracker = _fake_tracker(
        [(10, "KEYFRAME"), (20, "KEYFRAME"), (21, "KEYFRAME"),
         (50, "KEYFRAME"), (30, "GENERATED")]
    )
    segs = addon.refiner.compute_segments(tracker, 15, all_segments=True)
    # (20, 21) dropped: no frames strictly between
    assert segs == [(10, 20), (21, 50)]


def test_compute_segments_current_only(patched_fcurves):
    addon = patched_fcurves
    tracker = _fake_tracker(
        [(10, "KEYFRAME"), (20, "KEYFRAME"), (50, "KEYFRAME")]
    )
    segs = addon.refiner.compute_segments(tracker, 15, all_segments=False)
    assert segs == [(10, 20)]
    # current frame ON a user keyframe: both adjacent segments
    segs = addon.refiner.compute_segments(tracker, 20, all_segments=False)
    assert segs == [(10, 20), (20, 50)]


def test_compute_segments_needs_two_user_keyframes(patched_fcurves):
    addon = patched_fcurves
    tracker = _fake_tracker([(10, "KEYFRAME"), (30, "GENERATED")])
    assert addon.refiner.compute_segments(tracker, 15, True) == []


# -- keyframe layer (reference keyframes.py:322-336, typed KEYFRAME vs
#    GENERATED; query + clear helpers) --------------------------------------


class _KPList(list):
    def remove(self, kp, fast=False):
        list.remove(self, kp)


def _fc(frames_types):
    kps = _KPList(
        SimpleNamespace(co=(float(f), 0.0), type=t) for f, t in frames_types
    )
    return SimpleNamespace(keyframe_points=kps, update=lambda: None)


def test_keyframe_queries(addon):
    kf = addon.keyframes
    fcurves = [_fc([(1, kf.USER_KEYFRAME), (5, kf.GENERATED_KEYFRAME),
                    (9, kf.USER_KEYFRAME), (12, kf.GENERATED_KEYFRAME)])]
    assert kf.keyframes_of_type(fcurves) == {1, 5, 9, 12}
    assert kf.keyframes_of_type(fcurves, kf.USER_KEYFRAME) == {1, 9}
    assert kf.find_prev_keyframe(fcurves, 9, kf.USER_KEYFRAME) == 1
    assert kf.find_next_keyframe(fcurves, 5, kf.USER_KEYFRAME) == 9
    assert kf.find_next_keyframe(fcurves, 12) is None
    assert kf.find_last_keyframe(fcurves) == 12
    assert kf.find_last_keyframe(fcurves, kf.USER_KEYFRAME) == 9
    assert kf.has_keyframe_at(fcurves, 5)
    assert not kf.has_keyframe_at(fcurves, 5, kf.USER_KEYFRAME)


def test_keyframe_clearing(addon):
    kf = addon.keyframes

    def build():
        return [
            _fc([(1, kf.USER_KEYFRAME), (2, kf.GENERATED_KEYFRAME),
                 (3, kf.GENERATED_KEYFRAME), (4, kf.USER_KEYFRAME),
                 (6, kf.GENERATED_KEYFRAME)]),
            _fc([(2, kf.GENERATED_KEYFRAME), (4, kf.USER_KEYFRAME)]),
        ]

    fcurves = build()
    n = kf.clear_generated_in_range(fcurves, 2, 3)
    assert n == 3  # frames 2,3 in fc0 and frame 2 in fc1
    assert kf.keyframes_of_type(fcurves) == {1, 4, 6}

    fcurves = build()
    n = kf.clear_all_generated(fcurves)
    assert n == 4
    assert kf.keyframes_of_type(fcurves) == {1, 4}
    # user keyframes are never touched
    assert kf.keyframes_of_type(fcurves, kf.USER_KEYFRAME) == {1, 4}
