"""Scale-folding parity tests, bpy-free (reference tracking.py:195-220).

Drives the actual addon code (core.fold_scale, apply_tracking_result)
with a numpy mathutils stand-in and a non-unit-scale object, verifying:

- the factorization identity view @ model == mv_no_scale @ diag(scale);
- write-back recomposes the correct rigid transform and PRESERVES the
  object's scale for both tracking targets.
"""

import importlib
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
def addon(monkeypatch):
    saved = {
        name: sys.modules.get(name) for name in BPY_MODULES + ["mathutils"]
    }
    bpy = mock.MagicMock(name="bpy")

    class FakePropertyGroup:
        pass

    class FakeOperator:
        pass

    bpy.types.PropertyGroup = FakePropertyGroup
    bpy.types.Operator = FakeOperator
    for name in BPY_MODULES:
        sys.modules[name] = bpy if name == "bpy" else mock.MagicMock(name=name)
    sys.modules["bpy"] = bpy
    sys.modules["mathutils"] = mu

    mods = [
        "polychase_tpu.blender_addon.utils",
        "polychase_tpu.blender_addon.core",
        "polychase_tpu.blender_addon.keyframes",
        "polychase_tpu.blender_addon.operators.tracking",
    ]
    for m in mods:
        if m in sys.modules:
            importlib.reload(sys.modules[m])
    import polychase_tpu.blender_addon.core as core
    import polychase_tpu.blender_addon.operators.tracking as tracking
    import polychase_tpu.blender_addon.utils as utils

    yield SimpleNamespace(core=core, tracking=tracking, utils=utils)

    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
    # Addon modules were imported against the stubs; evict them so later
    # tests re-import fresh under their own stubs.
    for m in list(sys.modules):
        if m.startswith("polychase_tpu.blender_addon"):
            sys.modules.pop(m, None)


def _make_model(scale=(2.0, 0.5, 3.0)):
    rot = mu.Quaternion((0.9, 0.1, -0.2, 0.3))
    return mu.Matrix.LocRotScale(
        mu.Vector((1.0, -2.0, 0.5)), rot, mu.Vector(scale)
    )


def _make_view():
    rot = mu.Quaternion((0.8, -0.3, 0.1, 0.2))
    return mu.Matrix.LocRotScale(mu.Vector((0.2, 0.4, -5.0)), rot, None)


def test_fold_scale_factorization(addon):
    model = _make_model()
    view = _make_view()
    scale_m, mv_no_scale = addon.core.fold_scale(model, view)

    # model matrix passed to the core is pure scale
    s = np.asarray(scale_m)
    assert np.allclose(s, np.diag(np.diag(s)))
    assert np.allclose(np.diag(s)[:3], [2.0, 0.5, 3.0])

    # mv_no_scale is rigid
    r = np.asarray(mv_no_scale)[:3, :3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-9)

    # the factorization reproduces the full modelview exactly
    lhs = np.asarray(view) @ np.asarray(model)
    rhs = np.asarray(mv_no_scale) @ s
    assert np.allclose(lhs, rhs, atol=1e-9)


class _FakeObject:
    """Just enough of bpy.types.Object for the matrix utils."""

    def __init__(self, matrix):
        self.matrix_world = matrix
        self.scale = matrix.to_scale()
        self.rotation_mode = "QUATERNION"


def _fake_tracker(target, model, cam_world):
    geometry = _FakeObject(model)
    camera = _FakeObject(cam_world)
    return SimpleNamespace(
        geometry=geometry,
        camera=camera,
        tracking_target=target,
        optimize_focal_length=False,
        optimize_principal_point=False,
    )


def _solved_pose(mv_no_scale):
    loc, rot, _ = mv_no_scale.decompose()
    return SimpleNamespace(
        q=np.array([rot.w, rot.x, rot.y, rot.z], np.float32),
        t=np.array(list(loc), np.float32),
    )


def test_apply_tracking_result_geometry_preserves_scale(addon, monkeypatch):
    monkeypatch.setattr(
        addon.tracking.keyframes, "insert_keyframe", lambda *a, **k: None
    )
    model = _make_model()
    cam_world = _make_view().inverted()
    tracker = _fake_tracker("GEOMETRY", model, cam_world)

    # Ground truth: the solver moved the scale-free modelview
    view = addon.utils.get_camera_view_matrix(tracker.camera)
    _, mv0 = addon.core.fold_scale(model, view)
    delta = mu.Matrix.LocRotScale(
        mu.Vector((0.1, -0.05, 0.2)), mu.Quaternion((0.99, 0.1, 0.0, 0.05)),
        None,
    )
    mv_new = delta @ mv0

    result = SimpleNamespace(pose=_solved_pose(mv_new), frame=7)
    addon.tracking.apply_tracking_result(tracker, result)

    # object scale preserved exactly
    new_model = tracker.geometry.matrix_world
    assert np.allclose(
        list(new_model.to_scale()), [2.0, 0.5, 3.0], atol=1e-6
    )
    # and view @ new_model has the solved rigid part
    scale_m, mv_back = addon.core.fold_scale(new_model, view)
    assert np.allclose(
        np.asarray(mv_back), np.asarray(mv_new), atol=1e-5
    )


def test_apply_tracking_result_camera_target(addon, monkeypatch):
    monkeypatch.setattr(
        addon.tracking.keyframes, "insert_keyframe", lambda *a, **k: None
    )
    model = _make_model()
    cam_world = _make_view().inverted()
    tracker = _fake_tracker("CAMERA", model, cam_world)

    view = addon.utils.get_camera_view_matrix(tracker.camera)
    _, mv0 = addon.core.fold_scale(model, view)
    delta = mu.Matrix.LocRotScale(
        mu.Vector((-0.2, 0.1, 0.05)), mu.Quaternion((0.98, 0.0, 0.15, -0.1)),
        None,
    )
    mv_new = delta @ mv0

    result = SimpleNamespace(pose=_solved_pose(mv_new), frame=3)
    addon.tracking.apply_tracking_result(tracker, result)

    # geometry untouched
    assert np.allclose(
        np.asarray(tracker.geometry.matrix_world), np.asarray(model)
    )
    # new camera view recomposes the solved modelview
    view_new = addon.utils.get_camera_view_matrix(tracker.camera)
    _, mv_back = addon.core.fold_scale(model, view_new)
    assert np.allclose(
        np.asarray(mv_back), np.asarray(mv_new), atol=1e-5
    )
