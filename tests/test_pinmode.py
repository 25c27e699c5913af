"""Pin-mode solver tests: 1-pin, 2-pin and n-pin drag behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.geometry import (
    SceneTransformations,
    TRANSFORM_CAMERA,
    TRANSFORM_MODEL,
)
from polychase_tpu.engine.pinmode import PinUpdate, find_transformation

from synthetic import make_intrinsics, orbit_pose


def project_obj(scene: SceneTransformations, pts_obj):
    mv = np.asarray(scene.view_matrix, np.float64) @ np.asarray(
        scene.model_matrix, np.float64
    )
    Xc = pts_obj @ mv[:3, :3].T + mv[:3, 3]
    K = np.asarray(C.proj_matrix_3x3(scene.intrinsics), np.float64)
    p = Xc @ K.T
    return (p[:, :2] / p[:, 2:3]).astype(np.float32)


@pytest.fixture
def scene():
    intr = make_intrinsics()
    return SceneTransformations(
        model_matrix=jnp.eye(4),
        view_matrix=P.pose_rt4x4(orbit_pose(0.0)),
        intrinsics=intr,
    )


def test_one_pin_translates_to_cursor(scene):
    obj = np.array([[0.1, -0.2, 0.3]], np.float32)
    target_px = np.array([400.0, 300.0], np.float32)
    out = find_transformation(
        obj, scene, scene, PinUpdate(0, target_px), TRANSFORM_MODEL
    )
    # The moved point must now project at the cursor
    px = project_obj(out, obj)
    np.testing.assert_allclose(px[0], target_px, atol=0.1)
    # Depth from camera preserved
    center = np.asarray(P.pose_center(orbit_pose(0.0)))
    model0 = np.asarray(scene.model_matrix, np.float64)
    model1 = np.asarray(out.model_matrix, np.float64)
    p0 = model0[:3, :3] @ obj[0] + model0[:3, 3]
    p1 = model1[:3, :3] @ obj[0] + model1[:3, 3]
    np.testing.assert_allclose(
        np.linalg.norm(p0 - center), np.linalg.norm(p1 - center), rtol=1e-5
    )
    # Camera variant leaves the model matrix untouched
    out_cam = find_transformation(
        obj, scene, scene, PinUpdate(0, target_px), TRANSFORM_CAMERA
    )
    np.testing.assert_array_equal(
        np.asarray(out_cam.model_matrix), np.asarray(scene.model_matrix)
    )
    px_cam = project_obj(out_cam, obj)
    np.testing.assert_allclose(px_cam[0], target_px, atol=0.1)


def test_two_pin_rotation_keeps_anchor(scene):
    obj = np.array([[0.4, 0.0, 0.0], [-0.4, 0.0, 0.0]], np.float32)
    px0 = project_obj(scene, obj)
    target = px0[0] + np.array([25.0, -12.0], np.float32)
    out = find_transformation(
        obj, scene, scene, PinUpdate(0, target), TRANSFORM_MODEL
    )
    px1 = project_obj(out, obj)
    # Anchor pin (index 1) stays fixed, dragged pin reaches the target
    np.testing.assert_allclose(px1[1], px0[1], atol=0.5)
    np.testing.assert_allclose(px1[0], target, atol=1.0)


def test_n_pin_pnp_drag(scene):
    obj = np.array(
        [
            [0.3, 0.3, 0.0],
            [-0.3, 0.3, 0.1],
            [-0.3, -0.3, 0.0],
            [0.3, -0.3, -0.1],
            [0.0, 0.0, 0.2],
        ],
        np.float32,
    )
    px0 = project_obj(scene, obj)
    target = px0[2] + np.array([10.0, 6.0], np.float32)
    out = find_transformation(
        obj, scene, scene, PinUpdate(2, target), TRANSFORM_MODEL
    )
    px1 = project_obj(out, obj)
    # Dragged pin moves towards target; others move only slightly
    assert np.linalg.norm(px1[2] - target) < np.linalg.norm(px0[2] - target)
    for i in (0, 1, 3, 4):
        assert np.linalg.norm(px1[i] - px0[i]) < 8.0

    # Camera mode: model untouched, view changes
    out_cam = find_transformation(
        obj, scene, scene, PinUpdate(2, target), TRANSFORM_CAMERA
    )
    np.testing.assert_array_equal(
        np.asarray(out_cam.model_matrix), np.asarray(scene.model_matrix)
    )
    assert not np.allclose(
        np.asarray(out_cam.view_matrix), np.asarray(scene.view_matrix)
    )


def test_n_pin_exact_recovery(scene):
    """Dragging pins to the projections of a rotated pose recovers it."""
    obj = np.array(
        [
            [0.3, 0.3, 0.0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.0],
            [0.3, -0.3, -0.1], [0.0, 0.2, 0.25], [0.1, -0.1, 0.2],
        ],
        np.float32,
    )
    # Target: the same object viewed after a small model rotation
    ang = 0.06
    Rz = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0, 0],
            [np.sin(ang), np.cos(ang), 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    scene_target = SceneTransformations(
        jnp.asarray(Rz), scene.view_matrix, scene.intrinsics
    )
    px_target = project_obj(scene_target, obj)

    # Drag each pin to its target successively (as the UI would)
    cur = scene
    for _ in range(3):
        for i in range(len(obj)):
            cur = find_transformation(
                obj, cur, cur, PinUpdate(i, px_target[i]), TRANSFORM_MODEL
            )
    px_final = project_obj(cur, obj)
    np.testing.assert_allclose(px_final, px_target, atol=0.5)


def test_pin_idx_out_of_range(scene):
    with pytest.raises(ValueError):
        find_transformation(
            np.zeros((2, 3), np.float32), scene, scene,
            PinUpdate(5, np.zeros(2, np.float32)), TRANSFORM_MODEL,
        )


def test_intrinsics_gate_with_three_points():
    """<=3 valid points must leave intrinsics untouched even with
    optimization flags on (cpp/pnp/pnp_problem.h:34-35) — the gate is
    dynamic on the fused tracker path."""
    import jax.numpy as jnp

    from polychase_tpu.engine import camera as C, pose as P
    from polychase_tpu.engine.levmarq import BundleOptions
    from polychase_tpu.engine.pnp import (
        normalize_bundle_opts, pack_camera_params, solve_arrays,
    )

    rng = np.random.default_rng(0)
    intr = C.Intrinsics.create(
        600.0, 600.0, 320.0, 240.0, 1.0, 640.0, 480.0, C.OPENCV
    )
    q = jnp.asarray([1.0, 0, 0, 0])
    t = jnp.asarray([0.0, 0, 3.0])
    cam = C.CameraState(intr, P.Pose(q, t))
    X = rng.normal(0, 0.5, (8, 3)).astype(np.float32)
    X[:, 2] = 0.0
    proj = np.asarray(C.project(intr, P.pose_apply(P.Pose(q, t),
                                                   jnp.asarray(X))))
    x = proj + rng.normal(0, 0.5, proj.shape).astype(np.float32)
    mask = np.zeros(8, bool)
    mask[:3] = True
    vec = np.asarray(
        solve_arrays(
            jnp.asarray(X), jnp.asarray(x),
            jnp.asarray(mask.astype(np.float32)), jnp.asarray(mask),
            jnp.asarray(pack_camera_params(cam, 12.0)),
            opt_f=True, opt_pp=True,
            opts=normalize_bundle_opts(BundleOptions()),
        )
    )
    np.testing.assert_allclose(vec[7:11], [600.0, 600.0, 320.0, 240.0])
