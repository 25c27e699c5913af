"""Executed-modal addon coverage: drive PC_OT_AnalyzeVideo and
PC_OT_TrackSequence through invoke/execute → timer ticks → worker queue
→ finish/cancel under the behavioral fake bpy (tests/fake_bpy.py), with
REAL worker threads and the REAL engine underneath.

Reference flows: blender_addon/operators/analysis.py:182-233 (frame
request/provide handshake) and operators/tracking.py:266-356 (queue pump
+ keyframe writes + inlier abort).  These are protocol tests: a
regression in the modal glue (lost frame request, stuck transient flag,
missed keyframe write) fails here even though every engine-level test
still passes.
"""

import importlib
import sys
import time
from types import SimpleNamespace

import numpy as np
import pytest

import fake_bpy
from test_e2e_images import (
    FOCAL,
    H,
    N_FRAMES,
    W,
    _intr,
    _noise_fn,
    _render,
)
from synthetic import make_sphere_mesh, orbit_pose

TIMER = SimpleNamespace(type="TIMER")
ESC = SimpleNamespace(type="ESC")

_FLIP = np.diag([1.0, -1.0, -1.0, 1.0])  # OpenCV ↔ OpenGL view flip


@pytest.fixture(scope="module")
def rendered():
    rng = np.random.default_rng(11)
    mesh = make_sphere_mesh()
    poses = [orbit_pose(0.035 * i) for i in range(N_FRAMES)]
    tex = _noise_fn(rng)
    intr = _intr()
    frames = [_render(mesh, intr, p, tex) for p in poses]
    assert frames[0].std() > 15
    return SimpleNamespace(mesh=mesh, poses=poses, frames=frames)


def _view_cv4x4(pose):
    from polychase_tpu.engine.tracker import pose_rt4x4_np

    return pose_rt4x4_np(pose).astype(np.float64)


@pytest.fixture
def env(rendered, tmp_path):
    """Fresh fake-bpy world + freshly imported addon modules."""
    for name in list(sys.modules):
        if name.startswith("polychase_tpu.blender_addon"):
            sys.modules.pop(name)
    scene = fake_bpy.FakeScene()
    bpy, saved = fake_bpy.install(scene)

    analysis = importlib.import_module(
        "polychase_tpu.blender_addon.operators.analysis"
    )
    tracking = importlib.import_module(
        "polychase_tpu.blender_addon.operators.tracking"
    )
    refiner = importlib.import_module(
        "polychase_tpu.blender_addon.operators.refiner"
    )
    pin_mode = importlib.import_module(
        "polychase_tpu.blender_addon.operators.pin_mode.pin_mode"
    )
    properties = importlib.import_module(
        "polychase_tpu.blender_addon.properties"
    )
    keyframes = importlib.import_module(
        "polychase_tpu.blender_addon.keyframes"
    )
    core = importlib.import_module("polychase_tpu.blender_addon.core")
    import fake_mathutils as mu

    clip = fake_bpy.FakeClip(
        "clip", str(tmp_path / "clip.mp4"), W, H, 0, N_FRAMES
    )
    cam_data = fake_bpy.FakeCameraData()
    cam_data.lens = FOCAL * cam_data.sensor_width / W
    camera = fake_bpy.FakeObject("Camera", data=cam_data)
    # Blender camera pose (world matrix) from the OpenCV ground truth.
    view_gl = _FLIP @ _view_cv4x4(rendered.poses[0])
    camera.matrix_world = mu.Matrix(np.linalg.inv(view_gl))
    geometry = fake_bpy.FakeObject(
        "Sphere",
        mesh_arrays=(
            np.asarray(rendered.mesh.vertices),
            np.asarray(rendered.mesh.triangles),
        ),
    )
    tracker = fake_bpy.FakeTracker(
        clip=clip, camera=camera, geometry=geometry,
        database_path=str(tmp_path / "flow.db"),
    )
    scene.polychase_state = fake_bpy.FakeState([tracker])

    yield SimpleNamespace(
        bpy=bpy, scene=scene, ctx=bpy.context, clip=clip, camera=camera,
        geometry=geometry, tracker=tracker, analysis=analysis,
        tracking=tracking, refiner=refiner, pin_mode=pin_mode,
        properties=properties, keyframes=keyframes,
        core=core, rendered=rendered, mu=mu,
        db_path=str(tmp_path / "flow.db"),
    )

    core.Trackers.clear()
    properties._transient.clear()
    fake_bpy.uninstall(saved)


def _pump(op, ctx, deadline_s=600.0, tick=None):
    """Tick the modal handler until it leaves RUNNING_MODAL."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        res = op.modal(ctx, TIMER)
        if res != {"RUNNING_MODAL"}:
            return res
        if tick is not None:
            tick(op)
        time.sleep(0.005)
    raise TimeoutError("modal operator did not finish")


def _wire_background_image(env):
    """Post-execute: serve the scripted clip frames through the Image
    datablock the operator created, and register its image_user for
    frame_set updates (what Blender's depsgraph would do)."""
    img = env.bpy.data.images.get(f"polychase_source_{env.clip.name}")
    assert img is not None

    def provider():
        fid = env.scene.frame_current - env.clip.frame_start
        g = env.rendered.frames[fid].astype(np.float32) / 255.0
        out = np.empty((H, W, 4), np.float32)
        out[..., 0] = out[..., 1] = out[..., 2] = g
        out[..., 3] = 1.0
        return out

    img.provider = provider
    for bg in env.camera.data.background_images:
        if bg.source == "IMAGE" and bg.image is img:
            env.scene._image_users.append(bg.image_user)


class TestAnalyzeModal:
    def test_full_run_writes_database(self, env):
        op = env.analysis.PC_OT_AnalyzeVideo()
        assert type(op).poll(env.ctx)

        res = op.invoke(env.ctx, SimpleNamespace(type="RET"))
        assert res == {"RUNNING_MODAL"}
        assert op.frame_start == env.clip.frame_start
        assert op.frame_end == env.clip.frame_start + N_FRAMES - 1
        assert env.ctx.window_manager.props_dialogs == [op]

        res = op.execute(env.ctx)
        assert res == {"RUNNING_MODAL"}
        transient = env.properties.transient_state(env.tracker)
        assert transient.is_analyzing and transient.busy
        assert len(env.ctx.window_manager.timers) == 1
        assert env.ctx.window_manager.modal_handlers == [op]
        # While analyzing, re-running is rejected and cancel is offered.
        assert not type(op).poll(env.ctx)
        assert env.analysis.PC_OT_CancelAnalysis.poll(env.ctx)

        _wire_background_image(env)
        res = _pump(op, env.ctx)
        assert res == {"FINISHED"}, op.reports

        assert not transient.is_analyzing
        assert transient.progress == 1.0
        assert env.ctx.window_manager.timers == []

        import polychase_tpu.polychase_core as pc

        db = pc.Database(env.db_path)
        try:
            for f in range(N_FRAMES):
                assert db.read_keypoints(f).shape[0] > 60, f
            # the ±{1,2,4,8} fan-out produced pair flows in both
            # directions
            assert set(db.find_optical_flows_from_image(3)) >= {1, 2, 4, 5}
        finally:
            db.close()

    def test_esc_cancels(self, env):
        op = env.analysis.PC_OT_AnalyzeVideo()
        op.invoke(env.ctx, SimpleNamespace(type="RET"))
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}
        _wire_background_image(env)
        transient = env.properties.transient_state(env.tracker)

        saw_progress = {"n": 0}

        def tick(op_):
            if transient.progress > 0.0:
                saw_progress["n"] += 1
                if saw_progress["n"] == 1:
                    op_.modal(env.ctx, ESC)

        res = _pump(op, env.ctx, tick=tick)
        # Cancel during a blocked frame request surfaces as an error
        # finish; a cancel between frames completes normally.  Either
        # way the modal must terminate and clear its state.
        assert res in ({"FINISHED"}, {"CANCELLED"})
        assert not transient.is_analyzing
        assert env.ctx.window_manager.timers == []

    def test_esc_during_blocked_frame_request_cancels_cleanly(self, env):
        """ESC while the worker is blocked waiting for a frame must end
        as a clean cancel, not an error: the stop request unblocks the
        provide wait with no frame, which the worker treats as the
        cancel path (reference cpp/opticalflow.cc:238-247)."""
        op = env.analysis.PC_OT_AnalyzeVideo()
        op.invoke(env.ctx, SimpleNamespace(type="RET"))
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}
        # Deliberately do NOT register the image users with the scene:
        # the seek never settles, so the worker stays blocked on its
        # first frame request.
        deadline = time.time() + 60
        while op._pending_frame is None and time.time() < deadline:
            op.modal(env.ctx, TIMER)
            time.sleep(0.01)
        assert op._pending_frame is not None
        op.modal(env.ctx, ESC)
        res = _pump(op, env.ctx, deadline_s=60)
        assert res == {"FINISHED"}, op.reports
        assert not [r for r in op.reports if "ERROR" in r[0]], op.reports
        transient = env.properties.transient_state(env.tracker)
        assert not transient.is_analyzing

    def test_non_timer_events_pass_through(self, env):
        op = env.analysis.PC_OT_AnalyzeVideo()
        op.invoke(env.ctx, SimpleNamespace(type="RET"))
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}
        _wire_background_image(env)
        assert op.modal(
            env.ctx, SimpleNamespace(type="MOUSEMOVE")
        ) == {"PASS_THROUGH"}
        res = _pump(op, env.ctx)
        assert res == {"FINISHED"}, op.reports


def _analyze_db(env):
    """Build the flow DB through the public engine API (fast path for
    the tracking tests)."""
    import polychase_tpu.polychase_core as pc

    info = pc.VideoInfo(
        width=W, height=H, first_frame=0, num_frames=N_FRAMES
    )
    pc.generate_optical_flow_database(
        info, lambda fid: env.rendered.frames[fid], None, env.db_path
    )


class TestTrackModal:
    def test_full_run_writes_generated_keyframes(self, env):
        _analyze_db(env)
        env.scene.frame_set(0)

        op = env.tracking.PC_OT_TrackSequence()
        assert type(op).poll(env.ctx)
        res = op.execute(env.ctx)
        assert res == {"RUNNING_MODAL"}, op.reports
        transient = env.properties.transient_state(env.tracker)
        assert transient.is_tracking
        # The anchor USER keyframe was written at the start frame.
        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        assert env.keyframes.has_keyframe_at(
            fcurves, 0, env.keyframes.USER_KEYFRAME
        )

        res = _pump(op, env.ctx)
        assert res == {"FINISHED"}, op.reports
        assert not transient.is_tracking
        assert env.ctx.window_manager.timers == []

        # Every tracked frame produced a GENERATED keyframe on the camera.
        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        gen = env.keyframes.keyframes_of_type(
            fcurves, env.keyframes.GENERATED_KEYFRAME
        )
        assert gen == set(range(1, N_FRAMES))
        # The scene followed the tracking playhead.
        assert env.scene.frame_current == N_FRAMES - 1

        # The final camera world matrix matches the ground-truth pose.
        view_gl = np.linalg.inv(np.asarray(env.camera.matrix_world))
        view_cv = _FLIP @ view_gl
        gt = _view_cv4x4(env.rendered.poses[N_FRAMES - 1])
        assert np.abs(view_cv - gt).max() < 0.05, view_cv - gt

    def test_esc_cancels_mid_run(self, env):
        _analyze_db(env)
        env.scene.frame_set(0)

        op = env.tracking.PC_OT_TrackSequence()
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}
        transient = env.properties.transient_state(env.tracker)

        sent = {"esc": False}

        def tick(op_):
            # Cancel as soon as the first frame result was applied.
            if not sent["esc"] and transient.progress > 0.0:
                sent["esc"] = True
                op_.modal(env.ctx, ESC)

        res = _pump(op, env.ctx, tick=tick)
        assert res == {"FINISHED"}, op.reports
        assert not transient.is_tracking
        assert transient.active_thread is None

        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        gen = env.keyframes.keyframes_of_type(
            fcurves, env.keyframes.GENERATED_KEYFRAME
        )
        # Partial progress: at least the first tracked frame was keyed,
        # and the cancel stopped the run before the clip end.
        assert gen, "no tracked frames before cancel"
        assert min(gen) == 1

    def test_cancel_operator_requests_stop(self, env):
        _analyze_db(env)
        env.scene.frame_set(0)

        op = env.tracking.PC_OT_TrackSequence()
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}
        assert env.tracking.PC_OT_CancelTracking.poll(env.ctx)
        cancel = env.tracking.PC_OT_CancelTracking()
        assert cancel.execute(env.ctx) == {"FINISHED"}
        res = _pump(op, env.ctx)
        assert res in ({"FINISHED"}, {"CANCELLED"})
        transient = env.properties.transient_state(env.tracker)
        assert not transient.is_tracking

    def test_nothing_to_track_at_clip_end(self, env):
        _analyze_db(env)
        env.scene.frame_set(N_FRAMES - 1)
        op = env.tracking.PC_OT_TrackSequence()
        assert op.execute(env.ctx) == {"CANCELLED"}
        assert any("Nothing to track" in m for _, m in op.reports)
        assert not env.properties.transient_state(env.tracker).is_tracking


def _perturbed_views(env, rng, noise=0.03):
    """Per-frame scripted camera world matrices: ground truth with noisy
    interior translations (what a drifting track would have keyed)."""
    views = {}
    for f in range(N_FRAMES):
        v = _view_cv4x4(env.rendered.poses[f])
        if 0 < f < N_FRAMES - 1:
            v = v.copy()
            v[:3, 3] += rng.normal(0, noise, 3)
        views[f] = v
    return views


def _install_camera_animation(env, views):
    """Drive camera.matrix_world from the scripted views on frame_set,
    as Blender's animation system would from keyed fcurves."""

    def hook(frame):
        if frame in views:
            view_gl = _FLIP @ views[frame]
            env.camera.matrix_world = env.mu.Matrix(
                np.linalg.inv(view_gl)
            )

    env.scene.frame_hooks.append(hook)
    hook(env.scene.frame_current)


def _t_err(view_cv, gt_pose):
    return float(
        np.linalg.norm(view_cv[:3, 3] - _view_cv4x4(gt_pose)[:3, 3])
    )


class TestRefineModal:
    def _setup(self, env, rng):
        _analyze_db(env)
        views = _perturbed_views(env, rng)
        _install_camera_animation(env, views)
        # USER keyframes bound the segment (anchors)
        env.keyframes.insert_keyframe(
            env.camera, 0, keytype=env.keyframes.USER_KEYFRAME
        )
        env.keyframes.insert_keyframe(
            env.camera, N_FRAMES - 1, keytype=env.keyframes.USER_KEYFRAME
        )
        return views

    def test_refine_sequence_improves_interior_frames(self, env):
        rng = np.random.default_rng(7)
        views = self._setup(env, rng)
        env.scene.frame_set(3)  # inside the (0, N-1) segment

        op = env.refiner.PC_OT_RefineSequence()
        assert type(op).poll(env.ctx)
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}, op.reports
        transient = env.properties.transient_state(env.tracker)
        assert transient.is_refining
        assert env.refiner.PC_OT_CancelRefine.poll(env.ctx)

        res = _pump(op, env.ctx)
        assert res == {"FINISHED"}, op.reports
        assert not transient.is_refining
        assert env.ctx.window_manager.timers == []

        # GENERATED keyframes at every interior frame, snapshotting the
        # refined camera matrices.
        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        gen = env.keyframes.keyframes_of_type(
            fcurves, env.keyframes.GENERATED_KEYFRAME
        )
        assert gen == set(range(1, N_FRAMES - 1))

        errs_before, errs_after = [], []
        for f in range(1, N_FRAMES - 1):
            world = env.camera.keyframe_matrices[f]
            refined_cv = _FLIP @ np.linalg.inv(world)
            errs_before.append(_t_err(views[f], env.rendered.poses[f]))
            errs_after.append(_t_err(refined_cv, env.rendered.poses[f]))
        assert np.mean(errs_after) < 0.6 * np.mean(errs_before), (
            errs_before, errs_after,
        )

    def test_refine_needs_two_user_keyframes(self, env):
        _analyze_db(env)
        op = env.refiner.PC_OT_RefineSequence()
        assert op.execute(env.ctx) == {"CANCELLED"}
        assert any("two user keyframes" in m for _, m in op.reports)

    def test_refine_all_segments_parallel_route(self, env):
        """With 3 user keyframes and >1 device, refine-all routes to the
        segment-parallel RefineSegmentsThread; both segments must come
        back refined."""
        import polychase_tpu.polychase_core as pc

        assert pc.device_count() > 1  # 8-device virtual CPU mesh
        rng = np.random.default_rng(9)
        views = self._setup(env, rng)
        env.keyframes.insert_keyframe(
            env.camera, 4, keytype=env.keyframes.USER_KEYFRAME
        )

        op = env.refiner.PC_OT_RefineAllSegments()
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}, op.reports
        assert op._parallel_trajs is not None  # took the parallel route
        res = _pump(op, env.ctx)
        assert res == {"FINISHED"}, op.reports

        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        gen = env.keyframes.keyframes_of_type(
            fcurves, env.keyframes.GENERATED_KEYFRAME
        )
        # interior frames of both segments (anchors 0, 4, N-1 excluded)
        assert gen == set(range(1, N_FRAMES - 1)) - {4}
        errs_before, errs_after = [], []
        for f in sorted(gen):
            world = env.camera.keyframe_matrices[f]
            refined_cv = _FLIP @ np.linalg.inv(world)
            errs_before.append(_t_err(views[f], env.rendered.poses[f]))
            errs_after.append(_t_err(refined_cv, env.rendered.poses[f]))
        assert np.mean(errs_after) < 0.6 * np.mean(errs_before), (
            errs_before, errs_after,
        )

    def test_esc_cancels_refine(self, env):
        rng = np.random.default_rng(11)
        self._setup(env, rng)
        env.scene.frame_set(3)
        op = env.refiner.PC_OT_RefineSequence()
        assert op.execute(env.ctx) == {"RUNNING_MODAL"}, op.reports
        op.modal(env.ctx, ESC)
        res = _pump(op, env.ctx)
        assert res in ({"FINISHED"}, {"CANCELLED"})
        transient = env.properties.transient_state(env.tracker)
        assert not transient.is_refining
        assert env.ctx.window_manager.timers == []


# ---------------------------------------------------------------------------
# Pin mode: LMB pick/create, drag → pose re-solve, RMB delete, M-masking,
# ESC exit (reference blender_addon/operators/pin_mode/pin_mode.py).
# ---------------------------------------------------------------------------


def _event(etype, value="NOTHING", x=0, y=0, ctrl=False):
    return SimpleNamespace(
        type=etype, value=value, mouse_x=x, mouse_y=y, ctrl=ctrl
    )


class _CameraRV3D:
    """Camera-view RegionView3D: the view matrix tracks the scene camera
    (what Blender does in camera view), projection from the clip focal."""

    def __init__(self, camera, window_matrix):
        self._camera = camera
        self.window_matrix = window_matrix
        self.view_perspective = "CAMERA"

    @property
    def view_matrix(self):
        return self._camera.matrix_world.inverted()

    @property
    def perspective_matrix(self):
        return self.window_matrix @ self.view_matrix


def _window_matrix(env, near=0.1, far=1000.0):
    """Blender-style NDC projection for the synthetic pinhole (fx=fy=FOCAL,
    centered principal point)."""
    return env.mu.Matrix((
        (2.0 * FOCAL / W, 0.0, 0.0, 0.0),
        (0.0, 2.0 * FOCAL / H, 0.0, 0.0),
        (0.0, 0.0, -(far + near) / (far - near),
         -2.0 * far * near / (far - near)),
        (0.0, 0.0, -1.0, 0.0),
    ))


def _cv_project(env, point_world, intr_f=FOCAL):
    """Ground-truth-style projection of a world point through the CURRENT
    camera matrix, returned in region coords (y up)."""
    view_cv = _FLIP @ np.linalg.inv(np.array(env.camera.matrix_world))
    pc3 = (view_cv @ np.append(np.asarray(point_world, np.float64), 1.0))[:3]
    x_cv = intr_f * pc3[0] / pc3[2] + W / 2.0 - 0.5
    y_cv = intr_f * pc3[1] / pc3[2] + H / 2.0 - 0.5
    return np.array([x_cv, (H - 1) - y_cv])  # region y is up


class TestPinModeModal:
    def _enter(self, env):
        rv3d = _CameraRV3D(env.camera, _window_matrix(env))
        env.ctx.screen.areas.append(fake_bpy.FakeView3DArea(W, H, rv3d))
        op = env.pin_mode.PC_OT_PinMode()
        assert type(op).poll(env.ctx)
        res = op.invoke(env.ctx, _event("NONE"))
        assert res == {"RUNNING_MODAL"}, op.reports
        return op, rv3d

    def test_pick_drag_release_keyframes(self, env):
        op, rv3d = self._enter(env)
        transient = env.properties.transient_state(env.tracker)
        assert transient.in_pinmode
        assert not type(op).poll(env.ctx)  # no nested sessions
        assert len(fake_bpy.FakeSpaceView3D.draw_handlers) == 1

        engine_tracker = env.core.Trackers.get(env.tracker)

        # LMB off the sphere: no pin is created.
        assert op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", 30, 30)) == {
            "RUNNING_MODAL"
        }
        assert engine_tracker.pins.count == 0

        # LMB on the sphere (center + a second point): pins from raycast
        # hits, persisted in the tracker blob, projecting back to the
        # click pixel.
        clicks = [(W // 2, H // 2), (W // 2 + 40, H // 2 + 25)]
        for i, (x, y) in enumerate(clicks):
            op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", x, y))
            assert engine_tracker.pins.count == i + 1
            assert env.tracker.selected_pin == i
            assert op._dragging
            op.modal(env.ctx, _event("LEFTMOUSE", "RELEASE", x, y))
            assert not op._dragging
            hit = engine_tracker.pins.points[i]
            assert abs(np.linalg.norm(hit) - 1.0) < 0.05  # on the sphere
            back = _cv_project(env, hit)
            assert np.allclose(back, [x, y], atol=1.5), (back, (x, y))
        assert len(bytes(env.tracker.pins_data)) == 2 * 12
        # Releases wrote USER keyframes + undo pushes.
        fcurves = env.keyframes.tracker_fcurves(
            env.tracker, include_lens=False
        )
        assert env.keyframes.keyframes_of_type(
            fcurves, env.keyframes.USER_KEYFRAME
        ) == {env.scene.frame_current}
        assert sum(
            1 for m in env.bpy.undo_pushes if "pin drag" in m
        ) == 2

        # Drag pin 1 by (+12, -8): the camera re-solves so the dragged
        # pin reprojects at the new pixel and the anchored pin stays put
        # (verified through an INDEPENDENT OpenCV-convention projection).
        x0, y0 = clicks[1]
        target = (x0 + 12, y0 - 8)
        cam_before = np.array(env.camera.matrix_world)
        op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", x0, y0))
        assert op._drag_pin == 1
        # A real drag is a stream of MOUSEMOVEs; each one re-solves from
        # the scene left by the previous (the UI's iterative converge).
        for _ in range(4):
            op.modal(env.ctx, _event("MOUSEMOVE", "NOTHING", *target))
        op.modal(env.ctx, _event("LEFTMOUSE", "RELEASE", *target))
        assert not np.allclose(
            cam_before, np.array(env.camera.matrix_world)
        )
        dragged = _cv_project(env, engine_tracker.pins.points[1])
        anchored = _cv_project(env, engine_tracker.pins.points[0])
        assert np.allclose(dragged, target, atol=2.0), (dragged, target)
        assert np.allclose(anchored, clicks[0], atol=2.0), anchored

        # RMB deletes the pin under the cursor.
        op.modal(env.ctx, _event("RIGHTMOUSE", "PRESS", *target))
        assert engine_tracker.pins.count == 1
        assert env.tracker.selected_pin == -1 or env.tracker.selected_pin == 0

        # Smoke the draw handler (fake gpu): real mesh/pin numpy paths.
        fn, args, _, _ = fake_bpy.FakeSpaceView3D.draw_handlers[0]
        fn(*args)

        # ESC exits and tears down.
        assert op.modal(env.ctx, _event("ESC", "PRESS")) == {"FINISHED"}
        assert not transient.in_pinmode
        assert fake_bpy.FakeSpaceView3D.draw_handlers == []

    def test_mask_painting_blocks_pins(self, env):
        op, rv3d = self._enter(env)
        engine_tracker = env.core.Trackers.get(env.tracker)
        region = env.ctx.screen.areas[0].regions[0]

        # M toggles mask painting.
        op.modal(env.ctx, _event("M", "PRESS"))
        assert op._masking

        # Wheel adjusts the brush radius.
        r0 = env.tracker.mask_brush_radius
        op.modal(env.ctx, _event("WHEELUPMOUSE", "NOTHING", 10, 10))
        assert env.tracker.mask_brush_radius == r0 + 2
        op.modal(env.ctx, _event("WHEELDOWNMOUSE", "NOTHING", 10, 10))
        assert env.tracker.mask_brush_radius == r0

        # The REAL id pass runs on the behavioral fake gpu: the offscreen
        # software rasterizer draws gl_PrimitiveID+1 into RGBA8 and
        # render_ids reads it back and decodes it.
        cx, cy = W // 2, H // 2

        # Paint one stroke at the center.
        op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", cx, cy))
        op.modal(env.ctx, _event("LEFTMOUSE", "RELEASE", cx, cy))

        # Cross-check the rasterized pick against an engine raycast at
        # the same pixel: both views come from the same perspective
        # matrix, so the center pixel must land on the same triangle.
        ids = op._masker._id_buffer
        assert ids is not None and ids.shape == (H, W)
        hit = engine_tracker.ray_cast(
            env.tracker, env.ctx, region, rv3d, cx, cy, check_mask=False
        )
        assert hit is not None
        assert ids[cy, cx] == hit.primitive_id + 1
        assert ids[5, 5] == 0  # background stays empty
        masked = np.frombuffer(
            bytes(env.tracker.masked_triangles), np.uint32
        )
        assert masked.any()
        assert any("mask paint" in m for m in env.bpy.undo_pushes)
        # The brush circle overlay was fed to the renderer.
        assert op._renderer._mask_circle is not None

        # Back in pin mode, a masked surface refuses new pins...
        op.modal(env.ctx, _event("M", "PRESS"))
        assert not op._masking
        op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", cx, cy))
        assert engine_tracker.pins.count == 0
        op.modal(env.ctx, _event("LEFTMOUSE", "RELEASE", cx, cy))
        # ...but an unmasked spot still takes one.
        op.modal(
            env.ctx, _event("LEFTMOUSE", "PRESS", cx + 40, cy + 25)
        )
        assert engine_tracker.pins.count == 1
        op.modal(
            env.ctx,
            _event("LEFTMOUSE", "RELEASE", cx + 40, cy + 25),
        )

        op.modal(env.ctx, _event("ESC", "PRESS"))

    def test_clear_pins_and_mask_operators(self, env):
        op, rv3d = self._enter(env)
        engine_tracker = env.core.Trackers.get(env.tracker)
        op.modal(env.ctx, _event("LEFTMOUSE", "PRESS", W // 2, H // 2))
        op.modal(env.ctx, _event("LEFTMOUSE", "RELEASE", W // 2, H // 2))
        engine_tracker.mask_polygon(env.tracker, 0, mask=True)
        op.modal(env.ctx, _event("ESC", "PRESS"))

        assert env.pin_mode.PC_OT_ClearPins.poll(env.ctx)
        assert env.pin_mode.PC_OT_ClearPins().execute(env.ctx) == {
            "FINISHED"
        }
        assert bytes(env.tracker.pins_data) == b""
        assert engine_tracker.pins.sync(env.tracker)
        assert engine_tracker.pins.count == 0

        assert env.pin_mode.PC_OT_ClearMask.poll(env.ctx)
        assert env.pin_mode.PC_OT_ClearMask().execute(env.ctx) == {
            "FINISHED"
        }
        assert bytes(env.tracker.masked_triangles) == b""
