"""Scene manipulation operators
(rebuild of blender_addon/operators/scene_operations.py).

- Center Geometry: place the mesh in front of the camera by bbox;
- Convert Animation: camera-animation ↔ geometry-animation by
  recomposing the modelview at every keyframe;
- Transform Scene: rigidly re-pose the whole tracked scene (all
  keyframes) relative to a reference.
"""

from __future__ import annotations

import math

import bpy
import mathutils

from .. import keyframes, properties, utils


def _active_tracker(context):
    state = properties.PolychaseState.from_scene(context.scene)
    return state.active_tracker if state else None


class PC_OT_CenterGeometry(bpy.types.Operator):
    bl_idname = "polychase.center_geometry"
    bl_label = "Center Geometry"
    bl_description = "Place the geometry in front of the camera"
    bl_options = {"REGISTER", "UNDO"}

    @classmethod
    def poll(cls, context):
        tracker = _active_tracker(context)
        return (
            tracker is not None
            and tracker.geometry is not None
            and tracker.camera is not None
            and not properties.transient_state(tracker).busy
        )

    def execute(self, context):
        tracker = _active_tracker(context)
        geometry, camera = tracker.geometry, tracker.camera

        # Object-space bbox radius (reference scene_operations.py:13-101)
        bbox = [mathutils.Vector(c) for c in geometry.bound_box]
        center = sum(bbox, mathutils.Vector()) / 8.0
        radius = max((c - center).length for c in bbox)
        scale = geometry.matrix_world.to_scale()
        radius *= max(scale.x, scale.y, scale.z)
        radius = max(radius, 1e-6)

        # Distance so the bbox fits the camera FOV
        fov = camera.data.angle if camera.data.type == "PERSP" else math.pi / 4
        distance = radius / math.tan(fov / 2.0) * 1.2

        cam_mat = camera.matrix_world
        cam_pos = cam_mat.translation
        view_dir = cam_mat.to_quaternion() @ mathutils.Vector((0, 0, -1))
        target = cam_pos + view_dir * distance

        world_center = geometry.matrix_world @ center
        offset = target - world_center
        loc, rot, _ = geometry.matrix_world.decompose()
        utils.set_object_model_matrix(geometry, loc + offset, rot)
        return {"FINISHED"}


def _iter_keyframe_frames(obj):
    return sorted(
        keyframes.keyframes_of_type(keyframes.object_transform_fcurves(obj))
    )


class PC_OT_ConvertAnimation(bpy.types.Operator):
    bl_idname = "polychase.convert_animation"
    bl_label = "Convert Animation"
    bl_description = (
        "Convert camera animation to geometry animation or vice versa, "
        "preserving the relative motion"
    )
    bl_options = {"REGISTER", "UNDO"}

    @classmethod
    def poll(cls, context):
        tracker = _active_tracker(context)
        return (
            tracker is not None
            and tracker.geometry is not None
            and tracker.camera is not None
            and not properties.transient_state(tracker).busy
        )

    def execute(self, context):
        tracker = _active_tracker(context)
        geometry, camera = tracker.geometry, tracker.camera
        scene = context.scene
        to_geometry = tracker.tracking_target == "CAMERA"
        source = camera if to_geometry else geometry
        dest = geometry if to_geometry else camera

        frames = _iter_keyframe_frames(source)
        if not frames:
            self.report({"WARNING"}, "Source object has no keyframes")
            return {"CANCELLED"}

        # Record keyframe types to preserve anchors
        src_fcurves = keyframes.object_transform_fcurves(source)
        kf_types = {}
        for fc in src_fcurves:
            for kp in fc.keyframe_points:
                kf_types[int(round(kp.co[0]))] = kp.type

        saved = scene.frame_current
        try:
            poses = []
            for frame in frames:
                scene.frame_set(frame)
                view = utils.get_camera_view_matrix(camera)
                model = geometry.matrix_world.copy()
                poses.append((frame, view @ model))

            # Freeze the destination's current transform as the constant
            scene.frame_set(frames[0])
            if to_geometry:
                const_view = utils.get_camera_view_matrix(camera)
            else:
                const_model = geometry.matrix_world.copy()

            # Remove the source's animation
            keyframes.clear_keyframes(src_fcurves, lambda f, t: True)

            for frame, mv in poses:
                scene.frame_set(frame)
                keytype = kf_types.get(frame, keyframes.GENERATED_KEYFRAME)
                if to_geometry:
                    model = const_view.inverted() @ mv
                    loc, rot, _ = model.decompose()
                    utils.set_object_model_matrix(geometry, loc, rot)
                else:
                    view = mv @ const_model.inverted()
                    loc, rot, _ = view.decompose()
                    utils.set_camera_view_matrix(camera, loc, rot)
                keyframes.insert_keyframe(dest, frame, keytype=keytype)
        finally:
            scene.frame_set(saved)

        tracker.tracking_target = (
            "GEOMETRY" if to_geometry else "CAMERA"
        )
        return {"FINISHED"}


class PC_OT_TransformScene(bpy.types.Operator):
    bl_idname = "polychase.transform_scene"
    bl_label = "Transform Scene"
    bl_description = (
        "Rigidly re-pose the whole tracked scene across all keyframes"
    )
    bl_options = {"REGISTER", "UNDO"}

    location: bpy.props.FloatVectorProperty(name="Location", size=3)
    rotation: bpy.props.FloatVectorProperty(
        name="Rotation", size=3, subtype="EULER"
    )
    scale: bpy.props.FloatProperty(name="Scale", default=1.0, min=1e-6)
    reference: bpy.props.EnumProperty(
        name="Reference",
        items=[
            ("GEOMETRY", "Geometry", "Anchor the geometry's first pose"),
            ("CAMERA", "Camera", "Anchor the camera's first pose"),
        ],
        default="GEOMETRY",
    )

    @classmethod
    def poll(cls, context):
        tracker = _active_tracker(context)
        return (
            tracker is not None
            and tracker.geometry is not None
            and tracker.camera is not None
            and not properties.transient_state(tracker).busy
        )

    def invoke(self, context, event):
        return context.window_manager.invoke_props_dialog(self)

    def execute(self, context):
        tracker = _active_tracker(context)
        geometry, camera = tracker.geometry, tracker.camera
        scene = context.scene

        delta = mathutils.Matrix.LocRotScale(
            mathutils.Vector(self.location),
            mathutils.Euler(self.rotation).to_quaternion(),
            mathutils.Vector((self.scale,) * 3),
        )

        cam_frames = _iter_keyframe_frames(camera)
        geo_frames = _iter_keyframe_frames(geometry)
        frames = sorted(set(cam_frames) | set(geo_frames))
        saved = scene.frame_current
        try:
            if not frames:
                # Static scene: transform both current transforms
                geometry.matrix_world = delta @ geometry.matrix_world
                camera.matrix_world = delta @ camera.matrix_world
                return {"FINISHED"}

            # Collect per-frame world transforms
            gathered = []
            for frame in frames:
                scene.frame_set(frame)
                gathered.append(
                    (
                        frame,
                        geometry.matrix_world.copy(),
                        camera.matrix_world.copy(),
                    )
                )

            for frame, geo_mat, cam_mat in gathered:
                scene.frame_set(frame)
                new_geo = delta @ geo_mat
                new_cam = delta @ cam_mat
                if frame in geo_frames or not geo_frames:
                    loc, rot, scl = new_geo.decompose()
                    utils.set_object_model_matrix(geometry, loc, rot, scl)
                    keyframes.insert_keyframe(
                        geometry, frame,
                        keytype=keyframes.GENERATED_KEYFRAME,
                    )
                if frame in cam_frames or not cam_frames:
                    loc, rot, _ = new_cam.decompose()
                    camera.matrix_world = mathutils.Matrix.LocRotScale(
                        loc, rot, camera.matrix_world.to_scale()
                    )
                    keyframes.insert_keyframe(
                        camera, frame, keytype=keyframes.GENERATED_KEYFRAME
                    )
        finally:
            scene.frame_set(saved)
        return {"FINISHED"}


CLASSES = (
    PC_OT_CenterGeometry,
    PC_OT_ConvertAnimation,
    PC_OT_TransformScene,
)
