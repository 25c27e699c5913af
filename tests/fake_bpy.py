"""Behavioral stand-in for ``bpy`` that can DRIVE the addon's modal
operators (reference flows: blender_addon/operators/analysis.py:182-233,
operators/tracking.py:266-356).

Unlike the MagicMock stubs in test_addon_imports.py, this fake scripts
the pieces the operator state machines actually interact with:

- a scene with ``frame_set`` that updates background-image users (the
  analyze operator's seek-retry handshake),
- an Image datablock whose ``pixels.foreach_get`` serves the scripted
  clip frame for the CURRENT frame,
- camera/geometry objects with ``keyframe_insert`` recording typed
  keyframes into real fcurve structures (``keyframes._fcurves`` walks
  ``animation_data.action.fcurves``),
- an evaluated-mesh path (``evaluated_get().to_mesh()`` + foreach_get)
  so ``core.Trackers`` can build a real AcceleratedMesh,
- window-manager timer/modal-handler bookkeeping.

Install with :func:`install` (returns the module-like object) and import
the addon modules afterwards; remove with :func:`uninstall`.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np

import fake_mathutils as mu


# ---------------------------------------------------------------------------
# Property / Operator machinery
# ---------------------------------------------------------------------------


class _FakeProp:
    def __init__(self, default=None, **kw):
        self.default = default
        self.kw = kw


def _prop(default=None):
    def factory(*a, name=None, default=default, **kw):
        return _FakeProp(default=default, name=name, **kw)

    return factory


class FakeOperator:
    """Materializes annotation-declared props as instance attributes with
    their defaults (Blender's RNA does this at registration time)."""

    def __init__(self):
        for klass in reversed(type(self).__mro__):
            module = sys.modules.get(klass.__module__)
            for key, val in getattr(klass, "__annotations__", {}).items():
                if isinstance(val, str) and module is not None:
                    # ``from __future__ import annotations`` stringizes
                    # the prop declarations; evaluate them against the
                    # defining module (where ``bpy`` is this fake).
                    try:
                        val = eval(val, module.__dict__)  # noqa: S307
                    except Exception:
                        continue
                if isinstance(val, _FakeProp):
                    setattr(self, key, val.default)
        self.reports: list[tuple] = []

    def report(self, level, message):
        self.reports.append((tuple(level), message))


# ---------------------------------------------------------------------------
# Data blocks
# ---------------------------------------------------------------------------


class FakePixels:
    """image.pixels facade; ``provider`` returns the current (H, W, C)
    float32 array on demand."""

    def __init__(self, image):
        self._image = image

    def foreach_get(self, buf):
        arr = self._image.provider()
        np.copyto(np.asarray(buf).reshape(arr.shape), arr)


class FakeImage:
    def __init__(self, name, width, height):
        self.name = name
        self.size = (width, height)
        self.channels = 4
        self.source = "MOVIE"
        self.filepath = ""
        self.use_view_as_render = False
        self.pixels = FakePixels(self)
        self.provider = lambda: np.zeros(
            (height, width, self.channels), np.float32
        )


class FakeImages:
    def __init__(self):
        self._store: dict[str, FakeImage] = {}

    def new(self, name, width=0, height=0, alpha=False):
        img = FakeImage(name, width, height)
        self._store[name] = img
        return img

    def get(self, name):
        return self._store.get(name)


class FakeImageUser:
    def __init__(self):
        self.frame_start = 0
        self.frame_duration = 0
        self.frame_offset = 0
        self.frame_current = -(10**9)
        self.use_auto_refresh = False


class FakeBackgroundImage:
    def __init__(self):
        self.source = "IMAGE"
        self.clip = None
        self.image = None
        self.alpha = 1.0
        self.frame_method = "STRETCH"
        self.image_user = FakeImageUser()


class FakeBackgroundImages(list):
    def new(self):
        bg = FakeBackgroundImage()
        self.append(bg)
        return bg


class FakeKeyframePoint:
    def __init__(self, frame, value, keytype):
        self.co = (float(frame), float(value))
        self.type = keytype


class FakeKeyframePoints(list):
    """Blender's FCurveKeyframePoints: list plus a ``fast=`` kwarg on
    remove (skips handle recalculation in Blender; a no-op here)."""

    def remove(self, kp, fast=False):
        super().remove(kp)


class FakeFCurve:
    def __init__(self, data_path, array_index=0):
        self.data_path = data_path
        self.array_index = array_index
        self.keyframe_points = FakeKeyframePoints()

    def update(self):
        # Blender re-sorts points and recalculates handles here.
        self.keyframe_points.sort(key=lambda kp: kp.co[0])


class FakeAction:
    def __init__(self):
        self.fcurves: list[FakeFCurve] = []
        self.layers = []  # pre-4.4 shape: container is the action itself


class FakeAnimData:
    def __init__(self):
        self.action = FakeAction()
        self.action_slot = None


class _Animatable:
    """keyframe_insert host (objects and camera data blocks)."""

    def __init__(self):
        self.animation_data = None

    def animation_data_create(self):
        if self.animation_data is None:
            self.animation_data = FakeAnimData()
        return self.animation_data

    def keyframe_insert(self, data_path, frame=0, keytype="KEYFRAME",
                        **_kw):
        anim = self.animation_data_create()
        for fc in anim.action.fcurves:
            if fc.data_path == data_path:
                break
        else:
            fc = FakeFCurve(data_path)
            anim.action.fcurves.append(fc)
        for kp in fc.keyframe_points:
            if abs(kp.co[0] - frame) < 0.5:
                kp.type = keytype
                return
        fc.keyframe_points.append(FakeKeyframePoint(frame, 0.0, keytype))


class FakeCameraData(_Animatable):
    def __init__(self):
        super().__init__()
        self.type = "PERSP"
        self.lens = 35.0
        self.shift_x = 0.0
        self.shift_y = 0.0
        self.sensor_width = 36.0
        self.sensor_height = 24.0
        self.sensor_fit = "HORIZONTAL"
        self.clip_start = 0.1
        self.clip_end = 1000.0
        self.background_images = FakeBackgroundImages()
        self.show_background_images = False

    @property
    def angle(self):
        # Horizontal FOV from lens/sensor (Blender Camera.angle)
        return 2.0 * np.arctan(self.sensor_width / (2.0 * self.lens))


class FakeMeshCollection:
    """vertices / loop_triangles with Blender's foreach_get protocol."""

    def __init__(self, count, fields):
        self._count = count
        self._fields = fields  # name -> flat np array

    def __len__(self):
        return self._count

    def foreach_get(self, name, out):
        np.copyto(np.asarray(out), self._fields[name])


class FakeEvaluatedMesh:
    def __init__(self, verts, tris):
        verts = np.asarray(verts, np.float32)
        tris = np.asarray(tris, np.int64)
        self.vertices = FakeMeshCollection(
            len(verts), {"co": verts.reshape(-1).astype(np.float32)}
        )
        self.loop_triangles = FakeMeshCollection(
            len(tris),
            {
                "vertices": tris.reshape(-1).astype(np.int32),
                "polygon_index": np.arange(len(tris), dtype=np.int32),
            },
        )

    def calc_loop_triangles(self):
        pass


class FakeObject(_Animatable):
    def __init__(self, name, data=None, mesh_arrays=None):
        super().__init__()
        self.name = name
        self.data = data
        self.matrix_world = mu.Matrix()
        self.scale = mu.Vector((1.0, 1.0, 1.0))
        self.rotation_mode = "QUATERNION"
        self._mesh_arrays = mesh_arrays  # (verts, tris) for geometry
        # frame -> snapshot of matrix_world at keyframe_insert time (what
        # Blender would bake into the fcurves)
        self.keyframe_matrices: dict[int, np.ndarray] = {}

    def keyframe_insert(self, data_path, frame=0, keytype="KEYFRAME",
                        **kw):
        self.keyframe_matrices[int(frame)] = np.array(self.matrix_world)
        _Animatable.keyframe_insert(
            self, data_path, frame=frame, keytype=keytype, **kw
        )

    def evaluated_get(self, _depsgraph):
        return self

    @property
    def matrix_local(self):
        # No parenting in the fake world: local == world.
        return self.matrix_world

    @property
    def bound_box(self):
        """8 local-space bbox corners (Blender order not significant for
        the addon's uses: it takes center + max radius)."""
        if self._mesh_arrays is not None:
            verts = np.asarray(self._mesh_arrays[0], np.float64)
            lo, hi = verts.min(axis=0), verts.max(axis=0)
        else:
            lo, hi = -np.ones(3), np.ones(3)
        return [
            (x, y, z)
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ]

    def to_mesh(self):
        verts, tris = self._mesh_arrays
        return FakeEvaluatedMesh(verts, tris)

    def to_mesh_clear(self):
        pass


class FakeClip:
    def __init__(self, name, filepath, width, height, frame_start,
                 frame_duration):
        self.name = name
        self.filepath = filepath
        self.size = (width, height)
        self.frame_start = frame_start
        self.frame_duration = frame_duration
        self.source = "MOVIE"


# ---------------------------------------------------------------------------
# Scene / context
# ---------------------------------------------------------------------------


class FakeScene:
    def __init__(self):
        self.frame_current = 0
        self.camera = None
        self.polychase_state = None
        self._image_users: list[FakeImageUser] = []
        # Scripted stand-ins for depsgraph evaluation on frame change
        # (e.g. pose objects from animation): each hook is called with
        # the new frame number.
        self.frame_hooks: list = []

    def frame_set(self, frame):
        self.frame_current = int(frame)
        for iu in self._image_users:
            iu.frame_current = (
                self.frame_current + iu.frame_offset - iu.frame_start + 1
            )
        for hook in self.frame_hooks:
            hook(self.frame_current)


class FakeRegion3D:
    """Viewport camera state (bpy.types.RegionView3D)."""

    def __init__(self, view_matrix=None, window_matrix=None):
        self.view_perspective = "PERSP"
        self.view_matrix = (
            view_matrix if view_matrix is not None else mu.Matrix()
        )
        self.window_matrix = (
            window_matrix if window_matrix is not None else mu.Matrix()
        )

    @property
    def perspective_matrix(self):
        return self.window_matrix @ self.view_matrix


class FakeView3DArea:
    """A VIEW_3D area with one WINDOW region at origin."""

    def __init__(self, width, height, rv3d=None):
        self.type = "VIEW_3D"
        self.regions = [
            SimpleNamespace(
                type="WINDOW", x=0, y=0, width=width, height=height
            )
        ]
        rv3d = rv3d if rv3d is not None else FakeRegion3D()
        self.spaces = SimpleNamespace(active=SimpleNamespace(region_3d=rv3d))
        self.redraw_count = 0

    def tag_redraw(self):
        self.redraw_count += 1


class FakeSpaceView3D:
    """Draw-handler registry (reset per :func:`install`)."""

    draw_handlers: list = []

    @classmethod
    def draw_handler_add(cls, fn, args, region_type, draw_type):
        handler = (fn, args, region_type, draw_type)
        cls.draw_handlers.append(handler)
        return handler

    @classmethod
    def draw_handler_remove(cls, handler, region_type):
        cls.draw_handlers.remove(handler)


class FakeWindowManager:
    def __init__(self):
        self.timers: list = []
        self.modal_handlers: list = []
        self.props_dialogs: list = []

    def event_timer_add(self, interval, window=None):
        timer = SimpleNamespace(interval=interval, window=window)
        self.timers.append(timer)
        return timer

    def event_timer_remove(self, timer):
        self.timers.remove(timer)

    def modal_handler_add(self, op):
        self.modal_handlers.append(op)

    def invoke_props_dialog(self, op, **_kw):
        self.props_dialogs.append(op)
        return {"RUNNING_MODAL"}


class FakeContext:
    def __init__(self, scene):
        self.scene = scene
        self.window_manager = FakeWindowManager()
        self.window = SimpleNamespace()
        self.screen = SimpleNamespace(areas=[])

    @property
    def region_data(self):
        for area in self.screen.areas:
            if area.type == "VIEW_3D":
                return area.spaces.active.region_3d
        return None

    def evaluated_depsgraph_get(self):
        return SimpleNamespace()


# ---------------------------------------------------------------------------
# State objects (duck-typed PolychaseState / PolychaseTracker)
# ---------------------------------------------------------------------------


class FakeTracker:
    _next_id = 1000

    def __init__(self, clip=None, camera=None, geometry=None,
                 database_path=""):
        FakeTracker._next_id += 1
        self.id = FakeTracker._next_id
        self.name = f"tracker{self.id}"
        self.clip = clip
        self.camera = camera
        self.geometry = geometry
        self.database_path = database_path
        self.tracking_target = "CAMERA"
        self.optimize_focal_length = False
        self.optimize_principal_point = False
        self.pins_data = b""
        self.pins_version = 0
        self.masked_triangles = b""
        # Pin-mode UI props (blender_addon/properties.py:122-158)
        self.selected_pin = -1
        self.pin_radius = 7.0
        self.mask_brush_radius = 25
        self.pin_color = (0.2, 0.6, 1.0, 1.0)
        self.selected_pin_color = (1.0, 0.4, 0.2, 1.0)
        self.wireframe_color = (0.0, 1.0, 0.0, 0.4)
        self.masked_color = (1.0, 0.0, 0.0, 0.4)


class FakeState:
    def __init__(self, trackers):
        self.trackers = list(trackers)
        self.active_tracker_index = 0 if trackers else -1

    @property
    def active_tracker(self):
        idx = self.active_tracker_index
        if 0 <= idx < len(self.trackers):
            return self.trackers[idx]
        return None


# ---------------------------------------------------------------------------
# Module assembly
# ---------------------------------------------------------------------------

MODULE_NAMES = [
    "bpy", "bpy.types", "bpy.props", "bpy.utils", "bpy.path", "bpy.ops",
    "mathutils", "gpu", "gpu.types", "gpu.state", "gpu.shader",
    "gpu_extras", "gpu_extras.batch",
]


def make_bpy(scene: FakeScene):
    bpy = types.ModuleType("bpy")

    bpy_types = types.ModuleType("bpy.types")
    bpy_types.Operator = FakeOperator
    bpy_types.PropertyGroup = type("PropertyGroup", (), {})
    bpy_types.Panel = type("Panel", (), {})
    bpy_types.UIList = type("UIList", (), {})
    bpy_types.Scene = type("Scene", (), {})
    bpy_types.SpaceView3D = FakeSpaceView3D
    FakeSpaceView3D.draw_handlers = []

    bpy_props = types.ModuleType("bpy.props")
    bpy_props.IntProperty = _prop(0)
    bpy_props.BoolProperty = _prop(False)
    bpy_props.FloatProperty = _prop(0.0)
    bpy_props.StringProperty = _prop("")
    def _enum_prop(*a, items=(), default=None, name=None, **kw):
        # Blender: an EnumProperty defaults to its first item.
        if default is None and isinstance(items, (list, tuple)) and items:
            default = items[0][0]
        return _FakeProp(default=default, name=name, items=items, **kw)

    bpy_props.EnumProperty = _enum_prop
    bpy_props.PointerProperty = _prop(None)
    bpy_props.CollectionProperty = _prop(None)
    bpy_props.IntVectorProperty = _prop(None)
    bpy_props.FloatVectorProperty = _prop(None)

    bpy_path = types.ModuleType("bpy.path")
    bpy_path.abspath = lambda p: p

    bpy_utils = types.ModuleType("bpy.utils")
    bpy_utils.register_class = lambda cls: None
    bpy_utils.unregister_class = lambda cls: None

    bpy_ops = types.ModuleType("bpy.ops")
    bpy_ops.wm = SimpleNamespace(
        redraw_timer=lambda type=None, iterations=0: None
    )
    undo_pushes: list[str] = []
    bpy_ops.ed = SimpleNamespace(
        undo_push=lambda message="": undo_pushes.append(message)
    )

    bpy.types = bpy_types
    bpy.props = bpy_props
    bpy.path = bpy_path
    bpy.utils = bpy_utils
    bpy.ops = bpy_ops
    bpy.undo_pushes = undo_pushes
    bpy.data = SimpleNamespace(images=FakeImages())
    bpy.context = FakeContext(scene)
    bpy.app = SimpleNamespace(version=(4, 2, 0), timers=SimpleNamespace())
    return bpy


def install(scene: FakeScene):
    """Install the behavioral fake into sys.modules.  Returns
    (bpy_module, saved_modules) — pass ``saved`` to :func:`uninstall`."""
    saved = {name: sys.modules.get(name) for name in MODULE_NAMES}
    bpy = make_bpy(scene)
    sys.modules["bpy"] = bpy
    sys.modules["bpy.types"] = bpy.types
    sys.modules["bpy.props"] = bpy.props
    sys.modules["bpy.path"] = bpy.path
    sys.modules["bpy.utils"] = bpy.utils
    sys.modules["bpy.ops"] = bpy.ops
    sys.modules["mathutils"] = mu
    import fake_gpu

    sys.modules.update(fake_gpu.make_modules())
    return bpy, saved


def uninstall(saved):
    for name, module in saved.items():
        if module is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = module
    for name in list(sys.modules):
        if name.startswith("polychase_tpu.blender_addon"):
            sys.modules.pop(name, None)
