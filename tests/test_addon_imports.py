"""Blender addon smoke tests: all modules import and register-tables are
well formed under a stubbed bpy environment (no Blender here)."""

import importlib
import sys
from unittest import mock

import pytest


BPY_MODULES = [
    "bpy", "bpy.types", "bpy.props", "bpy.utils", "bpy.path",
    "mathutils", "gpu", "gpu.types", "gpu.state", "gpu.shader",
    "gpu_extras", "gpu_extras.batch",
]

ADDON_MODULES = [
    "polychase_tpu.blender_addon",
    "polychase_tpu.blender_addon.utils",
    "polychase_tpu.blender_addon.properties",
    "polychase_tpu.blender_addon.keyframes",
    "polychase_tpu.blender_addon.background_images",
    "polychase_tpu.blender_addon.core",
    "polychase_tpu.blender_addon.operators.analysis",
    "polychase_tpu.blender_addon.operators.tracking",
    "polychase_tpu.blender_addon.operators.refiner",
    "polychase_tpu.blender_addon.operators.keyframe_management",
    "polychase_tpu.blender_addon.operators.tracker_management",
    "polychase_tpu.blender_addon.operators.scene_operations",
    "polychase_tpu.blender_addon.operators.pin_mode.pin_mode",
    "polychase_tpu.blender_addon.operators.pin_mode.rendering",
    "polychase_tpu.blender_addon.operators.pin_mode.masking_3d",
    "polychase_tpu.blender_addon.ui.panels",
    "polychase_tpu.blender_addon.addon",
]


@pytest.fixture
def stub_bpy():
    saved = {name: sys.modules.get(name) for name in BPY_MODULES}

    class FakePropertyGroup:
        pass

    class FakeOperator:
        pass

    class FakePanel:
        pass

    class FakeUIList:
        pass

    bpy = mock.MagicMock(name="bpy")
    bpy.types.PropertyGroup = FakePropertyGroup
    bpy.types.Operator = FakeOperator
    bpy.types.Panel = FakePanel
    bpy.types.UIList = FakeUIList

    for name in BPY_MODULES:
        sys.modules[name] = mock.MagicMock(name=name)
    sys.modules["bpy"] = bpy
    sys.modules["bpy.types"] = bpy.types
    sys.modules["bpy.props"] = bpy.props
    yield bpy
    for name, module in saved.items():
        if module is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = module
    for name in ADDON_MODULES:
        sys.modules.pop(name, None)


def test_addon_modules_import(stub_bpy):
    for name in ADDON_MODULES:
        module = importlib.import_module(name)
        assert module is not None, name


def test_operator_tables(stub_bpy):
    from polychase_tpu.blender_addon import addon

    names = set()
    for cls in addon._OPERATOR_CLASSES:
        idname = getattr(cls, "bl_idname", None)
        assert idname and idname.startswith("polychase."), cls
        assert idname not in names, f"duplicate {idname}"
        names.add(idname)
    # every operator referenced by the panels exists
    assert len(names) >= 20


def test_panel_table(stub_bpy):
    from polychase_tpu.blender_addon.ui import panels

    ids = [
        getattr(cls, "bl_idname", cls.__name__) for cls in panels.CLASSES
    ]
    assert len(ids) == len(set(ids))
    assert len(panels.CLASSES) == 9  # UIList + 8 panels
