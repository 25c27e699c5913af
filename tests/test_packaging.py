"""Packaging: the Blender addon zip is self-contained and importable."""

import subprocess
import sys
import zipfile


def test_addon_zip_importable(tmp_path):
    out = tmp_path / "addon.zip"
    subprocess.run(
        [sys.executable, "scripts/package_addon.py", str(out)],
        check=True, capture_output=True,
    )
    names = zipfile.ZipFile(out).namelist()
    assert "__init__.py" in names
    assert "blender_manifest.toml" in names   # extension spec: at the root
    assert "polychase_tpu/api.py" in names
    assert "polychase_tpu/blender_addon/addon.py" in names
    assert any(n.endswith("native/bvh.cc") for n in names)

    extract = tmp_path / "x"
    zipfile.ZipFile(out).extractall(extract)
    code = f"""
import sys
from unittest import mock
mods = ["bpy", "bpy.types", "bpy.props", "bpy.utils", "bpy.path",
        "mathutils", "gpu", "gpu.types", "gpu.state", "gpu.shader",
        "gpu_extras", "gpu_extras.batch"]
for name in mods:
    m = mock.MagicMock(name=name)
    m.types.PropertyGroup = type("PG", (), {{}})
    m.types.Operator = type("Op", (), {{}})
    m.types.Panel = type("Pl", (), {{}})
    m.types.UIList = type("UL", (), {{}})
    sys.modules[name] = m
extract_dir = {str(extract)!r}
import os, importlib.util
spec = importlib.util.spec_from_file_location(
    "polychase", os.path.join(extract_dir, "__init__.py"))
import jax; jax.config.update("jax_platforms", "cpu")
polychase = importlib.util.module_from_spec(spec)
spec.loader.exec_module(polychase)
assert polychase.bl_info["name"]
assert callable(polychase.register)
print("OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
