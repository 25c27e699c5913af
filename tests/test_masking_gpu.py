"""Executed coverage for the GPU-facing pin-mode pieces on the
behavioral fake gpu (tests/fake_gpu.py):

- ``Masking3DSelector``: the offscreen triangle-ID pass really
  rasterizes (perspective divide, depth test) and the readback decode +
  brush windowing behave like the reference's
  blender_addon/operators/pin_mode/masking_3d.py:17-169;
- ``PinModeRenderer``: the overlay draw handler issues the reference's
  pass sequence (depth prepass with the UBO mask → biased wireframe →
  pins → selection circle, rendering.py:295-323) with the right GPU
  state, and the mask UBO carries the engine's packed bitmask.
"""

import importlib
from types import SimpleNamespace

import numpy as np

import fake_bpy
import fake_gpu
from test_addon_modal import env, rendered  # noqa: F401  (fixtures)


def _mk(env, name):
    return importlib.import_module(
        f"polychase_tpu.blender_addon.operators.pin_mode.{name}"
    )


def _ortho_scene(env, verts, tris, size=64):
    """A unit-box orthographic view of hand-placed triangles."""
    mu = env.mu
    engine_tracker = SimpleNamespace(
        accel_mesh=SimpleNamespace(
            inner=lambda: SimpleNamespace(
                vertices=np.asarray(verts, np.float32),
                triangles=np.asarray(tris, np.uint32),
            )
        )
    )
    tracker_props = SimpleNamespace(
        geometry=SimpleNamespace(matrix_world=mu.Matrix())
    )
    region = SimpleNamespace(width=size, height=size)
    # Identity projection: NDC == object coords; z maps [-1,1].
    rv3d = SimpleNamespace(perspective_matrix=mu.Matrix())
    return engine_tracker, tracker_props, region, rv3d


class TestMasking3DSelector:
    def test_pick_windows_and_background(self, env):
        m3d = _mk(env, "masking_3d")
        size = 64
        # Two side-by-side triangles: left half / right half of NDC.
        verts = [
            [-0.9, -0.5, 0.0], [-0.1, -0.5, 0.0], [-0.5, 0.5, 0.0],
            [0.1, -0.5, 0.0], [0.9, -0.5, 0.0], [0.5, 0.5, 0.0],
        ]
        tris = [[0, 1, 2], [3, 4, 5]]
        et, props, region, rv3d = _ortho_scene(env, verts, tris, size)

        sel = m3d.Masking3DSelector()
        sel.render_ids(et, props, region, rv3d)

        # NDC x=-0.5 → pixel 16; x=+0.5 → pixel 48; y=0 → 32.
        assert list(sel.triangles_under_brush(16, 30, 2)) == [0]
        assert list(sel.triangles_under_brush(48, 30, 2)) == [1]
        both = sel.triangles_under_brush(32, 30, 18)
        assert list(both) == [0, 1]
        # Background: top corner hits nothing.
        assert sel.triangles_under_brush(2, 60, 2).size == 0
        # Off-screen brush windows clamp instead of erroring.
        assert sel.triangles_under_brush(-10, -10, 3).size == 0

        sel.free()
        assert sel._id_buffer is None

    def test_depth_test_picks_nearer_triangle(self, env):
        m3d = _mk(env, "masking_3d")
        # Two overlapping full-screen-ish triangles; the SECOND drawn is
        # NEARER (smaller NDC z). With LESS depth testing the nearer one
        # must win even though it is drawn after.
        verts = [
            [-0.9, -0.9, 0.5], [0.9, -0.9, 0.5], [0.0, 0.9, 0.5],
            [-0.9, -0.9, -0.5], [0.9, -0.9, -0.5], [0.0, 0.9, -0.5],
        ]
        tris = [[0, 1, 2], [3, 4, 5]]
        et, props, region, rv3d = _ortho_scene(env, verts, tris)

        sel = m3d.Masking3DSelector()
        sel.render_ids(et, props, region, rv3d)
        assert list(sel.triangles_under_brush(32, 20, 1)) == [1]

        # Same scene with the near triangle FIRST: still triangle with
        # z=-0.5 (now id 0) — order independence proves the z-buffer.
        et2, props2, region2, rv3d2 = _ortho_scene(
            env, verts, [[3, 4, 5], [0, 1, 2]]
        )
        sel2 = m3d.Masking3DSelector()
        sel2.render_ids(et2, props2, region2, rv3d2)
        assert list(sel2.triangles_under_brush(32, 20, 1)) == [0]

    def test_offscreen_reallocates_on_resize(self, env):
        m3d = _mk(env, "masking_3d")
        verts = [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]
        et, props, region, rv3d = _ortho_scene(env, verts, [[0, 1, 2]])
        sel = m3d.Masking3DSelector()
        sel.render_ids(et, props, region, rv3d)
        first = sel._offscreen
        region.width, region.height = 32, 32
        sel.render_ids(et, props, region, rv3d)
        assert sel._offscreen is not first and first.freed
        assert sel._id_buffer.shape == (32, 32)


class TestPinModeRendererPasses:
    def test_draw_sequence_and_mask_ubo(self, env):
        rendering = _mk(env, "rendering")
        engine_tracker = env.core.Trackers.get(env.tracker)

        # Mask the first polygon so the UBO is non-trivial.
        engine_tracker.mask_polygon(env.tracker, 0, mask=True)
        renderer = rendering.PinModeRenderer(env.tracker, engine_tracker)
        renderer.update_pins(
            np.array([[0.0, 0.0, 1.0], [0.3, 0.2, 0.9]], np.float32)
        )
        renderer.set_mask_circle((100.0, 120.0, 25.0))

        # The UBO holds the engine's packed bitmask (padded to 4096 u32).
        mask_words = np.frombuffer(renderer._mask_ubo.data, np.uint32)
        engine_mask = np.asarray(
            engine_tracker.accel_mesh.inner().masked_triangles, np.uint32
        ).reshape(-1)
        assert mask_words.size == 4096
        assert np.array_equal(mask_words[: engine_mask.size], engine_mask)
        assert mask_words.any()

        env.ctx.screen.areas.append(fake_bpy.FakeView3DArea(640, 480))
        fake_gpu.DRAW_LOG.clear()
        renderer._draw(env.tracker)

        log = fake_gpu.DRAW_LOG
        kinds = [d["type"] for d in log]
        assert kinds == ["TRIS", "LINES", "POINTS", "TRIS"], kinds

        prepass, wire, pins, circle = log
        # Depth prepass: invisible fill, mask tint on, depth writes on.
        assert prepass["uniforms"]["useMask"] is True
        assert prepass["state"]["depth_mask"] is True
        assert prepass["state"]["depth_test"] == "LESS_EQUAL"
        assert tuple(prepass["uniforms"]["color"]) == (0, 0, 0, 0)
        # Wireframe: negative depth bias, no depth writes, mask off.
        assert wire["uniforms"]["useMask"] is False
        assert float(wire["uniforms"]["bias"]) < 0
        assert wire["state"]["depth_mask"] is False
        # Pins: depth testing off so they are always visible.
        assert pins["state"]["depth_test"] == "NONE"
        assert pins["state"]["blend"] == "ALPHA"
        assert pins["n_verts"] == 2
        # Selection circle: full-screen quad with center/radius uniforms.
        assert tuple(circle["uniforms"]["center"]) == (100.0, 120.0)
        assert float(circle["uniforms"]["radius"]) == 25.0

    def test_update_geometry_handles_missing_mesh(self, env):
        rendering = _mk(env, "rendering")
        engine_tracker = env.core.Trackers.get(env.tracker)
        renderer = rendering.PinModeRenderer(env.tracker, engine_tracker)
        renderer.update_geometry(None)
        assert renderer._depth_batch is None and renderer._wire_batch is None
        # Draw with no geometry batches is a no-op, not a crash.
        env.ctx.screen.areas.append(fake_bpy.FakeView3DArea(640, 480))
        fake_gpu.DRAW_LOG.clear()
        renderer._draw(env.tracker)
        assert [d["type"] for d in fake_gpu.DRAW_LOG if d["type"] != "POINTS"] == []
