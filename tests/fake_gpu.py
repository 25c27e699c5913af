"""Behavioral numpy-backed stand-in for Blender's ``gpu`` module.

Implements enough of the GPU API that the addon's pin-mode renderer and
the 3D-masking offscreen triangle-ID pass run for real:

- ``GPUOffScreen`` owns a software framebuffer (uint8 RGBA color +
  float depth, GL row order: row 0 = bottom);
- ``batch_for_shader(...).draw(shader)`` on a TRIS batch of the ID
  shader **rasterizes** the triangles with the shader's current ``mvp``
  uniform (perspective divide, barycentric coverage at pixel centers,
  LESS depth test) and writes ``gl_PrimitiveID + 1`` little-endian into
  the RGBA channels — the documented encoding of the addon's ID
  fragment shader;
- every other draw is appended to a per-module ``DRAW_LOG`` with a
  snapshot of the shader uniforms and GPU state, so overlay-rendering
  tests can assert pass ordering (depth prepass → biased wireframe →
  pins → circle).

Non-ID shaders are not rasterized: their fragment output is cosmetic
and has no readback path in the addon.
"""

from __future__ import annotations

import contextlib
import types

import numpy as np

# ---------------------------------------------------------------------------
# GPU state + draw log (module-level, reset by install())
# ---------------------------------------------------------------------------

STATE = {
    "depth_test": "NONE",
    "depth_mask": False,
    "blend": "NONE",
    "line_width": 1.0,
    "program_point_size": False,
}
DRAW_LOG: list[dict] = []
_bound_framebuffer = None  # set while an offscreen is bound


def reset():
    STATE.update(
        depth_test="NONE", depth_mask=False, blend="NONE",
        line_width=1.0, program_point_size=False,
    )
    DRAW_LOG.clear()
    global _bound_framebuffer
    _bound_framebuffer = None


# ---------------------------------------------------------------------------
# Framebuffer / offscreen
# ---------------------------------------------------------------------------


class FakeBuffer:
    def __init__(self, array):
        self._a = np.asarray(array)

    def to_list(self):
        return self._a.tolist()


class FakeFramebuffer:
    def __init__(self, width, height):
        self.width = width
        self.height = height
        # GL convention: row 0 is the bottom scanline.
        self.color = np.zeros((height, width, 4), np.uint8)
        self.depth = np.ones((height, width), np.float32)

    def clear(self, color=None, depth=None):
        if color is not None:
            self.color[:] = (
                np.clip(np.asarray(color, np.float32) * 255.0 + 0.5, 0, 255)
                .astype(np.uint8)
            )
        if depth is not None:
            self.depth[:] = float(depth)

    def read_color(self, x, y, xsize, ysize, channels, slot, fmt):
        assert fmt == "UBYTE" and channels == 4 and slot == 0
        return FakeBuffer(self.color[y:y + ysize, x:x + xsize, :channels])


class GPUOffScreen:
    def __init__(self, width, height):
        self.framebuffer = FakeFramebuffer(width, height)
        self.freed = False

    @contextlib.contextmanager
    def bind(self):
        global _bound_framebuffer
        prev = _bound_framebuffer
        _bound_framebuffer = self.framebuffer
        try:
            yield
        finally:
            _bound_framebuffer = prev

    def free(self):
        self.freed = True


# ---------------------------------------------------------------------------
# Shaders
# ---------------------------------------------------------------------------


class GPUShader:
    def __init__(self, vertexcode="", fragcode="", info=None):
        self.vertexcode = vertexcode
        self.fragcode = fragcode
        self.info = info
        self.uniforms: dict = {}
        self.bound = 0

    @property
    def is_id_shader(self):
        return "gl_PrimitiveID" in self.fragcode and "fragColor = vec4(" in (
            self.fragcode
        )

    def bind(self):
        self.bound += 1

    def _set(self, name, value):
        try:
            value = np.array(value, np.float64)
        except (TypeError, ValueError):
            pass
        self.uniforms[name] = value

    uniform_float = _set
    uniform_int = _set

    def uniform_bool(self, name, value):
        self.uniforms[name] = bool(value)

    def uniform_block(self, name, ubo):
        self.uniforms[name] = ubo


class GPUShaderCreateInfo:
    """Records the declarative shader build (create_from_info target)."""

    def __init__(self):
        self.vert = ""
        self.frag = ""
        self.typedefs = []
        self.attrs = []
        self.outs = []
        self.constants = []
        self.ubos = []

    def vertex_source(self, src):
        self.vert = src

    def fragment_source(self, src):
        self.frag = src

    def typedef_source(self, src):
        self.typedefs.append(src)

    def vertex_in(self, slot, gltype, name):
        self.attrs.append((slot, gltype, name))

    def fragment_out(self, slot, gltype, name):
        self.outs.append((slot, gltype, name))

    def push_constant(self, gltype, name):
        self.constants.append((gltype, name))

    def uniform_buf(self, slot, typename, name):
        self.ubos.append((slot, typename, name))


class GPUUniformBuf:
    def __init__(self, data):
        self.data = bytes(data)


def create_from_info(info: GPUShaderCreateInfo) -> GPUShader:
    return GPUShader(info.vert, info.frag, info=info)


# ---------------------------------------------------------------------------
# Rasterizer (ID pass only)
# ---------------------------------------------------------------------------


def _rasterize_ids(fb, mvp, verts, tris):
    """Software TRIS pass writing (primitive_id+1) as LE RGBA uint8."""
    v = np.asarray(verts, np.float64).reshape(-1, 3)
    clip = np.c_[v, np.ones(len(v))] @ np.asarray(mvp, np.float64).T
    w = clip[:, 3]
    h_px, w_px = fb.height, fb.width
    depth_test = STATE["depth_test"] in ("LESS", "LESS_EQUAL")
    for prim_id, tri in enumerate(np.asarray(tris).reshape(-1, 3)):
        if np.any(w[tri] <= 1e-9):
            continue  # behind the eye; no near clipping in the fake
        ndc = clip[tri, :3] / w[tri, None]
        # GL viewport transform, bottom-origin rows
        px = (ndc[:, 0] + 1.0) * 0.5 * w_px
        py = (ndc[:, 1] + 1.0) * 0.5 * h_px
        pz = ndc[:, 2]
        x0 = max(int(np.floor(px.min() - 0.5)), 0)
        x1 = min(int(np.ceil(px.max() - 0.5)) + 1, w_px)
        y0 = max(int(np.floor(py.min() - 0.5)), 0)
        y1 = min(int(np.ceil(py.max() - 0.5)) + 1, h_px)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = np.arange(x0, x1) + 0.5
        ys = np.arange(y0, y1) + 0.5
        xx, yy = np.meshgrid(xs, ys)
        ax, ay = px[0], py[0]
        bx, by = px[1], py[1]
        cx, cy = px[2], py[2]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area) < 1e-12:
            continue
        w0 = ((bx - xx) * (cy - yy) - (by - yy) * (cx - xx)) / area
        w1 = ((cx - xx) * (ay - yy) - (cy - yy) * (ax - xx)) / area
        w2 = 1.0 - w0 - w1
        eps = -1e-9
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not inside.any():
            continue
        z = w0 * pz[0] + w1 * pz[1] + w2 * pz[2]
        tile = fb.depth[y0:y1, x0:x1]
        if depth_test:
            passed = inside & (z < tile)
        else:
            passed = inside
        if not passed.any():
            continue
        if STATE["depth_mask"]:
            tile[passed] = z[passed]
        packed = np.uint32(prim_id + 1)
        rgba = np.array(
            [
                packed & 0xFF,
                (packed >> 8) & 0xFF,
                (packed >> 16) & 0xFF,
                (packed >> 24) & 0xFF,
            ],
            np.uint8,
        )
        fb.color[y0:y1, x0:x1][passed] = rgba


# ---------------------------------------------------------------------------
# Batches
# ---------------------------------------------------------------------------


class FakeBatch:
    def __init__(self, shader, prim_type, attrs, indices=None):
        self.prim_type = prim_type
        self.attrs = attrs
        self.indices = indices

    def draw(self, shader):
        DRAW_LOG.append(
            {
                "type": self.prim_type,
                "shader": shader,
                "uniforms": dict(shader.uniforms),
                "state": dict(STATE),
                "n_verts": len(next(iter(self.attrs.values()))),
                "n_indices": None
                if self.indices is None else len(self.indices),
            }
        )
        if (
            self.prim_type == "TRIS"
            and shader.is_id_shader
            and _bound_framebuffer is not None
            and self.indices is not None
        ):
            _rasterize_ids(
                _bound_framebuffer,
                shader.uniforms["mvp"],
                self.attrs["position"],
                self.indices,
            )


def batch_for_shader(shader, prim_type, attrs, indices=None):
    return FakeBatch(shader, prim_type, attrs, indices)


# ---------------------------------------------------------------------------
# Module assembly
# ---------------------------------------------------------------------------


def make_modules():
    """Build ``gpu`` / ``gpu_extras`` module objects for sys.modules."""
    reset()

    gpu = types.ModuleType("gpu")

    gpu_types = types.ModuleType("gpu.types")
    gpu_types.GPUShader = GPUShader
    gpu_types.GPUShaderCreateInfo = GPUShaderCreateInfo
    gpu_types.GPUOffScreen = GPUOffScreen
    gpu_types.GPUUniformBuf = GPUUniformBuf
    gpu_types.GPUBatch = FakeBatch

    gpu_state = types.ModuleType("gpu.state")

    def active_framebuffer_get():
        assert _bound_framebuffer is not None, "no offscreen bound"
        return _bound_framebuffer

    gpu_state.active_framebuffer_get = active_framebuffer_get
    gpu_state.depth_test_set = lambda v: STATE.update(depth_test=v)
    gpu_state.depth_mask_set = lambda v: STATE.update(depth_mask=bool(v))
    gpu_state.blend_set = lambda v: STATE.update(blend=v)
    gpu_state.line_width_set = lambda v: STATE.update(line_width=float(v))
    gpu_state.program_point_size_set = lambda v: STATE.update(
        program_point_size=bool(v)
    )

    gpu_shader = types.ModuleType("gpu.shader")
    gpu_shader.create_from_info = create_from_info

    gpu.types = gpu_types
    gpu.state = gpu_state
    gpu.shader = gpu_shader

    gpu_extras = types.ModuleType("gpu_extras")
    gpu_extras_batch = types.ModuleType("gpu_extras.batch")
    gpu_extras_batch.batch_for_shader = batch_for_shader
    gpu_extras.batch = gpu_extras_batch

    return {
        "gpu": gpu,
        "gpu.types": gpu_types,
        "gpu.state": gpu_state,
        "gpu.shader": gpu_shader,
        "gpu_extras": gpu_extras,
        "gpu_extras.batch": gpu_extras_batch,
    }
