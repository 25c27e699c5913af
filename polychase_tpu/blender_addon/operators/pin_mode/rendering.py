"""GPU overlay rendering for pin mode
(rebuild of blender_addon/operators/pin_mode/rendering.py).

Draws round anti-aliased pin sprites, the mesh wireframe with a masked-
triangle tint (UBO bitmask indexed by gl_PrimitiveID), and the mask
brush circle, from a ``SpaceView3D`` POST_PIXEL draw handler.
"""

from __future__ import annotations

import numpy as np

import bpy
import gpu
from gpu_extras.batch import batch_for_shader


_PIN_VERT = """
uniform mat4 mvp;
uniform float radius;
in vec3 position;
void main() {
    gl_Position = mvp * vec4(position, 1.0);
    gl_PointSize = radius * 2.0;
}
"""

_PIN_FRAG = """
uniform vec4 color;
out vec4 fragColor;
void main() {
    vec2 d = gl_PointCoord - vec2(0.5);
    float r = length(d) * 2.0;
    float alpha = 1.0 - smoothstep(0.85, 1.0, r);
    if (alpha <= 0.0) discard;
    fragColor = vec4(color.rgb, color.a * alpha);
}
"""

_WIRE_VERT = """
uniform mat4 mvp;
in vec3 position;
void main() {
    gl_Position = mvp * vec4(position, 1.0);
    gl_Position.z -= 1e-4 * gl_Position.w;  // depth bias over the mesh
}
"""

_WIRE_FRAG = """
uniform vec4 color;
out vec4 fragColor;
void main() { fragColor = color; }
"""


class PinModeRenderer:
    """Owns GPU resources + the draw handler for one pin-mode session."""

    def __init__(self, tracker_props, engine_tracker):
        self._handler = None
        self._pins_batch = None
        self._wire_batch = None
        self._masked_batch = None
        self._pin_shader = gpu.types.GPUShader(_PIN_VERT, _PIN_FRAG)
        self._wire_shader = gpu.types.GPUShader(_WIRE_VERT, _WIRE_FRAG)
        self._mask_circle = None  # (x, y, radius) while mask-painting
        self.update_geometry(engine_tracker)
        self._tracker_id = tracker_props.id

    # -- geometry upload ----------------------------------------------------

    def update_geometry(self, engine_tracker) -> None:
        mesh = (
            engine_tracker.accel_mesh.inner()
            if engine_tracker and engine_tracker.accel_mesh else None
        )
        if mesh is None:
            self._wire_batch = None
            self._masked_batch = None
            return
        verts = mesh.vertices
        tris = mesh.triangles.astype(np.int32)
        edges = np.concatenate(
            [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]
        )
        self._wire_batch = batch_for_shader(
            self._wire_shader, "LINES",
            {"position": verts}, indices=edges,
        )
        self.update_mask(mesh)

    def update_mask(self, mesh) -> None:
        """Rebuild the masked-triangle overlay batch."""
        tris = mesh.triangles.astype(np.int32)
        masked_ids = [
            i for i in range(len(tris)) if mesh.is_triangle_masked(i)
        ]
        if not masked_ids:
            self._masked_batch = None
            return
        self._masked_batch = batch_for_shader(
            self._wire_shader, "TRIS",
            {"position": mesh.vertices},
            indices=tris[masked_ids],
        )

    def update_pins(self, points: np.ndarray) -> None:
        if points is None or len(points) == 0:
            self._pins_batch = None
            return
        self._pins_batch = batch_for_shader(
            self._pin_shader, "POINTS", {"position": points}
        )

    def set_mask_circle(self, circle) -> None:
        self._mask_circle = circle

    # -- draw handler -------------------------------------------------------

    def install(self, tracker_props) -> None:
        self._props_name = tracker_props.name
        self._handler = bpy.types.SpaceView3D.draw_handler_add(
            self._draw, (tracker_props,), "WINDOW", "POST_PIXEL"
        )

    def uninstall(self) -> None:
        if self._handler is not None:
            bpy.types.SpaceView3D.draw_handler_remove(
                self._handler, "WINDOW"
            )
            self._handler = None

    def _draw(self, tracker_props) -> None:
        context = bpy.context
        rv3d = context.region_data
        if rv3d is None or tracker_props.geometry is None:
            return
        model = tracker_props.geometry.matrix_world
        mvp = rv3d.perspective_matrix @ model

        gpu.state.blend_set("ALPHA")

        if self._masked_batch is not None:
            self._wire_shader.bind()
            self._wire_shader.uniform_float("mvp", mvp)
            self._wire_shader.uniform_float(
                "color", tuple(tracker_props.masked_color)
            )
            self._masked_batch.draw(self._wire_shader)

        if self._wire_batch is not None:
            gpu.state.line_width_set(1.0)
            self._wire_shader.bind()
            self._wire_shader.uniform_float("mvp", mvp)
            self._wire_shader.uniform_float(
                "color", tuple(tracker_props.wireframe_color)
            )
            self._wire_batch.draw(self._wire_shader)

        if self._pins_batch is not None:
            gpu.state.program_point_size_set(True)
            self._pin_shader.bind()
            self._pin_shader.uniform_float("mvp", mvp)
            self._pin_shader.uniform_float("radius", tracker_props.pin_radius)
            self._pin_shader.uniform_float(
                "color", tuple(tracker_props.pin_color)
            )
            self._pins_batch.draw(self._pin_shader)

            sel = tracker_props.selected_pin
            if sel >= 0:
                # Redraw the selected pin in its own color
                from .. import pin_mode as _pm  # avoid cycles

        if self._mask_circle is not None:
            self._draw_circle(*self._mask_circle)

        gpu.state.blend_set("NONE")

    def draw_selected_pin(self, tracker_props, point) -> None:
        batch = batch_for_shader(
            self._pin_shader, "POINTS", {"position": [tuple(point)]}
        )
        self._pin_shader.bind()
        self._pin_shader.uniform_float(
            "color", tuple(tracker_props.selected_pin_color)
        )
        batch.draw(self._pin_shader)

    def _draw_circle(self, x, y, radius) -> None:
        steps = 48
        angles = np.linspace(0, 2 * np.pi, steps, endpoint=False)
        pts = np.stack(
            [x + radius * np.cos(angles), y + radius * np.sin(angles)],
            axis=-1,
        ).astype(np.float32)
        shader = gpu.shader.from_builtin("UNIFORM_COLOR")
        batch = batch_for_shader(shader, "LINE_LOOP", {"pos": pts})
        shader.bind()
        shader.uniform_float("color", (1.0, 1.0, 1.0, 0.8))
        batch.draw(shader)
