"""Shared synthetic match-moving scene builders for tests."""

import numpy as np
import jax.numpy as jnp

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.geometry import Mesh


def make_sphere_mesh(n_lat=12, n_lon=16, radius=1.0) -> Mesh:
    """UV-sphere triangle mesh centred at the origin."""
    verts = []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append(
                [
                    radius * np.sin(theta) * np.cos(phi),
                    radius * np.sin(theta) * np.sin(phi),
                    radius * np.cos(theta),
                ]
            )
    verts = np.asarray(verts, np.float32)
    tris = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            # wound so that geometric normals point outward
            if i > 0:
                tris.append([a, c, b])
            if i < n_lat - 1:
                tris.append([b, c, d])
    return Mesh.create(verts, np.asarray(tris, np.uint32))


def make_intrinsics(w=640, h=480, f=600.0, convention=C.OPENCV) -> C.Intrinsics:
    sgn = 1.0 if convention == C.OPENCV else -1.0
    return C.Intrinsics.create(
        fx=sgn * f, fy=sgn * f, cx=w / 2, cy=h / 2,
        aspect_ratio=1.0, width=w, height=h, convention=convention,
    )


def orbit_pose(t: float, dist=4.0) -> P.Pose:
    """World→camera pose orbiting the origin (OpenCV convention: +Z fwd).

    At parameter t the camera sits at angle t on a circle of radius
    ``dist`` in the XZ plane, looking at the origin.
    """
    cx, cz = dist * np.sin(t), -dist * np.cos(t)
    eye = np.array([cx, 0.3 * np.sin(0.7 * t), cz])
    target = np.zeros(3)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # OpenCV: y down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R_wc = np.stack([right, up2, fwd], axis=0)  # world→cam rows
    tvec = -R_wc @ eye
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = R_wc
    mat[:3, 3] = tvec
    return P.pose_from_rt(jnp.asarray(mat))


def project_points(cam: C.CameraState, pts_world: np.ndarray):
    """Project world points; returns (pixels (N,2), in_front (N,) bool)."""
    Z = np.asarray(
        P.pose_apply(
            P.Pose(cam.pose.q[None], cam.pose.t[None]), jnp.asarray(pts_world)
        )
    )
    px = np.asarray(C.project(cam.intrinsics, jnp.asarray(Z)))
    in_front = ~np.asarray(C.is_behind(cam.intrinsics, jnp.asarray(Z)))
    w = float(cam.intrinsics.width)
    h = float(cam.intrinsics.height)
    inside = (
        (px[:, 0] >= 0) & (px[:, 0] < w) & (px[:, 1] >= 0) & (px[:, 1] < h)
    )
    return px.astype(np.float32), in_front & inside


def sample_surface_points(mesh: Mesh, rng, n=300):
    """Random points on the mesh surface with their triangle normals."""
    tris = np.asarray(mesh.triangles)
    verts = np.asarray(mesh.vertices)
    ti = rng.integers(0, len(tris), n)
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    p1 = verts[tris[ti, 0]]
    p2 = verts[tris[ti, 1]]
    p3 = verts[tris[ti, 2]]
    pts = (1 - u - v)[:, None] * p1 + u[:, None] * p2 + v[:, None] * p3
    normals = np.cross(p2 - p1, p3 - p1)
    normals /= np.maximum(
        np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20
    )
    return pts.astype(np.float32), normals.astype(np.float32)


def visible_from(cam: C.CameraState, pts: np.ndarray, normals: np.ndarray):
    """Front-facing test: the surface normal must face the camera."""
    center = np.asarray(P.pose_center(cam.pose))
    view_dir = pts - center[None]
    return np.sum(view_dir * normals, axis=-1) < 0.0
