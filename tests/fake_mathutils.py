"""Minimal numpy-backed stand-in for Blender's ``mathutils``.

Implements just enough of Matrix / Vector / Quaternion for the addon's
transform math so the scale-folding logic can be unit-tested without
Blender (semantics follow mathutils: column-major compose order,
WXYZ quaternions, ``decompose`` -> (loc, rot, scale)).
"""

from __future__ import annotations

import numpy as np


class Vector:
    def __init__(self, seq=(0.0, 0.0, 0.0)):
        self._v = np.array([float(x) for x in seq], np.float64)

    def __getitem__(self, i):
        return self._v[i]

    def __len__(self):
        return len(self._v)

    def __iter__(self):
        return iter(self._v.tolist())

    def __add__(self, other):
        return Vector(self._v + np.asarray(Vector(other)._v))

    def __sub__(self, other):
        return Vector(self._v - Vector(other)._v)

    def __neg__(self):
        return Vector(-self._v)

    def __mul__(self, s):
        return Vector(self._v * float(s))

    __rmul__ = __mul__

    def __truediv__(self, s):
        return Vector(self._v / float(s))

    @property
    def length(self):
        return float(np.linalg.norm(self._v))

    def normalized(self):
        return Vector(self._v / max(np.linalg.norm(self._v), 1e-30))

    def copy(self):
        return Vector(self._v)

    def to_4d(self):
        return Vector(list(self._v) + [1.0])

    def to_tuple(self):
        return tuple(self._v.tolist())

    @property
    def x(self):
        return self._v[0]

    @property
    def y(self):
        return self._v[1]

    @property
    def z(self):
        return self._v[2]


class Quaternion:
    """WXYZ quaternion with mathutils-like operators."""

    def __init__(self, wxyz=(1.0, 0.0, 0.0, 0.0)):
        q = np.array([float(x) for x in wxyz], np.float64)
        self._q = q / np.linalg.norm(q)

    @property
    def w(self):
        return self._q[0]

    @property
    def x(self):
        return self._q[1]

    @property
    def y(self):
        return self._q[2]

    @property
    def z(self):
        return self._q[3]

    def __iter__(self):
        return iter(self._q.tolist())

    def inverted(self):
        w, x, y, z = self._q
        return Quaternion((w, -x, -y, -z))

    def to_matrix3(self):
        w, x, y, z = self._q
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w),
                 1 - 2 * (x * x + y * y)],
            ]
        )

    def to_euler(self, order="XYZ"):
        """XYZ euler of the rotation (R = Rz·Ry·Rx, Blender's default)."""
        assert order == "XYZ"
        m = self.to_matrix3()
        x = np.arctan2(m[2, 1], m[2, 2])
        y = np.arctan2(-m[2, 0], np.hypot(m[0, 0], m[1, 0]))
        z = np.arctan2(m[1, 0], m[0, 0])
        return Euler((x, y, z))

    def __matmul__(self, other):
        if isinstance(other, Quaternion):
            w1, x1, y1, z1 = self._q
            w2, x2, y2, z2 = other._q
            return Quaternion(
                (
                    w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                    w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                    w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                    w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                )
            )
        if isinstance(other, Vector):
            return Vector(self.to_matrix3() @ other._v)
        raise TypeError(type(other))


class Euler:
    """XYZ euler angles (radians)."""

    def __init__(self, xyz=(0.0, 0.0, 0.0), order="XYZ"):
        assert order == "XYZ"
        self._e = np.array([float(v) for v in xyz], np.float64)

    def __iter__(self):
        return iter(self._e.tolist())

    def __getitem__(self, i):
        return self._e[i]

    def to_quaternion(self):
        x, y, z = self._e
        cx, sx = np.cos(x), np.sin(x)
        cy, sy = np.cos(y), np.sin(y)
        cz, sz = np.cos(z), np.sin(z)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        m4 = np.eye(4)
        m4[:3, :3] = rz @ ry @ rx
        return Matrix(m4).decompose()[1]


class Matrix:
    def __init__(self, rows=None):
        if rows is None:
            self._m = np.eye(4)
        else:
            self._m = np.array(rows, np.float64).reshape(4, 4)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def Identity(n=4):
        assert n == 4
        return Matrix()

    @staticmethod
    def Diagonal(vec):
        return Matrix(np.diag(np.asarray(list(vec), np.float64)))

    @staticmethod
    def LocRotScale(loc, rot, scale):
        m = np.eye(4)
        r = (
            rot.to_matrix3()
            if isinstance(rot, Quaternion)
            else np.asarray(rot, np.float64)
        )
        s = (
            np.ones(3)
            if scale is None
            else np.asarray(list(scale), np.float64)
        )
        m[:3, :3] = r * s[None, :]
        if loc is not None:
            m[:3, 3] = np.asarray(list(loc), np.float64)
        return Matrix(m)

    # -- accessors ----------------------------------------------------------

    def __matmul__(self, other):
        if isinstance(other, Matrix):
            return Matrix(self._m @ other._m)
        if isinstance(other, Vector):
            v = np.append(np.asarray(list(other)), 1.0)
            return Vector((self._m @ v)[:3])
        raise TypeError(type(other))

    def inverted(self):
        return Matrix(np.linalg.inv(self._m))

    def copy(self):
        return Matrix(self._m)

    @property
    def translation(self):
        return Vector(self._m[:3, 3])

    def to_quaternion(self):
        return self.decompose()[1]

    def to_scale(self):
        return Vector(np.linalg.norm(self._m[:3, :3], axis=0))

    def decompose(self):
        loc = Vector(self._m[:3, 3])
        r = self._m[:3, :3].copy()
        scale = np.linalg.norm(r, axis=0)
        rot_m = r / scale[None, :]
        # matrix -> quaternion (Shepperd)
        t = np.trace(rot_m)
        if t > 0:
            w = np.sqrt(1.0 + t) / 2.0
            x = (rot_m[2, 1] - rot_m[1, 2]) / (4 * w)
            y = (rot_m[0, 2] - rot_m[2, 0]) / (4 * w)
            z = (rot_m[1, 0] - rot_m[0, 1]) / (4 * w)
        else:
            i = int(np.argmax(np.diag(rot_m)))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(1.0 + rot_m[i, i] - rot_m[j, j] - rot_m[k, k]) * 2
            q = np.empty(4)
            q[i + 1] = s / 4
            q[0] = (rot_m[k, j] - rot_m[j, k]) / s
            q[j + 1] = (rot_m[j, i] + rot_m[i, j]) / s
            q[k + 1] = (rot_m[k, i] + rot_m[i, k]) / s
            w, x, y, z = q
        return loc, Quaternion((w, x, y, z)), Vector(scale)

    def __getitem__(self, i):
        return self._m[i]

    def __array__(self, dtype=None):
        return self._m.astype(dtype) if dtype else self._m.copy()

    def __iter__(self):
        return iter(self._m.tolist())
