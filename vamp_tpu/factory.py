"""Shape factories — the reference's full constructor surface
(reference: src/impl/vamp/collision/factory.hh, 424 LoC of namespaced
flat/eigen/array overloads). Python collapses the per-argument-type overloads
(flat scalars / Eigen vectors / arrays all become array-likes), so each
reference namespace maps to one class of staticmethods:

    factory.cuboid.flat(cx, cy, cz, rho, theta, phi, hx, hy, hz)
    factory.cuboid.array(center, euler_xyz, half_extents)
    factory.cuboid.rot(center, rotation_3x3, half_extents)
    factory.cylinder.endpoints(p1, p2, radius)       # == capsule.endpoints
    factory.cylinder.center(center, euler_xyz, radius, length)
    factory.capsule.*                                 (alias of cylinder)
    factory.sphere.flat(x, y, z, r) / .array(center, r)
    factory.heightfield.array(center, scale, data)

Euler convention matches the reference: Rz(phi) @ Ry(theta) @ Rx(rho)
(Eigen AngleAxis composition, factory.hh:38-41). Heightfield scales invert
on construction (factory.hh:365-386: stored scale = 1/scale)."""

from __future__ import annotations

import numpy as np

from .env import Capsule, Cuboid, HeightField, Sphere
from .ops.math import rpy_to_matrix_np


def _euler_rot(rho: float, theta: float, phi: float) -> np.ndarray:
    return rpy_to_matrix_np([rho, theta, phi])


class cuboid:
    @staticmethod
    def flat(cx, cy, cz, rho, theta, phi, hx, hy, hz, name: str = "") -> Cuboid:
        R = _euler_rot(rho, theta, phi)
        return Cuboid(
            center=np.asarray([cx, cy, cz], np.float32),
            axes=R.T.astype(np.float32),  # rows = world-frame box axes
            half_extents=np.asarray([hx, hy, hz], np.float32),
            name=name,
        )

    @staticmethod
    def array(center, euler_xyz, half_extents, name: str = "") -> Cuboid:
        c, e, h = (np.asarray(v, np.float32) for v in (center, euler_xyz, half_extents))
        return cuboid.flat(c[0], c[1], c[2], e[0], e[1], e[2], h[0], h[1], h[2], name)

    eigen = array

    @staticmethod
    def rot(center, rotation, half_extents, name: str = "") -> Cuboid:
        """From a 3x3 rotation (reference eigen_rot, factory.hh:87-92)."""
        R = np.asarray(rotation, np.float32).reshape(3, 3)
        return Cuboid(
            center=np.asarray(center, np.float32),
            axes=R.T.astype(np.float32),
            half_extents=np.asarray(half_extents, np.float32),
            name=name,
        )

    eigen_rot = rot


class cylinder:
    @staticmethod
    def endpoints(p1, p2, radius, name: str = "") -> Capsule:
        """From the two cap centers (factory.hh cylinder::endpoints)."""
        return Capsule.from_endpoints(p1, p2, radius, name)

    @staticmethod
    def endpoints_flat(x1, y1, z1, x2, y2, z2, radius, name: str = "") -> Capsule:
        return Capsule.from_endpoints([x1, y1, z1], [x2, y2, z2], radius, name)

    @staticmethod
    def center(center, euler_xyz, radius, length, name: str = "") -> Capsule:
        """Center + Euler XYZ orientation; caps at +-length/2 along local Z
        (factory.hh:160-180: p1 = tf * (0,0,+l/2), p2 = tf * (0,0,-l/2))."""
        R = _euler_rot(*[float(v) for v in euler_xyz])
        axis = R @ np.asarray([0.0, 0.0, 1.0], np.float32)
        c = np.asarray(center, np.float32)
        p1 = c + axis * (float(length) / 2)
        return Capsule(p1.astype(np.float32), (-axis * float(length)).astype(np.float32),
                       float(radius), name)

    @staticmethod
    def center_flat(cx, cy, cz, rho, theta, phi, radius, length, name: str = "") -> Capsule:
        return cylinder.center([cx, cy, cz], [rho, theta, phi], radius, length, name)

    @staticmethod
    def center_rot(center, rotation, radius, length, name: str = "") -> Capsule:
        R = np.asarray(rotation, np.float32).reshape(3, 3)
        axis = R @ np.asarray([0.0, 0.0, 1.0], np.float32)
        c = np.asarray(center, np.float32)
        p1 = c + axis * (float(length) / 2)
        return Capsule(p1.astype(np.float32), (-axis * float(length)).astype(np.float32),
                       float(radius), name)


capsule = cylinder  # the reference's capsule namespace mirrors cylinder


class sphere:
    @staticmethod
    def flat(x, y, z, radius, name: str = "") -> Sphere:
        return Sphere([float(x), float(y), float(z)], float(radius), name)

    @staticmethod
    def array(center, radius, name: str = "") -> Sphere:
        c = np.asarray(center, np.float32)
        return Sphere(c.tolist(), float(radius), name)

    eigen = array


class heightfield:
    @staticmethod
    def flat(cx, cy, cz, sx, sy, sz, num_x, num_y, data, name: str = "") -> HeightField:
        """Stored scale is the reciprocal (factory.hh:365-386)."""
        arr = np.asarray(data, np.float32).reshape(int(num_y), int(num_x))
        return HeightField(
            origin=np.asarray([cx, cy, cz], np.float32),
            scale=np.asarray([1.0 / sx, 1.0 / sy, 1.0 / sz], np.float32),
            data=arr,
            name=name,
        )

    @staticmethod
    def array(center, scale, data, name: str = "") -> HeightField:
        c = np.asarray(center, np.float32)
        s = np.asarray(scale, np.float32)
        arr = np.asarray(data, np.float32)
        return heightfield.flat(
            c[0], c[1], c[2], s[0], s[1], s[2], arr.shape[1], arr.shape[0], arr, name
        )

    eigen = array
