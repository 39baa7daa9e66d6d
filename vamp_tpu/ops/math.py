"""Small rotation / transform helpers used by the kinematics compiler.

These run at trace time inside jitted FK functions, so they are written as pure
jnp functions over float32 arrays. Conventions follow URDF: rpy is extrinsic
x-y-z (roll, pitch, yaw), i.e. R = Rz(yaw) @ Ry(pitch) @ Rx(roll); quaternions
are (x, y, z, w) to match the reference bindings' output convention
(reference: src/impl/vamp/robots/panda/fk.hh eefk returns x,y,z + xyzw quat).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rpy_to_matrix_np(rpy) -> np.ndarray:
    """Static (host-side) rpy -> 3x3 rotation, used when parsing URDFs."""
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about a (static, unit) axis by a traced angle (Rodrigues).

    axis: (3,) constant; angle: scalar traced. Returns (3, 3).
    """
    x, y, z = axis[0], axis[1], axis[2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    t = 1.0 - c
    return jnp.stack(
        [
            jnp.stack([t * x * x + c, t * x * y - s * z, t * x * z + s * y]),
            jnp.stack([t * x * y + s * z, t * y * y + c, t * y * z - s * x]),
            jnp.stack([t * x * z - s * y, t * y * z + s * x, t * z * z + c]),
        ]
    )


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation -> quaternion (x, y, z, w), w >= 0.

    Branch-free variant (safe under jit): computes all four candidate
    constructions and selects by the largest diagonal-derived norm.
    """
    m00, m01, m02 = m[0, 0], m[0, 1], m[0, 2]
    m10, m11, m12 = m[1, 0], m[1, 1], m[1, 2]
    m20, m21, m22 = m[2, 0], m[2, 1], m[2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate quaternions (unnormalized).
    cand_w = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2])
    cand_x = jnp.stack([qx2, m10 + m01, m02 + m20, m21 - m12])
    cand_y = jnp.stack([m01 + m10, qy2, m21 + m12, m02 - m20])
    cand_z = jnp.stack([m20 + m02, m12 + m21, qz2, m10 - m01])
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=1)  # (4 pivots, 4 comps)

    norms2 = jnp.stack([qx2, qy2, qz2, qw2])
    pivot = jnp.argmax(norms2)
    q = cands[pivot] / (2.0 * jnp.sqrt(jnp.maximum(norms2[pivot], 1e-12)))
    # Canonicalize sign: w >= 0.
    return jnp.where(q[3] < 0, -q, q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (x,y,z,w) quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (...,3) by quaternion q (x,y,z,w)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)
