"""Collision environments: host-side builder + packed device pytree.

The reference stores an environment as a struct-of-arrays of shape lists with
SIMD-broadcast members (reference: src/impl/vamp/collision/environment.hh) and
relies on sorted early-exit during checks (collision/validity.hh:61-67). On
TPU, early exit buys nothing — the idiomatic equivalent is a *padded, masked*
struct-of-arrays pytree with fixed capacities, so one fused kernel checks all
robot spheres against all shapes with a mask-reduce.

`Environment` mirrors the reference's Python builder API (add_sphere,
add_capsule, add_cuboid, add_heightfield, add_pointcloud, attach/detach);
`.pack()` produces the static-shape `PackedEnvironment` consumed by kernels.
Capacities are rounded up to multiples of 8 to bound the number of distinct
compiled shapes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .ops.math import rpy_to_matrix_np


def _round_capacity(n: int, quantum: int = 8) -> int:
    return 0 if n == 0 else max(quantum, -(-n // quantum) * quantum)


# ---------------------------------------------------------------------------
# Shape records (host side)
# ---------------------------------------------------------------------------


@dataclass
class Sphere:
    center: Sequence[float]
    radius: float
    name: str = ""

    @property
    def position(self):  # reference binding exposes .position
        return np.asarray(self.center, np.float32)


@dataclass
class Capsule:
    """Capsule given by endpoint + vector, like the reference's Cylinder
    (reference: collision/shapes.hh:133-220). Use the factory helpers to build
    from center/orientation or endpoints."""

    x1: np.ndarray  # (3,)
    xv: np.ndarray  # (3,)
    radius: float
    name: str = ""

    @staticmethod
    def from_endpoints(p1, p2, radius, name=""):
        p1 = np.asarray(p1, np.float32)
        return Capsule(p1, np.asarray(p2, np.float32) - p1, float(radius), name)

    @staticmethod
    def from_center(center, euler_xyz, radius, length, name=""):
        R = rpy_to_matrix_np(euler_xyz)
        axis = R @ np.array([0.0, 0.0, 1.0], np.float32)
        center = np.asarray(center, np.float32)
        return Capsule(center - axis * (length / 2), axis * length, float(radius), name)


Cylinder = Capsule  # reference aliases these (collision/shapes.hh:223)


@dataclass
class Cuboid:
    """Oriented box: center, three unit axes, half-extents
    (reference: collision/shapes.hh:31-127)."""

    center: np.ndarray
    axes: np.ndarray  # (3,3), rows are unit axes
    half_extents: np.ndarray  # (3,)
    name: str = ""

    @staticmethod
    def from_euler(center, euler_xyz, half_extents, name=""):
        R = rpy_to_matrix_np(euler_xyz)
        return Cuboid(
            np.asarray(center, np.float32), R.T.astype(np.float32),
            np.asarray(half_extents, np.float32), name,
        )


@dataclass
class HeightField:
    """Height image over the XY plane (reference: collision/shapes.hh:249-312).

    data is row-major (yd, xd); world height at (x, y) is zs * data[iy, ix] + z
    with ix = floor(clamp(xs * (x0 - x) + xd/2, 0, xd - 1)).
    """

    origin: np.ndarray  # (3,) offset
    scale: np.ndarray  # (3,) xs, ys, zs
    data: np.ndarray  # (yd, xd) float32
    name: str = ""


@dataclass
class Attachment:
    """Spheres rigidly attached to the end effector
    (reference: collision/attachments.hh). `rot`/`pos` give the attachment
    frame relative to the ee frame; sphere centers are in that frame."""

    pos: np.ndarray  # (3,)
    rot: np.ndarray  # (3,3) relative rotation
    centers: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    radii: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))

    @staticmethod
    def from_quat(pos, quat_xyzw):
        x, y, z, w = [float(v) for v in quat_xyzw]
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ],
            np.float32,
        )
        return Attachment(pos=np.asarray(pos, np.float32), rot=R)

    def add_sphere(self, center, radius):
        self.centers = np.concatenate(
            [self.centers, np.asarray(center, np.float32).reshape(1, 3)], axis=0
        )
        self.radii = np.concatenate([self.radii, np.asarray([radius], np.float32)])


# ---------------------------------------------------------------------------
# Packed device representation
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedEnvironment:
    """Static-capacity SoA environment pytree (all f32 except masks).

    Empty slots are masked out; padded shape parameters are chosen so padded
    entries can never collide (far-away centers), which keeps the kernels free
    of NaN-producing math on padding.
    """

    sphere_xyzr: jnp.ndarray  # (NS, 4)
    sphere_mask: jnp.ndarray  # (NS,) bool
    capsule_p1: jnp.ndarray  # (NC, 3)
    capsule_v: jnp.ndarray  # (NC, 3)
    capsule_r: jnp.ndarray  # (NC,)
    capsule_rdv: jnp.ndarray  # (NC,) 1/|v|^2
    capsule_mask: jnp.ndarray  # (NC,) bool
    cuboid_center: jnp.ndarray  # (NB, 3)
    cuboid_axes: jnp.ndarray  # (NB, 3, 3)
    cuboid_half: jnp.ndarray  # (NB, 3)
    cuboid_mask: jnp.ndarray  # (NB,) bool
    hf_data: jnp.ndarray  # (NH, HY, HX)
    hf_origin: jnp.ndarray  # (NH, 3)
    hf_scale: jnp.ndarray  # (NH, 3)
    hf_mask: jnp.ndarray  # (NH,) bool
    attach_centers: jnp.ndarray  # (NA, 3) in attachment frame
    attach_radii: jnp.ndarray  # (NA,)
    attach_mask: jnp.ndarray  # (NA,) bool
    attach_pos: jnp.ndarray  # (3,) attachment frame rel. ee
    attach_rot: jnp.ndarray  # (3,3)
    # Vectorized sphere cloud: many-sphere obstacle sets (e.g. swept robot
    # volumes for prioritized multi-robot planning) checked as one batched
    # chunked kernel instead of per-slot unrolled shapes. (M, 4) xyzr.
    cloud_xyzr: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0, 4), jnp.float32))
    cloud_mask: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0,), bool))
    # CAPT pointcloud trees (ops/capt.py); tuple of CAPT pytrees
    capts: tuple = ()
    # Z-aligned specializations (reference environment.hh keeps separate
    # z_aligned_capsules / z_aligned_cuboids lists and validity.hh routes
    # them to cheaper kernels — sphere_capsule.hh:26-44, sphere_cuboid.hh
    # z-case). pack() auto-classifies; in MBM every capsule and 98% of
    # cuboids are z-aligned, so the cheap paths carry nearly the whole env
    # sweep (~35%/29% fewer large ops per obstacle).
    zcap_p1: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0, 3), jnp.float32))  # bottom endpoint
    zcap_h: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0,), jnp.float32))  # +z axis length
    zcap_r: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0,), jnp.float32))
    zcap_mask: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0,), bool))
    zcub_center: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    zcub_axis: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0, 2), jnp.float32))  # in-plane x-axis (c, s)
    zcub_half: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0, 3), jnp.float32))  # (h_ax, h_perp, h_z)
    zcub_mask: jnp.ndarray = field(default_factory=lambda: jnp.zeros((0,), bool))

    @property
    def has_attachments(self) -> bool:
        # slot axis is last (leading axes may be lane batches)
        return bool(self.attach_mask.shape[-1])


FAR = 1.0e6  # padded shapes live far away with tiny radius

_Z_TOL = 1e-6  # relative tolerance for z-alignment classification


def _classify_capsule(c):
    """(bottom_p1, height, radius) when the capsule axis is +-z, else None."""
    v = np.asarray(c.xv, np.float64)
    n = float(np.linalg.norm(v))
    if n > 0 and abs(v[0]) <= _Z_TOL * n and abs(v[1]) <= _Z_TOL * n:
        p1 = np.asarray(c.x1, np.float64)
        if v[2] >= 0:
            return p1.astype(np.float32), float(v[2]), float(c.radius)
        return (p1 + v).astype(np.float32), float(-v[2]), float(c.radius)
    return None


def _classify_cuboid(c):
    """(center, in-plane x-axis (c,s), (h_ax, h_perp, h_z)) when one box axis
    is +-z (free in-plane rotation), else None."""
    A = np.asarray(c.axes, np.float64)
    h = np.asarray(c.half_extents, np.float64)
    for r in range(3):
        if abs(abs(A[r, 2]) - 1.0) <= _Z_TOL:
            others = [i for i in range(3) if i != r]
            if all(abs(A[i, 2]) <= _Z_TOL for i in others):
                i, j = others
                return (
                    np.asarray(c.center, np.float32),
                    A[i, :2].astype(np.float32),
                    np.asarray([h[i], h[j], h[r]], np.float32),
                )
    return None


class Environment:
    """Host-side environment builder mirroring the reference Python API
    (reference: bindings/environment.cc)."""

    def __init__(self):
        self.spheres: List[Sphere] = []
        self.capsules: List[Capsule] = []
        self.cuboids: List[Cuboid] = []
        self.heightfields: List[HeightField] = []
        self.attachment: Optional[Attachment] = None
        self.pointclouds: List = []  # CAPT objects (ops/capt.py)
        self.clouds: List[np.ndarray] = []  # (M, 4) xyzr sphere clouds

    # -- builder API -------------------------------------------------------
    def add_sphere(self, sphere: Sphere):
        self.spheres.append(sphere)

    def add_capsule(self, capsule: Capsule):
        self.capsules.append(capsule)

    add_cylinder = add_capsule

    def add_cuboid(self, cuboid: Cuboid):
        self.cuboids.append(cuboid)

    def add_heightfield(self, hf: HeightField):
        self.heightfields.append(hf)

    def attach(self, attachment: Attachment):
        self.attachment = attachment

    def detach(self):
        self.attachment = None

    def add_pointcloud(self, points, r_min: float, r_max: float, point_radius: float) -> float:
        """Build a CAPT over `points` and add it. Returns build time (ns),
        mirroring reference bindings/environment.cc:148-159."""
        import time

        from .ops.capt import build_capt

        start = time.perf_counter_ns()
        self.pointclouds.append(build_capt(np.asarray(points, np.float32), r_min, r_max, point_radius))
        return float(time.perf_counter_ns() - start)

    def add_sphere_cloud(self, centers, radii):
        """Add a batch of spheres checked as one vectorized cloud (no per-slot
        unrolling; for swept robot volumes / very many spheres)."""
        centers = np.asarray(centers, np.float32).reshape(-1, 3)
        radii = np.broadcast_to(np.asarray(radii, np.float32), centers.shape[:1])
        self.clouds.append(np.concatenate([centers, radii[:, None]], axis=1))

    def sort(self):
        """No-op for API parity: sorted early-exit (reference
        collision/environment.hh:40-66) has no TPU equivalent — the packed
        kernel mask-reduces over every shape."""

    def class_counts(self) -> dict:
        """Per-class slot counts this environment will pack into (z-aligned
        capsules/cuboids split into their cheap-kernel lists) — use for
        computing shared `capacities` when stacking many environments."""
        zc = sum(_classify_capsule(c) is not None for c in self.capsules)
        zb = sum(_classify_cuboid(c) is not None for c in self.cuboids)
        return {
            "spheres": len(self.spheres),
            "capsules": len(self.capsules) - zc,
            "z_capsules": zc,
            "cuboids": len(self.cuboids) - zb,
            "z_cuboids": zb,
        }

    # -- packing -----------------------------------------------------------
    def pack(self, quantum: int = 8, capacities: Optional[dict] = None) -> PackedEnvironment:
        """Pack to a static-capacity pytree. `capacities` (keys: spheres,
        capsules, z_capsules, cuboids, z_cuboids) forces minimum slot counts
        so environments of different sizes stack into one lane-batched
        pytree. Z-aligned capsules/cuboids are auto-routed to their cheap
        specialized lists (reference environment.hh z_aligned_* lists)."""
        caps = capacities or {}
        zcaps, gcaps, zcubs, gcubs = [], [], [], []
        for c in self.capsules:
            z = _classify_capsule(c)
            (zcaps if z is not None else gcaps).append((c, z))
        for c in self.cuboids:
            z = _classify_cuboid(c)
            (zcubs if z is not None else gcubs).append((c, z))
        ns = max(_round_capacity(len(self.spheres), quantum), caps.get("spheres", 0))
        nc = max(_round_capacity(len(gcaps), quantum), caps.get("capsules", 0))
        nb = max(_round_capacity(len(gcubs), quantum), caps.get("cuboids", 0))
        nzc = max(_round_capacity(len(zcaps), quantum), caps.get("z_capsules", 0))
        nzb = max(_round_capacity(len(zcubs), quantum), caps.get("z_cuboids", 0))

        sphere_xyzr = np.full((ns, 4), FAR, np.float32)
        sphere_xyzr[:, 3] = 0.0
        sphere_mask = np.zeros(ns, bool)
        for i, s in enumerate(self.spheres):
            sphere_xyzr[i, :3] = np.asarray(s.center, np.float32)
            sphere_xyzr[i, 3] = s.radius
            sphere_mask[i] = True

        capsule_p1 = np.full((nc, 3), FAR, np.float32)
        capsule_v = np.zeros((nc, 3), np.float32)
        capsule_v[:, 2] = 1.0
        capsule_r = np.zeros(nc, np.float32)
        capsule_rdv = np.ones(nc, np.float32)
        capsule_mask = np.zeros(nc, bool)
        for i, (c, _) in enumerate(gcaps):
            capsule_p1[i] = c.x1
            capsule_v[i] = c.xv
            capsule_r[i] = c.radius
            capsule_rdv[i] = 1.0 / max(float(np.dot(c.xv, c.xv)), 1e-12)
            capsule_mask[i] = True

        zcap_p1 = np.full((nzc, 3), FAR, np.float32)
        zcap_h = np.ones(nzc, np.float32)
        zcap_r = np.zeros(nzc, np.float32)
        zcap_mask = np.zeros(nzc, bool)
        for i, (_, (p1, h, r)) in enumerate(zcaps):
            zcap_p1[i] = p1
            zcap_h[i] = h
            zcap_r[i] = r
            zcap_mask[i] = True

        cuboid_center = np.full((nb, 3), FAR, np.float32)
        cuboid_axes = np.tile(np.eye(3, dtype=np.float32), (nb, 1, 1))
        cuboid_half = np.zeros((nb, 3), np.float32)
        cuboid_mask = np.zeros(nb, bool)
        for i, (c, _) in enumerate(gcubs):
            cuboid_center[i] = c.center
            cuboid_axes[i] = c.axes
            cuboid_half[i] = c.half_extents
            cuboid_mask[i] = True

        zcub_center = np.full((nzb, 3), FAR, np.float32)
        zcub_axis = np.zeros((nzb, 2), np.float32)
        zcub_axis[:, 0] = 1.0
        zcub_half = np.zeros((nzb, 3), np.float32)
        zcub_mask = np.zeros(nzb, bool)
        for i, (_, (ctr, ax, hh)) in enumerate(zcubs):
            zcub_center[i] = ctr
            zcub_axis[i] = ax
            zcub_half[i] = hh
            zcub_mask[i] = True

        nh = len(self.heightfields)
        if nh:
            hy = max(h.data.shape[0] for h in self.heightfields)
            hx = max(h.data.shape[1] for h in self.heightfields)
            hf_data = np.full((nh, hy, hx), -FAR, np.float32)
            hf_origin = np.zeros((nh, 3), np.float32)
            hf_scale = np.ones((nh, 3), np.float32)
            hf_mask = np.ones(nh, bool)
            for i, h in enumerate(self.heightfields):
                hf_data[i, : h.data.shape[0], : h.data.shape[1]] = h.data
                hf_origin[i] = h.origin
                hf_scale[i] = h.scale
        else:
            hf_data = np.zeros((0, 1, 1), np.float32)
            hf_origin = np.zeros((0, 3), np.float32)
            hf_scale = np.ones((0, 3), np.float32)
            hf_mask = np.zeros(0, bool)

        att = self.attachment
        na = 0 if att is None else _round_capacity(len(att.radii), quantum) if len(att.radii) else 0
        attach_centers = np.full((na, 3), FAR, np.float32)
        attach_radii = np.zeros(na, np.float32)
        attach_mask = np.zeros(na, bool)
        attach_pos = np.zeros(3, np.float32)
        attach_rot = np.eye(3, dtype=np.float32)
        if att is not None and len(att.radii):
            k = len(att.radii)
            attach_centers[:k] = att.centers
            attach_radii[:k] = att.radii
            attach_mask[:k] = True
            attach_pos = att.pos.astype(np.float32)
            attach_rot = att.rot.astype(np.float32)

        n_cloud = sum(c.shape[0] for c in self.clouds)
        mcap = max(_round_capacity(n_cloud, 128) if n_cloud else 0, caps.get("cloud", 0))
        cloud_xyzr = np.full((mcap, 4), FAR, np.float32)
        cloud_xyzr[:, 3] = 0.0
        cloud_mask = np.zeros(mcap, bool)
        if n_cloud:
            cat = np.concatenate(self.clouds, axis=0)
            cloud_xyzr[:n_cloud] = cat
            cloud_mask[:n_cloud] = True

        return PackedEnvironment(
            sphere_xyzr=jnp.asarray(sphere_xyzr),
            sphere_mask=jnp.asarray(sphere_mask),
            capsule_p1=jnp.asarray(capsule_p1),
            capsule_v=jnp.asarray(capsule_v),
            capsule_r=jnp.asarray(capsule_r),
            capsule_rdv=jnp.asarray(capsule_rdv),
            capsule_mask=jnp.asarray(capsule_mask),
            cuboid_center=jnp.asarray(cuboid_center),
            cuboid_axes=jnp.asarray(cuboid_axes),
            cuboid_half=jnp.asarray(cuboid_half),
            cuboid_mask=jnp.asarray(cuboid_mask),
            hf_data=jnp.asarray(hf_data),
            hf_origin=jnp.asarray(hf_origin),
            hf_scale=jnp.asarray(hf_scale),
            hf_mask=jnp.asarray(hf_mask),
            attach_centers=jnp.asarray(attach_centers),
            attach_radii=jnp.asarray(attach_radii),
            attach_mask=jnp.asarray(attach_mask),
            attach_pos=jnp.asarray(attach_pos),
            attach_rot=jnp.asarray(attach_rot),
            cloud_xyzr=jnp.asarray(cloud_xyzr),
            cloud_mask=jnp.asarray(cloud_mask),
            capts=tuple(self.pointclouds),
            zcap_p1=jnp.asarray(zcap_p1),
            zcap_h=jnp.asarray(zcap_h),
            zcap_r=jnp.asarray(zcap_r),
            zcap_mask=jnp.asarray(zcap_mask),
            zcub_center=jnp.asarray(zcub_center),
            zcub_axis=jnp.asarray(zcub_axis),
            zcub_half=jnp.asarray(zcub_half),
            zcub_mask=jnp.asarray(zcub_mask),
        )


def empty_packed_environment() -> PackedEnvironment:
    return Environment().pack()


def max_class_counts(envs) -> dict:
    """Shared per-class capacities for stacking many environments into one
    lane-batched pytree: elementwise max of each env's class_counts()."""
    out: dict = {}
    for e in envs:
        for k, v in e.class_counts().items():
            out[k] = max(out.get(k, 0), v)
    return out
