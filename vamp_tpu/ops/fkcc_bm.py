"""Batch-minor fused FK + collision kernels — the performance path.

Layout rationale: a TPU vector register is (8 sublanes, 128 lanes) with the
minor-most array axis on lanes. The naive FK formulation (vmap over per-config
3x3 matmuls) puts size-3 tensor axes in the lane dimension — ~3/128 VPU
utilization. This module keeps the BATCH axis minor everywhere, exactly like
the reference keeps its 8 SIMD lanes minor in every generated expression
(robots/panda/fk.hh operates on FloatVector<rake> scalars-of-lanes):

- a rotation is nine (B,) arrays; composing with a constant origin rotation is
  scalar-coefficient linear combinations of (B,) arrays;
- sphere centers are (S, B) planes per coordinate;
- narrow-phase checks broadcast (shapes, S, B) and mask-reduce.

Every op is elementwise over the minor batch axis -> full lane utilization.
XLA fuses the whole thing into a handful of kernels. This is the same program
the reference's codegen emits, with B lanes instead of 8.

Public surface matches ops.fkcc: `make_fkcc(spec)` -> `fkcc(qs (B, dim), env,
base_rot, base_pos) -> valid (B,)`, plus `make_fkcc_bm` for callers that
already hold configs batch-minor (dim, B) and want to skip the transpose.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..env import PackedEnvironment
from ..robots.spec import FIXED, PRISMATIC, REVOLUTE, RobotSpec


_PI = 3.14159265359


def sin_poly(v):
    """The reference's polynomial sine (vector/interface.hh:442-456), valid on
    [-pi, pi]. ~7x cheaper than jnp.sin on TPU and matches reference numerics."""
    v_sq = v * jnp.abs(v)
    p = -0.478637850138 * v_sq + 1.503684069359 * v
    abs_p = jnp.abs(p)
    p_2 = p * abs_p
    p_3 = p_2 * abs_p
    return 0.011596870476 * p_3 + 0.140024078368 * p_2 + 0.665200679751 * p


def _wrap_pi(v):
    """Range-reduce one turn: (-2pi, 2pi) -> [-pi, pi]."""
    v = jnp.where(v > _PI, v - 2.0 * _PI, v)
    return jnp.where(v < -_PI, v + 2.0 * _PI, v)


def fast_sin(v):
    return sin_poly(_wrap_pi(v))


def fast_cos(v):
    """Reference cosine: shift by pi/2 and wrap (interface.hh:462-469)."""
    return fast_sin(v + _PI / 2.0)


class Rot:
    """Rotation as nine (B,) arrays (possibly python-float constants)."""

    __slots__ = ("m",)

    def __init__(self, m):
        self.m = m  # 3x3 nested list of scalars or (B,) arrays

    @staticmethod
    def identity():
        return Rot([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])

    @staticmethod
    def const(mat) -> "Rot":
        return Rot([[float(mat[i][j]) for j in range(3)] for i in range(3)])

    def __matmul__(self, other: "Rot") -> "Rot":
        a, b = self.m, other.m
        out = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                acc = 0.0
                for k in range(3):
                    term = _mul(a[i][k], b[k][j])
                    acc = _add(acc, term)
                out[i][j] = acc
        return Rot(out)

    def apply(self, v) -> list:
        """Rotate a 3-list of scalars/(B,) arrays."""
        return [
            _add(_add(_mul(self.m[i][0], v[0]), _mul(self.m[i][1], v[1])), _mul(self.m[i][2], v[2]))
            for i in range(3)
        ]


def _mul(a, b):
    if isinstance(a, float) and a == 0.0:
        return 0.0
    if isinstance(b, float) and b == 0.0:
        return 0.0
    if isinstance(a, float) and a == 1.0:
        return b
    if isinstance(b, float) and b == 1.0:
        return a
    return a * b


def _add(a, b):
    if isinstance(a, float) and a == 0.0:
        return b
    if isinstance(b, float) and b == 0.0:
        return a
    return a + b


def _axis_rot(axis, c, s) -> Rot:
    """Rotation about a constant axis with traced cos/sin (B,) arrays.

    Specializes principal axes (the overwhelmingly common case in URDFs) so
    the 3x3 contains mostly constants — the constant-folding in _mul/_add then
    prunes the chain composition like the reference's codegen does.
    """
    x, y, z = float(axis[0]), float(axis[1]), float(axis[2])
    if (x, y, z) == (1.0, 0.0, 0.0):
        return Rot([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
    if (x, y, z) == (-1.0, 0.0, 0.0):
        return Rot([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])
    if (x, y, z) == (0.0, 1.0, 0.0):
        return Rot([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    if (x, y, z) == (0.0, -1.0, 0.0):
        return Rot([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
    if (x, y, z) == (0.0, 0.0, 1.0):
        return Rot([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    if (x, y, z) == (0.0, 0.0, -1.0):
        return Rot([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    one_c = 1.0 - c
    return Rot(
        [
            [one_c * (x * x) + c, one_c * (x * y) - s * z, one_c * (x * z) + s * y],
            [one_c * (x * y) + s * z, one_c * (y * y) + c, one_c * (y * z) - s * x],
            [one_c * (x * z) - s * y, one_c * (y * z) + s * x, one_c * (z * z) + c],
        ]
    )


def _chain_bm(
    spec: RobotSpec, q_rows: List, base_rot: Optional[Rot], base_pos,
    native_trig: bool = False,
):
    """Per-frame (Rot, [tx,ty,tz]) with all entries scalars or (B,) arrays.

    `native_trig` swaps the reference's 16-op polynomial sin/cos
    (interface.hh:442-469, kept for bit parity on the default path) for
    jnp.sin/jnp.cos — one XLA op each and MORE accurate. On the target
    device op count, not transcendental cost, is what's priced, so the
    throughput solver uses native trig (documented deviation)."""
    sin_f = jnp.sin if native_trig else fast_sin
    cos_f = jnp.cos if native_trig else fast_cos
    Rs: List[Rot] = []
    ts: List[list] = []
    for op in spec.ops:
        if op.parent < 0:
            Rp = base_rot if base_rot is not None else Rot.identity()
            tp = base_pos
        else:
            Rp, tp = Rs[op.parent], ts[op.parent]
        R = Rp @ Rot.const(op.origin_rot)
        off = Rp.apply([float(v) for v in op.origin_xyz])
        t = [_add(tp[i], off[i]) for i in range(3)]
        if op.jtype == REVOLUTE:
            qi = q_rows[op.qi]
            R = R @ _axis_rot(op.axis, cos_f(qi), sin_f(qi))
        elif op.jtype == PRISMATIC:
            qi = q_rows[op.qi]
            d = R.apply([float(a) for a in op.axis])
            t = [_add(t[i], _mul(d[i], qi)) for i in range(3)]
        Rs.append(R)
        ts.append(t)
    return Rs, ts


def make_sphere_fk_bm(spec: RobotSpec, native_trig: bool = False):
    """`fk(q (dim, B), base_rot?, base_pos?) -> (xs, ys, zs) each (S, B)`.

    base_rot: optional (3,3); base_pos: optional (3,). Both may be traced.

    Sphere transforms are batched PER FRAME: a frame's S_f constant centers
    apply to its (traced) rotation entries as (S_f, 1, ..) numpy constants
    broadcast against the batch — 18 array ops per FRAME instead of 18 per
    sphere. On the target device every op materializes (no fusion), so the
    per-sphere formulation's ~1060 (batch,)-sized ops were ~75% of the whole
    fkcc cost (measured; see benchmarks/loop_micro.py round 3).
    """
    S = spec.n_spheres
    # frame -> sphere indices, in first-appearance order
    by_frame: Dict[int, List[int]] = {}
    for i, f in enumerate(spec.sphere_frame.tolist()):
        by_frame.setdefault(int(f), []).append(i)
    order = [i for idxs in by_frame.values() for i in idxs]
    perm = np.argsort(np.asarray(order))  # concat row -> spec sphere order
    identity_order = bool(np.all(np.asarray(order) == np.arange(S)))

    def fk(q, base_rot=None, base_pos=None):
        """q: (dim, ...batch) — any trailing batch shape; elementwise over it."""
        bshape = q.shape[1:]
        ones = (1,) * len(bshape)
        q_rows = [q[i] for i in range(q.shape[0])]
        br = None if base_rot is None else Rot([[base_rot[i, j] for j in range(3)] for i in range(3)])
        bp = [0.0, 0.0, 0.0] if base_pos is None else [base_pos[0], base_pos[1], base_pos[2]]
        Rs, ts = _chain_bm(spec, q_rows, br, bp, native_trig)

        def as_plane(v, S_f):
            # -> (S_f, *bshape) array from scalar/np-const/traced expr
            if isinstance(v, (float, int)):
                return jnp.full((S_f,) + bshape, float(v), q.dtype)
            if isinstance(v, np.ndarray):
                return jnp.broadcast_to(
                    jnp.asarray(v.astype(np.float32)), (S_f,) + bshape
                )
            return jnp.broadcast_to(v, (S_f,) + bshape)

        xs, ys, zs = [], [], []
        for f, idxs in by_frame.items():
            S_f = len(idxs)
            centers = spec.sphere_center[idxs]  # (S_f, 3) numpy
            cs = [centers[:, k].reshape((S_f,) + ones) for k in range(3)]
            if f < 0:
                R, t = br, bp
            else:
                R, t = Rs[f], ts[f]
            if R is None:
                w = [_add(cs[i], t[i]) for i in range(3)]
            else:
                w = [
                    _add(
                        _add(
                            _add(_mul(R.m[i][0], cs[0]), _mul(R.m[i][1], cs[1])),
                            _mul(R.m[i][2], cs[2]),
                        ),
                        t[i],
                    )
                    for i in range(3)
                ]
            xs.append(as_plane(w[0], S_f))
            ys.append(as_plane(w[1], S_f))
            zs.append(as_plane(w[2], S_f))
        xs = jnp.concatenate(xs)
        ys = jnp.concatenate(ys)
        zs = jnp.concatenate(zs)
        if not identity_order:
            p = jnp.asarray(perm)
            xs, ys, zs = xs[p], ys[p], zs[p]
        return xs, ys, zs

    return fk


def make_ee_bm(spec: RobotSpec, native_trig: bool = False):
    """`ee(q (dim, B), ...) -> (R rows 3x3 of (B,), t 3 of (B,))`."""

    def ee(q, base_rot=None, base_pos=None):
        q_rows = [q[i] for i in range(q.shape[0])]
        br = None if base_rot is None else Rot([[base_rot[i, j] for j in range(3)] for i in range(3)])
        bp = [0.0, 0.0, 0.0] if base_pos is None else [base_pos[0], base_pos[1], base_pos[2]]
        Rs, ts = _chain_bm(spec, q_rows, br, bp, native_trig)
        return Rs[spec.ee_frame], ts[spec.ee_frame]

    return ee


# ---------------------------------------------------------------------------
# Batch-minor collision checks
# ---------------------------------------------------------------------------


def _env_hits_bm(xs, ys, zs, radii_col, env: PackedEnvironment, batched_env: bool = False):
    """Any (sphere, shape) collision. xs/ys/zs: (S, B); radii_col: (S, 1).
    Returns (B,) bool. Semantics identical to ops.collision (reference
    narrow-phase, collision iff signed sq-dist < 0).

    Shape lists unroll in Python (capacities are static and small) so each
    term is an elementwise (S, B) expression sharing the sphere planes —
    XLA fuses the whole OR-tree into one pass over xs/ys/zs instead of
    materializing (shapes, S, B) broadcast temps. Trailing batch shape is
    arbitrary (callers pass (S, 8, B/8) tiles for full sublane utilization).

    With `batched_env`, every env leaf carries a leading lane axis L and the
    trailing batch axis of xs/ys/zs is L (configs are (dim, T, L)) — shape
    parameters then broadcast per lane on the minor axis.
    """
    hit = jnp.zeros(xs.shape[1:], bool)

    def p(arr, j, *rest):
        # parameter lookup: scalar (single env) or (L,) (batched envs)
        return arr[(slice(None), j) + rest] if batched_env else arr[(j,) + rest]

    n_spheres = env.sphere_mask.shape[-1]
    n_capsules = env.capsule_mask.shape[-1]
    n_cuboids = env.cuboid_mask.shape[-1]
    n_zcaps = env.zcap_mask.shape[-1]
    n_zcubs = env.zcub_mask.shape[-1]

    # |p|^2 plane shared by the sphere + capsule sweeps: folding the obstacle
    # constants (|c|^2, rs^2, the mask) into ONE per-obstacle comparison
    # constant cuts the big (S, *batch)-sized op count per obstacle from ~11
    # to 8 (spheres) / ~24 to 20 (capsules). Op count x bytes is what the
    # target device prices (memory: axon-device-cost-model); the algebra is
    # identical, fp rounding differs by ~ulp(|c|^2) — far below the
    # resolution-32 contract. Masked/padded obstacles fold to -inf (compare
    # never true; NaN lhs from padded garbage also compares False).
    if n_spheres or n_capsules:
        P2 = xs * xs + ys * ys + zs * zs
    NEG = jnp.float32(-np.inf)

    for j in range(n_spheres):
        ex, ey, ez, er = (p(env.sphere_xyzr, j, k) for k in range(4))
        rs = radii_col + er
        # d^2 < rs^2  <=>  |p|^2 - 2 p.c  <  rs^2 - |c|^2
        kk = jnp.where(
            p(env.sphere_mask, j), rs * rs - (ex * ex + ey * ey + ez * ez), NEG
        )
        dot2 = xs * (ex + ex) + ys * (ey + ey) + zs * (ez + ez)
        hit = hit | jnp.any(P2 - dot2 < kk, axis=0)

    for j in range(n_capsules):
        v0, v1, v2 = (p(env.capsule_v, j, k) for k in range(3))
        p1x, p1y, p1z = (p(env.capsule_p1, j, k) for k in range(3))
        rdv = p(env.capsule_rdv, j)
        rr = radii_col + p(env.capsule_r, j)
        # per-obstacle scalars/(L,) rows — negligible next to (S, *batch) ops
        vv = v0 * v0 + v1 * v1 + v2 * v2
        p1v = p1x * v0 + p1y * v1 + p1z * v2
        p1sq = p1x * p1x + p1y * p1y + p1z * p1z
        kk = jnp.where(p(env.capsule_mask, j), rr * rr - p1sq, NEG)
        # d^2 = |p-p1|^2 - (2s - w) * w / |v|^2 with s = (p-p1).v,
        # w = clamp(s, 0, |v|^2)  (equivalent to the clamped-projection form;
        # a zero-length live capsule would yield NaN -> no hit, but packed
        # capsules always have |v| > 0)
        s = xs * v0 + ys * v1 + zs * v2 - p1v
        w = jnp.clip(s, 0.0, vv)
        dotp1 = xs * (p1x + p1x) + ys * (p1y + p1y) + zs * (p1z + p1z)
        lhs = P2 - dotp1 - (s + s - w) * w * rdv
        hit = hit | jnp.any(lhs < kk, axis=0)

    # -- z-aligned specializations (reference sphere_capsule.hh:26-44,
    # sphere_cuboid.hh z-case; routed at pack() like environment.cc:117-143).
    # ~13 vs 20 (capsule) and ~25 vs 35 (cuboid) large ops per obstacle.
    rc2 = radii_col * radii_col if (n_zcubs or n_cuboids) else None

    for j in range(n_zcaps):
        cx, cy, z1 = (p(env.zcap_p1, j, k) for k in range(3))
        hj = p(env.zcap_h, j)
        rr = radii_col + p(env.zcap_r, j)
        kk = jnp.where(p(env.zcap_mask, j), rr * rr, NEG)
        dx = xs - cx
        dy = ys - cy
        sz = zs - z1
        ez = sz - jnp.clip(sz, 0.0, hj)
        hit = hit | jnp.any(dx * dx + dy * dy + ez * ez < kk, axis=0)

    for j in range(n_zcubs):
        cx, cy, cz = (p(env.zcub_center, j, k) for k in range(3))
        axc, axs = p(env.zcub_axis, j, 0), p(env.zcub_axis, j, 1)
        h0, h1, h2 = (p(env.zcub_half, j, k) for k in range(3))
        kk = jnp.where(p(env.zcub_mask, j), rc2, NEG)
        # fold the center into per-axis constants (in-plane rotation (c,s))
        k0 = cx * axc + cy * axs
        k1 = cy * axc - cx * axs
        px = xs * axc + (ys * axs - k0)
        py = ys * axc - (xs * axs + k1)
        e0 = jnp.maximum(jnp.abs(px) - h0, 0.0)
        e1 = jnp.maximum(jnp.abs(py) - h1, 0.0)
        e2 = jnp.maximum(jnp.abs(zs - cz) - h2, 0.0)
        hit = hit | jnp.any(e0 * e0 + e1 * e1 + e2 * e2 < kk, axis=0)

    for j in range(n_cuboids):
        dx = xs - p(env.cuboid_center, j, 0)
        dy = ys - p(env.cuboid_center, j, 1)
        dz = zs - p(env.cuboid_center, j, 2)
        sq = 0.0
        for a in range(3):
            proj = (
                dx * p(env.cuboid_axes, j, a, 0)
                + dy * p(env.cuboid_axes, j, a, 1)
                + dz * p(env.cuboid_axes, j, a, 2)
            )
            d = jnp.maximum(jnp.abs(proj) - p(env.cuboid_half, j, a), 0.0)
            sq = sq + d * d
        h = jnp.any(sq - radii_col * radii_col < 0, axis=0)
        hit = hit | (h & p(env.cuboid_mask, j))

    n_hf = env.hf_mask.shape[-1]
    if n_hf:
        # Index clamp is [0, xd-1] / [0, yd-1]. The reference clamps the
        # *float* to [0, xd] then floors (sphere_heightfield.hh:20-21), so a
        # saturated coordinate produces index xd == one-past-the-row — an
        # out-of-bounds read (next row's first texel, or past the buffer on
        # the last row). Knowingly fixed here; in-bounds queries agree
        # exactly (pinned by tests/test_golden_parity.py heightfield case).
        for i in range(n_hf):
            yd, xd = env.hf_data.shape[-2:]
            ox, oy, oz = (p(env.hf_origin, i, k) for k in range(3))
            sx, sy, sz = (p(env.hf_scale, i, k) for k in range(3))
            xo = ox - xs
            yo = oy - ys
            ix = jnp.clip(jnp.floor(sx * xo + xd // 2), 0, xd - 1).astype(jnp.int32)
            iy = jnp.clip(jnp.floor(sy * yo + yd // 2), 0, yd - 1).astype(jnp.int32)
            if batched_env:
                # per-lane height image: gather with the lane index broadcast
                # on the minor axis (data (L, yd, xd); ix/iy (..., L))
                lane = jax.lax.broadcasted_iota(jnp.int32, ix.shape, ix.ndim - 1)
                zh = env.hf_data[:, i][lane, iy, ix]
            else:
                zh = env.hf_data[i][iy, ix]
            zhs = sz * zh + oz
            h = (zs - radii_col - zhs < 0) & p(env.hf_mask, i)
            hit = hit | jnp.any(h, axis=0)

    M = env.cloud_mask.shape[-1]
    if M:
        # Vectorized sphere cloud, chunked so the (S, C, *batch) temp stays
        # bounded. Padded entries sit at FAR with radius 0 (mask redundant but
        # kept for stacked lane-batched envs with differing live counts).
        bshape = xs.shape[1:]
        if batched_env:
            L = env.cloud_xyzr.shape[0]
            c_all = jnp.moveaxis(env.cloud_xyzr, 0, -1)  # (M, 4, L)
            m_all = jnp.moveaxis(env.cloud_mask, 0, -1)  # (M, L)
            tail = (1,) * (len(bshape) - 1) + (L,)
        else:
            c_all, m_all = env.cloud_xyzr, env.cloud_mask
            tail = (1,) * len(bshape)
        for m0 in range(0, M, 128):
            k = min(128, M - m0)
            ex = c_all[m0 : m0 + k, 0].reshape((1, k) + tail)
            ey = c_all[m0 : m0 + k, 1].reshape((1, k) + tail)
            ez = c_all[m0 : m0 + k, 2].reshape((1, k) + tail)
            er = c_all[m0 : m0 + k, 3].reshape((1, k) + tail)
            cm = m_all[m0 : m0 + k].reshape((1, k) + tail)
            dx = xs[:, None] - ex
            dy = ys[:, None] - ey
            dz = zs[:, None] - ez
            rs = radii_col[:, None] + er
            h = (dx * dx + dy * dy + dz * dz - rs * rs < 0) & cm
            hit = hit | jnp.any(h, axis=(0, 1))

    if env.capts:
        from .capt import capt_collides_bm

        # Lane-batched envs carry lane-batched CAPTs (built per lane, padded
        # to a common shape by ops.capt.stack_capts / pytree stacking); the
        # query then indexes (lane, node) per level.
        for capt in env.capts:
            hit = hit | capt_collides_bm(capt, xs, ys, zs, radii_col)

    return hit


def _pair_blocks(spec: RobotSpec, pairs: np.ndarray):
    """Recover dense (linkA x linkB) slice blocks from an expanded sphere-pair
    table. Self-pair tables are all-pairs expansions over link pairs (see
    robots.spec.build_spec), and each link's spheres are contiguous, so the
    check can use static slices (fusable) instead of gathers (which force XLA
    to materialize (P, B) temps). Returns None if the structure doesn't hold
    (e.g. hand-written pair lists) — callers then fall back to gathers."""
    link_of = spec.sphere_link_names
    ranges = {}
    for i, ln in enumerate(link_of):
        s, c = ranges.get(ln, (i, 0))
        if s + c != i:
            return None  # non-contiguous link spheres
        ranges[ln] = (s, c + 1)
    blocks: Dict[Tuple[str, str], set] = {}
    for i, k in pairs:
        blocks.setdefault((link_of[i], link_of[k]), set()).add((int(i), int(k)))
    out = []
    for (la, lb), ps in blocks.items():
        sa, na = ranges[la]
        sb, nb = ranges[lb]
        if len(ps) != na * nb:
            return None  # partial block
        out.append((sa, na, sb, nb))
    return out


def _self_hits_blocks(xs, ys, zs, radii, blocks):
    """Self collision via static per-link-pair slice blocks (no gathers)."""
    hit = jnp.zeros(xs.shape[1:], bool)
    ones = (1,) * (xs.ndim - 1)
    for (sa, na, sb, nb) in blocks:
        xa = xs[sa : sa + na, None]
        ya = ys[sa : sa + na, None]
        za = zs[sa : sa + na, None]
        xb = xs[None, sb : sb + nb]
        yb = ys[None, sb : sb + nb]
        zb = zs[None, sb : sb + nb]
        dx = xa - xb
        dy = ya - yb
        dz = za - zb
        rs = jnp.asarray(
            radii[sa : sa + na, None] + radii[None, sb : sb + nb]
        ).reshape((na, nb) + ones)
        hit = hit | jnp.any(dx * dx + dy * dy + dz * dz - rs * rs < 0, axis=(0, 1))
    return hit


def _self_hits_bm(xs, ys, zs, radii, pairs: np.ndarray):
    """Enabled fine-pair self collision, batch-minor (gather fallback).
    pairs: (P, 2) numpy."""
    if pairs.shape[0] == 0:
        return jnp.zeros(xs.shape[1:], bool)
    i = jnp.asarray(pairs[:, 0])
    k = jnp.asarray(pairs[:, 1])
    dx = xs[i] - xs[k]
    dy = ys[i] - ys[k]
    dz = zs[i] - zs[k]
    rs = jnp.asarray(radii[pairs[:, 0]] + radii[pairs[:, 1]]).reshape(
        (-1,) + (1,) * (xs.ndim - 1)
    )
    return jnp.any(dx * dx + dy * dy + dz * dz - rs * rs < 0, axis=0)


def _make_checker(spec: RobotSpec, native_trig: bool = False):
    """Shared core: `check(q (dim, *batch), env, base_rot, base_pos) -> valid
    (*batch,)`, supporting single (scalar-param) and lane-batched envs (every
    env leaf with a leading L axis; then the MINOR batch axis of q is L)."""
    fk = make_sphere_fk_bm(spec, native_trig)
    ee = make_ee_bm(spec, native_trig)
    radii = spec.sphere_radius
    radii_col = jnp.asarray(radii).reshape(-1, 1, 1)
    pairs = spec.self_pairs
    pa = spec.self_pairs_attach if spec.self_pairs_attach is not None else pairs
    attach_vs = np.asarray(
        [i for i, f in enumerate(spec.sphere_frame.tolist()) if f in set(spec.attach_check_frames)],
        np.int32,
    )
    blocks = _pair_blocks(spec, pairs) if pairs.size else []
    blocks_attach = _pair_blocks(spec, pa) if pa.size else []

    def _self(xs, ys, zs, use_attach):
        p = pa if use_attach else pairs
        b = blocks_attach if use_attach else blocks
        if not p.size:
            return jnp.zeros(xs.shape[1:], bool)
        if b is not None:
            return _self_hits_blocks(xs, ys, zs, radii, b)
        return _self_hits_bm(xs, ys, zs, radii, p)

    # Sphere-axis chunking for the env sweep: XLA splits the full
    # (S x shapes) elementwise tree into many fusions that each re-read the
    # whole (S, *batch) sphere-position tensors from HBM; chunking bounds the
    # re-read working set to SCHUNK spheres per fusion group. 0 disables.
    import os as _os

    _SCHUNK = int(_os.environ.get("VAMP_FKCC_SPHERE_CHUNK", "16"))

    def _env_hits(xs, ys, zs, rcol, env, batched):
        S = xs.shape[0]
        if not _SCHUNK or S <= _SCHUNK:
            return _env_hits_bm(xs, ys, zs, rcol, env, batched_env=batched)
        hit = jnp.zeros(xs.shape[1:], bool)
        for s0 in range(0, S, _SCHUNK):
            s1 = min(s0 + _SCHUNK, S)
            hit = hit | _env_hits_bm(
                xs[s0:s1], ys[s0:s1], zs[s0:s1], rcol[s0:s1], env,
                batched_env=batched,
            )
        return hit

    _FKCC_DISABLE = set(
        filter(None, _os.environ.get("VAMP_FKCC_DISABLE", "").split(","))
    )
    if _FKCC_DISABLE:
        # A leaked profiling env var must never become a silent safety
        # kill-switch: every checker built while it is set reports colliding
        # states valid.
        import warnings

        warnings.warn(
            f"VAMP_FKCC_DISABLE={sorted(_FKCC_DISABLE)} — collision checking "
            "is PARTIALLY DISABLED in this checker (profiling stub, "
            "benchmarks/step_profile.py). Planners built now will accept "
            "colliding states.",
            stacklevel=2,
        )

    def check(q, env: PackedEnvironment, base_rot=None, base_pos=None):
        batched = env.sphere_xyzr.ndim == 3
        bshape = q.shape[1:]
        ones = (1,) * len(bshape)
        rcol = jnp.asarray(radii).reshape((-1,) + ones)
        xs, ys, zs = fk(q, base_rot, base_pos)
        if "env" in _FKCC_DISABLE:  # profiling stub (benchmarks/step_profile)
            hit = jnp.any(xs + ys + zs < -1e30, axis=0)
        else:
            hit = _env_hits(xs, ys, zs, rcol, env, batched)
        if "self" not in _FKCC_DISABLE:
            hit = hit | _self(xs, ys, zs, env.has_attachments)

        if env.has_attachments:
            R, t = ee(q, base_rot, base_pos)

            def ap(arr, *idx):
                # attachment param: scalar (single env) or (L,) (batched)
                return arr[(slice(None),) + idx] if batched else arr[idx]

            ax_list, ay_list, az_list = [], [], []
            NA = env.attach_centers.shape[-2]
            for j in range(NA):
                c = [ap(env.attach_centers, j, k) for k in range(3)]
                loc = [
                    ap(env.attach_rot, 0, 0) * c[0] + ap(env.attach_rot, 0, 1) * c[1]
                    + ap(env.attach_rot, 0, 2) * c[2] + ap(env.attach_pos, 0),
                    ap(env.attach_rot, 1, 0) * c[0] + ap(env.attach_rot, 1, 1) * c[1]
                    + ap(env.attach_rot, 1, 2) * c[2] + ap(env.attach_pos, 1),
                    ap(env.attach_rot, 2, 0) * c[0] + ap(env.attach_rot, 2, 1) * c[1]
                    + ap(env.attach_rot, 2, 2) * c[2] + ap(env.attach_pos, 2),
                ]
                w = R.apply(loc)
                ax_list.append(_add(w[0], t[0]))
                ay_list.append(_add(w[1], t[1]))
                az_list.append(_add(w[2], t[2]))
            axs = jnp.stack([jnp.broadcast_to(v, bshape) for v in ax_list])
            ays = jnp.stack([jnp.broadcast_to(v, bshape) for v in ay_list])
            azs = jnp.stack([jnp.broadcast_to(v, bshape) for v in az_list])
            masked_r = jnp.where(env.attach_mask, env.attach_radii, 0.0)
            if batched:
                ar = jnp.moveaxis(masked_r, 0, -1).reshape((-1,) + ones[:-1] + (masked_r.shape[0],))
                amask1 = jnp.moveaxis(env.attach_mask, 0, -1)
                amask = amask1.reshape((-1, 1) + ones[:-1] + (masked_r.shape[0],))
            else:
                ar = masked_r.reshape((-1,) + ones)
                amask = env.attach_mask.reshape((-1, 1) + ones)
            ahit = _env_hits_bm(axs, ays, azs, ar, env, batched_env=batched)
            if attach_vs.size:
                rx = xs[jnp.asarray(attach_vs)]  # (K, *bshape)
                ry = ys[jnp.asarray(attach_vs)]
                rz = zs[jnp.asarray(attach_vs)]
                rr = jnp.asarray(radii[attach_vs]).reshape((1, -1) + ones)
                dx = axs[:, None] - rx[None]
                dy = ays[:, None] - ry[None]
                dz = azs[:, None] - rz[None]
                rs = ar[:, None] + rr
                h = (dx * dx + dy * dy + dz * dz - rs * rs < 0) & amask
                ahit = ahit | jnp.any(h, axis=(0, 1))
            hit = hit | ahit

        return jnp.logical_not(hit)

    return check


def make_fkcc_bm(spec: RobotSpec):
    """`fkcc_bm(q (dim, B), env, base_rot?, base_pos?) -> valid (B,)`."""
    check = _make_checker(spec)

    def fkcc_bm(q, env: PackedEnvironment, base_rot=None, base_pos=None):
        # Tile the batch axis 2D: (dim, B) -> (dim, 8, ceil(B/8)) so every
        # elementwise intermediate fills all 8 sublanes of the VPU (a flat
        # (B,) array maps to T(1,128) tiles — 1/8 utilization).
        B = q.shape[1]
        B8 = -(-B // 8)
        qt = jnp.pad(q, ((0, 0), (0, B8 * 8 - B))).reshape(q.shape[0], 8, B8)
        valid_t = check(qt, env, base_rot, base_pos)
        return valid_t.reshape(8 * B8)[:B]

    return fkcc_bm


def make_fkcc_planner(spec: RobotSpec, native_trig: bool = False):
    """Planner-facing checker: `fkcc(q (dim, T, L), envs, base_rot?, base_pos?)
    -> valid (T, L)` where envs may be a single env (scalar params) or a
    lane-batched env pytree (leading L on every leaf). The caller owns the
    layout: L minor (lanes), T in sublanes — no internal retiling."""
    return _make_checker(spec, native_trig)


def make_fkcc(spec: RobotSpec):
    """Drop-in for ops.fkcc.make_fkcc with the batch-minor compute path:
    `fkcc(qs (B, dim), env, base_rot?, base_pos?) -> (B,) valid`."""
    fkcc_bm = make_fkcc_bm(spec)

    def fkcc(qs, env: PackedEnvironment, base_rot=None, base_pos=None):
        return fkcc_bm(qs.T, env, base_rot, base_pos)

    return fkcc
