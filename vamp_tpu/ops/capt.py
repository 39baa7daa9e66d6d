"""CAPT: Collision-Affording Point Tree for pointcloud collision queries.

Redesign of the reference CAPT (collision/capt.hh, paper arXiv:2406.02807)
for TPU:

- BUILD (host, numpy; mirrors capt.hh:327-398): points pad to 2^k with +inf
  sentinels; median splits on cyclic dimensions produce a heap-ordered test
  array; each leaf (one representative point) carries an "affordance buffer"
  — every point within r_max + r_point of the leaf cell — plus an AABB.
  Affordance buffers are padded to the max leaf occupancy so the device query
  is a fixed-size gather (the bounded-candidate-list design is exactly what
  makes CAPT TPU-amenable, SURVEY §2.2).

- QUERY (device, batch-minor): all query spheres descend the implicit tree in
  lockstep (capt.hh:457-541's `idx = 2*idx + 1 + (c >= tests[idx])` with the
  split dimension cycling x,y,z) — re-grouped into 3-LEVEL SUPERNODES: the
  host packs each supernode's 7 tests into one contiguous 8-float row
  (`supertests`), so three binary levels cost ONE row gather + elementwise
  selects instead of three serialized 4-byte element gathers (small-element
  gathers are the device's pathological path — the round-4 affordance-scan
  finding; this cuts nlog2=13 descent phases to 5). Then one fixed-size
  gather of the leaf's affordance points and a mask-reduce. No pointer
  chasing.

Queries must use radii within [r_min, r_max] (same contract as the
reference). Collision iff any tree point lies within r + r_point.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

FAR = 1.0e9

# Affordance-gather bound, in points resident at once. Peak live memory is
# NOT just the 12 B/point gathered rows: with no cross-op fusion on this
# device the dx/dy/dz differences (12 B/pt), their squares (12 B/pt), and the
# pre-reduce hit mask (~1 B/pt) all materialize too — ~37 B/point live, so
# 6 Mi points ~= 230 MB peak (comparable to the old 8 Mi-element chunked
# scan's bound; advisor round-4 finding). Shapes over this stream S-axis
# chunks with identical per-chunk temporaries (patchable in tests).
_GATHER_BUDGET = 6 * 1024 * 1024


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CAPT:
    tests: jnp.ndarray  # (2^k - 1,) split values, heap order
    leaf_points: jnp.ndarray  # (n_leaves, max_aff, 3) affordance buffers (FAR padded)
    leaf_aabb: jnp.ndarray  # (n_leaves, 2, 3) lower/upper
    top_aabb: jnp.ndarray  # (2, 3)
    point_radius: jnp.ndarray  # () f32
    # 3-level supernode rows: ((8^(k//3) - 1)/7, 8) — row (s, m) holds the 7
    # tests of the supernode rooted at binary level 3s, local index m, in
    # [root, left, right, ll, lr, rl, rr, FAR] order (module docstring).
    supertests: jnp.ndarray = None
    nlog2: int = field(metadata=dict(static=True), default=0)  # descent depth


def _super_tests(tests: np.ndarray, nlog2: int) -> np.ndarray:
    """Host-side repack of the heap-ordered binary test array into 3-level
    supernode rows (one contiguous 8-float row per supernode)."""
    tests = np.asarray(tests)
    S = nlog2 // 3
    n_rows = (8**S - 1) // 7 if S else 0
    out = np.full((max(n_rows, 1), 8), FAR, np.float32)
    T = lambda lvl, j: tests[(1 << lvl) - 1 + j]
    off = 0
    for s in range(S):
        m = np.arange(8**s)
        rows = np.stack(
            [
                T(3 * s, m),
                T(3 * s + 1, 2 * m), T(3 * s + 1, 2 * m + 1),
                T(3 * s + 2, 4 * m), T(3 * s + 2, 4 * m + 1),
                T(3 * s + 2, 4 * m + 2), T(3 * s + 2, 4 * m + 3),
                np.full(len(m), FAR, np.float32),
            ],
            axis=1,
        )
        out[off : off + len(m)] = rows
        off += len(m)
    return out


def build_capt(points: np.ndarray, r_min: float, r_max: float, point_radius: float) -> CAPT:
    """Host-side tree construction (numpy port of the reference's recursive
    subdivide, capt.hh:137-325, without the per-leaf internal-ball skip — a
    pure pruning optimization)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    assert n > 0, "empty pointcloud"

    from ..native import native_capt_build

    nat = native_capt_build(points, r_max, point_radius)
    if nat is not None:
        tests_n, leaf_points_n, leaf_aabb_n, nlog2_n = nat
        return CAPT(
            tests=jnp.asarray(tests_n),
            leaf_points=jnp.asarray(leaf_points_n),
            leaf_aabb=jnp.asarray(leaf_aabb_n),
            top_aabb=jnp.asarray(np.stack([points.min(axis=0), points.max(axis=0)])),
            point_radius=jnp.float32(point_radius),
            supertests=jnp.asarray(_super_tests(tests_n, int(nlog2_n))),
            nlog2=int(nlog2_n),
        )

    nlog2 = 0
    while (1 << nlog2) < n:
        nlog2 += 1
    n_pad = 1 << nlog2
    pts = np.full((n_pad, 3), np.inf, np.float32)
    pts[:n] = points

    max_aff_l1 = r_max + point_radius
    tests = np.zeros(max(n_pad - 1, 1), np.float32)
    n_leaves = n_pad
    leaf_lists = [None] * n_leaves
    leaf_aabbs = np.zeros((n_leaves, 2, 3), np.float32)
    finite = points  # all real points

    order = np.arange(n_pad)

    def affords(cell_lo, cell_hi, cand):
        """Points within max_aff_l1 (L2) of the cell box."""
        if len(cand) == 0:
            return cand
        p = pts[cand]
        d = np.maximum(cell_lo - p, 0) + np.maximum(p - cell_hi, 0)
        return cand[np.sum(d * d, axis=1) <= max_aff_l1 * max_aff_l1]

    lo0 = np.full(3, -np.inf, np.float32)
    hi0 = np.full(3, np.inf, np.float32)

    stack = [(0, n_pad, 0, np.arange(n_pad), lo0, hi0, 0)]
    while stack:
        begin, count, ti, afford, lo, hi, d = stack.pop()
        if count == 1:
            z = ti - (n_pad - 1)
            rep = pts[order[begin]]
            if np.isfinite(rep[0]):
                cand = afford[np.isfinite(pts[afford, 0])]
                p = pts[cand]
                dd = np.maximum(lo - p, 0) + np.maximum(p - hi, 0)
                keep = cand[np.sum(dd * dd, axis=1) <= max_aff_l1 * max_aff_l1]
                lst = np.unique(np.concatenate([[order[begin]], keep]))
                leaf_lists[z] = pts[lst]
                leaf_aabbs[z, 0] = pts[lst].min(axis=0)
                leaf_aabbs[z, 1] = pts[lst].max(axis=0)
            else:
                leaf_lists[z] = np.zeros((0, 3), np.float32)
                leaf_aabbs[z, 0] = FAR
                leaf_aabbs[z, 1] = FAR
            continue

        seg = order[begin : begin + count]
        seg_sorted = seg[np.argsort(pts[seg, d], kind="stable")]
        order[begin : begin + count] = seg_sorted
        half = count // 2
        test = (pts[seg_sorted[half - 1], d] + pts[seg_sorted[half], d]) / 2.0
        if not np.isfinite(test):
            test = FAR
        tests[ti] = test

        lo_aff = afford[pts[afford, d] <= test + max_aff_l1]
        hi_aff = afford[pts[afford, d] >= test - max_aff_l1]
        # points crossing from the sibling half
        lo_aff = np.unique(np.concatenate([lo_aff, seg_sorted[half:][
            pts[seg_sorted[half:], d] <= test + max_aff_l1
        ]]))
        hi_aff = np.unique(np.concatenate([hi_aff, seg_sorted[:half][
            pts[seg_sorted[:half], d] >= test - max_aff_l1
        ]]))

        lo_hi = hi.copy()
        lo_hi[d] = test
        hi_lo = lo.copy()
        hi_lo[d] = test
        nd = (d + 1) % 3
        stack.append((begin, half, 2 * ti + 1, lo_aff, lo, lo_hi, nd))
        stack.append((begin + half, count - half, 2 * ti + 2, hi_aff, hi_lo, hi, nd))

    max_aff = max(1, max(len(l) for l in leaf_lists))
    leaf_points = np.full((n_leaves, max_aff, 3), FAR, np.float32)
    for z, lst in enumerate(leaf_lists):
        if len(lst):
            leaf_points[z, : len(lst)] = lst

    top_lo = finite.min(axis=0)
    top_hi = finite.max(axis=0)

    tests_f = np.where(np.isfinite(tests), tests, FAR)
    return CAPT(
        tests=jnp.asarray(tests_f),
        leaf_points=jnp.asarray(leaf_points),
        leaf_aabb=jnp.asarray(leaf_aabbs),
        top_aabb=jnp.asarray(np.stack([top_lo, top_hi])),
        point_radius=jnp.float32(point_radius),
        supertests=jnp.asarray(_super_tests(tests_f, nlog2)),
        nlog2=nlog2,
    )


def pad_capt(capt: CAPT, nlog2: int, max_aff: int) -> CAPT:
    """Deepen/pad a tree to (depth `nlog2`, `max_aff` affordance slots) with
    IDENTICAL query semantics — so per-lane trees of differing sizes stack
    into one lane-batched pytree (jax.tree.map(stack)).

    Deepening: appended heap levels hold FAR tests, so every query descends
    left through them; old leaf z becomes the leftmost descendant at
    z * 2^(depth delta), other new leaves stay empty (FAR)."""
    t = np.asarray(capt.tests)
    lp = np.asarray(capt.leaf_points)
    la = np.asarray(capt.leaf_aabb)
    d = capt.nlog2
    assert nlog2 >= d and max_aff >= lp.shape[1]
    shift = 1 << (nlog2 - d)
    n_leaves = 1 << nlog2
    tests = np.full(max(n_leaves - 1, 1), FAR, np.float32)
    tests[: len(t)] = t
    leaf_points = np.full((n_leaves, max_aff, 3), FAR, np.float32)
    leaf_aabb = np.full((n_leaves, 2, 3), FAR, np.float32)
    leaf_points[:: shift, : lp.shape[1]] = lp
    leaf_aabb[::shift] = la
    return CAPT(
        tests=jnp.asarray(tests),
        leaf_points=jnp.asarray(leaf_points),
        leaf_aabb=jnp.asarray(leaf_aabb),
        top_aabb=capt.top_aabb,
        point_radius=capt.point_radius,
        supertests=jnp.asarray(_super_tests(tests, nlog2)),
        nlog2=nlog2,
    )


def stack_capts(capts) -> CAPT:
    """Pad a list of per-lane CAPTs to a common shape and stack (leading L)."""
    nlog2 = max(c.nlog2 for c in capts)
    max_aff = max(c.leaf_points.shape[1] for c in capts)
    padded = [pad_capt(c, nlog2, max_aff) for c in capts]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def capt_collides_bm(capt: CAPT, xs, ys, zs, radii_col):
    """Batch-minor query: xs/ys/zs (S, *batch); radii_col broadcastable.
    Returns (*batch,) bool — any query sphere hits any tree point.

    Lane-batched trees (every CAPT leaf with a leading L axis, from
    stack_capts) are supported when the MINOR batch axis is L: per-level
    test lookups and leaf gathers then index (lane, idx)."""
    coords = (xs, ys, zs)
    batched = capt.tests.ndim == 2
    r_eff = radii_col + capt.point_radius
    rsq = r_eff * r_eff

    def lane_of(a):
        return jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)

    # top-level AABB prune
    if batched:
        lo = jnp.moveaxis(capt.top_aabb[:, 0], 0, -1)  # (3, L) -> per coord (L,)
        hi = jnp.moveaxis(capt.top_aabb[:, 1], 0, -1)
    else:
        lo, hi = capt.top_aabb[0], capt.top_aabb[1]
    inb = jnp.ones(xs.shape, bool)
    for k in range(3):
        inb = inb & (coords[k] + r_eff >= lo[k]) & (coords[k] - r_eff <= hi[k])

    # lockstep descent (capt.hh:457-541). All lane-batched lookups use
    # LINEAR jnp.take over flattened (lane, node) tables — multi-axis
    # advanced-indexing gathers inside planner while_loops fault the
    # tunnel TPU worker (observed kernel crashes, round 3).
    ntests = capt.tests.shape[-1]

    def table_take(tab, node_idx):
        # tab (L, n, ...) batched or (n, ...) single; node_idx (S, *batch)
        if not batched:
            return jnp.take(tab, node_idx, axis=0)
        n = tab.shape[1]
        flat = tab.reshape((tab.shape[0] * n,) + tab.shape[2:])
        lin = lane_of(node_idx) * n + node_idx
        return jnp.take(flat, lin, axis=0)

    # Supernode descent: one contiguous 8-float row gather per THREE binary
    # levels (module docstring; row layout from _super_tests). m is the
    # binary-local index at level 3s.
    n_super = capt.nlog2 // 3

    def row_take(node_idx):
        # supertests (L, R, 8) batched or (R, 8); node_idx (S, *batch)
        if not batched:
            return jnp.take(capt.supertests, node_idx, axis=0)
        R = capt.supertests.shape[1]
        flat = capt.supertests.reshape(capt.supertests.shape[0] * R, 8)
        lin = lane_of(node_idx) * R + node_idx
        return jnp.take(flat, lin, axis=0)

    m = jnp.zeros(xs.shape, jnp.int32)
    off = 0
    for s in range(n_super):
        row = row_take(off + m)  # (S, *batch, 8)
        b0 = (coords[0] >= row[..., 0]).astype(jnp.int32)
        t1 = jnp.where(b0 == 1, row[..., 2], row[..., 1])
        b1 = (coords[1] >= t1).astype(jnp.int32)
        t2 = jnp.where(
            b0 == 1,
            jnp.where(b1 == 1, row[..., 6], row[..., 5]),
            jnp.where(b1 == 1, row[..., 4], row[..., 3]),
        )
        b2 = (coords[2] >= t2).astype(jnp.int32)
        m = 8 * m + 4 * b0 + 2 * b1 + b2
        off += 8**s

    # tail levels (nlog2 % 3): classic per-level element gathers
    idx = ((1 << (3 * n_super)) - 1) + m
    for level in range(3 * n_super, capt.nlog2):
        k = level % 3
        t = table_take(capt.tests, idx)
        idx = 2 * idx + 1 + (coords[k] >= t).astype(jnp.int32)
    z = idx - ntests

    # leaf AABB prune (point-fattened)
    albl = table_take(capt.leaf_aabb, z)
    dsq = 0.0
    for k in range(3):
        c = coords[k]
        cl = jnp.clip(c, albl[..., 0, k], albl[..., 1, k])
        dsq = dsq + (c - cl) ** 2
    inb = inb & (dsq <= rsq)

    # affordance-buffer scan. Two formulations, picked by temporary size:
    #
    # (a) whole-leaf ROW gather (preferred): one jnp.take of complete
    #     (max_aff, 3) leaf rows — each gathered element is a contiguous
    #     12*max_aff-byte block, which the device services at near-stream
    #     bandwidth. The 12-byte element gather this replaced ran at ~1 GB/s
    #     effective and made CAPT planner steps ~100x slower than sphere-env
    #     steps (round-4 measurement; long kernels are also what faults the
    #     tunnel worker on big budgets).
    #
    # (b) lax.fori_loop streaming fixed-size element chunks when the row-
    #     gather temporary would exceed the budget — bounded memory on dense
    #     clouds, program size constant in max_aff.
    max_aff = capt.leaf_points.shape[-2]
    S = xs.shape[0]
    batch_elems = int(np.prod(xs.shape[1:])) if xs.ndim > 1 else 1
    budget = _GATHER_BUDGET  # gathered points resident at once (x3 x4B)
    pts_all = capt.leaf_points
    nleaf = pts_all.shape[-3]
    rsqb = jnp.broadcast_to(rsq, xs.shape)
    if batched:
        Lb = pts_all.shape[0]
        leaf_lin = lane_of(z) * nleaf + z  # (S, *batch) row index
        rows = pts_all.reshape(Lb * nleaf, max_aff * 3)
    else:
        leaf_lin = z
        rows = pts_all.reshape(nleaf, max_aff * 3)

    if S * batch_elems * max_aff <= budget:
        got = jnp.take(rows, leaf_lin, axis=0)  # (S, *batch, max_aff*3)
        pts = got.reshape(got.shape[:-1] + (max_aff, 3))
        dx = pts[..., 0] - xs[..., None]
        dy = pts[..., 1] - ys[..., None]
        dz = pts[..., 2] - zs[..., None]
        hit = jnp.any(dx * dx + dy * dy + dz * dz <= rsqb[..., None], axis=-1)
        return jnp.any(hit & inb, axis=0)

    # Larger shapes stream fixed-size chunks of the leading S axis through
    # the same row gather (a lax.fori_loop accumulating the axis-0 any-
    # reduce), so memory stays bounded without ever degrading to the
    # element gather. Ragged tail chunks re-read earlier rows (clamped
    # window); duplicates are harmless under the OR-reduce.
    S_C = int(min(S, max(budget // max(batch_elems * max_aff, 1), 1)))
    n_sc = -(-S // S_C)

    def take_s(a, s0):
        return jax.lax.dynamic_slice_in_dim(a, s0, S_C, axis=0)

    inb_full = inb
    xs_b = jnp.broadcast_to(xs, (S,) + xs.shape[1:])
    ys_b = jnp.broadcast_to(ys, xs.shape)
    zs_b = jnp.broadcast_to(zs, xs.shape)

    def s_chunk(si, acc):
        s0 = jnp.clip(si * S_C, 0, S - S_C)
        leaf_c = take_s(leaf_lin, s0)
        got = jnp.take(rows, leaf_c, axis=0)  # (S_C, *batch, max_aff*3)
        pts = got.reshape(got.shape[:-1] + (max_aff, 3))
        dx = pts[..., 0] - take_s(xs_b, s0)[..., None]
        dy = pts[..., 1] - take_s(ys_b, s0)[..., None]
        dz = pts[..., 2] - take_s(zs_b, s0)[..., None]
        rc = take_s(jnp.broadcast_to(rsqb, xs.shape), s0)
        hit_c = jnp.any(dx * dx + dy * dy + dz * dz <= rc[..., None], axis=-1)
        return acc | jnp.any(hit_c & take_s(inb_full, s0), axis=0)

    return jax.lax.fori_loop(
        0, n_sc, s_chunk, jnp.zeros(xs.shape[1:], bool)
    )


def capt_collides(capt: CAPT, centers, radii):
    """Lane-major convenience: centers (..., S, 3), radii (..., S)."""
    xs = jnp.moveaxis(centers[..., 0], -1, 0)
    ys = jnp.moveaxis(centers[..., 1], -1, 0)
    zs = jnp.moveaxis(centers[..., 2], -1, 0)
    r = jnp.moveaxis(jnp.broadcast_to(radii, centers.shape[:-1]), -1, 0)
    return capt_collides_bm(capt, xs, ys, zs, r)
