"""Hierarchical FK+CC: coarse bounding-sphere gate + compacted fine passes.

The reference's generated kernels check a per-link *bounding* sphere first and
only evaluate that link's fine spheres on a hit (reference:
src/impl/vamp/robots/panda/fk.hh:1336-1404 — the 2-level sphere hierarchy its
branchy early-exit exploits). Measured on the Panda MBM state mix, ~71% of
validated states flag ZERO coarse spheres and the mean is 0.89 flagged of 12
(benchmarks/hier_stats.py) — the fine pass is mostly skippable work that a
dense kernel cannot skip.

TPU re-design (no branches, static shapes):

phase 1 (dense, ~1/4 the fine FLOPs): coarse FK of C~12 bounding spheres,
  per-coarse-sphere env hit flags + coarse self-pair flags.

phase 2 (compacted, exact): coarse spheres are statically partitioned into a
  few chain-contiguous GROUPS (base / mid / distal for a 7-DoF arm). For each
  group, states flagged by any of its coarse spheres are compacted PER LANE
  along the state axis (argsort of flags — no scatter), the group's fine
  spheres are FK'd and checked on the compacted states, and hits are
  OR-reduced straight into per-BLOCK verdicts (a block = one planner edge's
  interpolated states), so nothing is scattered back. Compacting along the
  state axis only keeps the environment lane-aligned: no env gathers.
  Self-collision gets the same treatment with the full fine pair table.

Soundness: a coarse sphere encloses its fine spheres including their radii
(build_coarse_model), and every supported narrow-phase test is metric, so
coarse-miss => fine-miss; a small margin on the coarse radii absorbs f32
rounding. States that overflow a group's compaction capacity are reported as
colliding — conservative: the planner rejects that edge (a lost extension,
never an invalid path). Capacity defaults to half the states per call;
overflow means >50% of a lane's states were near obstacles.

Not supported (falls back to the dense fine checker, decided statically from
the env pytree): heightfields (their test is not metric in the sphere
center), CAPT pointclouds, attachments, per-lane base poses.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..robots.spec import RobotSpec
from .fkcc_bm import (
    _env_hits_bm,
    _make_checker,
    _pair_blocks,
    _self_hits_blocks,
    _self_hits_bm,
    make_sphere_fk_bm,
)


def _split_cluster(centers: np.ndarray, radii: np.ndarray, idx: np.ndarray,
                   max_spheres: int, max_radius: float) -> List[np.ndarray]:
    """Recursively split a sphere cluster along its widest axis until each
    piece is small/tight enough. Returns a list of index arrays."""
    c = centers[idx]
    cb = 0.5 * (c.min(0) + c.max(0))
    rb = float(np.max(np.linalg.norm(c - cb, axis=1) + radii[idx]))
    if len(idx) <= max_spheres or rb <= max_radius or len(idx) < 2:
        return [idx]
    axis = int(np.argmax(c.max(0) - c.min(0)))
    order = idx[np.argsort(c[:, axis])]
    half = len(order) // 2
    return _split_cluster(centers, radii, order[:half], max_spheres, max_radius) + \
        _split_cluster(centers, radii, order[half:], max_spheres, max_radius)


def build_coarse_model(spec: RobotSpec, max_spheres: int = 6, max_radius: float = 0.15):
    """Per-frame bounding spheres over the fine sphere model.

    Returns (frames (C,), centers (C,3), radii (C,), cover (C, S) bool) —
    cover[c, s] marks which fine spheres bounding sphere c encloses."""
    frames, centers, radii, cover = [], [], [], []
    S = spec.n_spheres
    by_frame = {}
    for i, f in enumerate(spec.sphere_frame.tolist()):
        by_frame.setdefault(f, []).append(i)
    for f, idx in by_frame.items():
        idx = np.asarray(idx, np.int64)
        for piece in _split_cluster(
            spec.sphere_center, spec.sphere_radius, idx, max_spheres, max_radius
        ):
            c = spec.sphere_center[piece]
            cb = 0.5 * (c.min(0) + c.max(0))
            rb = float(np.max(np.linalg.norm(c - cb, axis=1) + spec.sphere_radius[piece]))
            frames.append(f)
            centers.append(cb)
            radii.append(rb)
            cov = np.zeros(S, bool)
            cov[piece] = True
            cover.append(cov)
    return (
        np.asarray(frames, np.int32),
        np.asarray(centers, np.float32).reshape(-1, 3),
        np.asarray(radii, np.float32),
        np.stack(cover),
    )


def _coarse_self_pairs(spec: RobotSpec, cover: np.ndarray) -> List[Tuple[int, int]]:
    """Bounding-sphere pairs covering every fine self-collision pair."""
    C = cover.shape[0]
    owner = np.zeros(spec.n_spheres, np.int64)
    for c in range(C):
        owner[cover[c]] = c
    pairs = set()
    for i, k in spec.self_pairs:
        a, b = int(owner[i]), int(owner[k])
        if a != b:
            pairs.add((a, b))
    return sorted(pairs)


def partition_groups(frames: np.ndarray, cover: np.ndarray, n_groups: int = 3):
    """Split coarse spheres into chain-contiguous groups with ~balanced fine
    sphere counts (base/mid/distal for an arm). Returns a list of coarse
    index arrays."""
    order = np.argsort(frames, kind="stable")
    counts = cover[order].sum(axis=1)
    total = counts.sum()
    bounds = [total * (k + 1) / n_groups for k in range(n_groups - 1)]
    groups, cur, acc, bi = [], [], 0, 0
    for pos, c in enumerate(order):
        cur.append(int(c))
        acc += counts[pos]
        if bi < len(bounds) and acc >= bounds[bi] and pos < len(order) - 1:
            groups.append(np.asarray(cur, np.int64))
            cur, bi = [], bi + 1
    if cur:
        groups.append(np.asarray(cur, np.int64))
    return groups


def _sub_spec(spec: RobotSpec, fine_idx: np.ndarray) -> RobotSpec:
    return dataclasses.replace(
        spec,
        sphere_frame=spec.sphere_frame[fine_idx],
        sphere_center=spec.sphere_center[fine_idx],
        sphere_radius=spec.sphere_radius[fine_idx],
        sphere_link_names=tuple(spec.sphere_link_names[i] for i in fine_idx),
        self_pairs=np.zeros((0, 2), np.int32),
        self_pairs_attach=None,
    )


def make_fkcc_hier_blocks(
    spec: RobotSpec,
    n_blocks: int,
    spb: int,
    capacity_frac: float = 0.5,
    n_groups: int = 3,
    margin: float = 1e-4,
):
    """Block-verdict hierarchical checker for the planner's edge-validation
    workload: `check(q (dim, n_blocks*spb, L), env, base_rot?, base_pos?) ->
    valid (n_blocks, L)` where block b covers states [b*spb, (b+1)*spb) (one
    edge's interpolated states; the planner needs only all-valid per block).

    Exact (boolean-identical to the dense checker's block reduction) except
    for compaction overflow, which conservatively invalidates the block.
    """
    frames, centers, radii_c, cover = build_coarse_model(spec)
    C = len(radii_c)
    cspec = dataclasses.replace(
        spec,
        sphere_frame=frames,
        sphere_center=centers,
        sphere_radius=radii_c,
        sphere_link_names=tuple(f"coarse{int(f)}" for f in frames),
        self_pairs=np.zeros((0, 2), np.int32),
        self_pairs_attach=None,
    )
    fk_coarse = make_sphere_fk_bm(cspec)
    self_pairs_c = _coarse_self_pairs(spec, cover)
    check_fine = _make_checker(spec)
    fk_full = make_sphere_fk_bm(spec)
    radii = spec.sphere_radius
    self_blocks = _pair_blocks(spec, spec.self_pairs) if spec.self_pairs.size else []

    groups = partition_groups(frames, cover, n_groups)
    group_fine = []
    for g in groups:
        fine_idx = np.nonzero(cover[g].any(axis=0))[0]
        sub = _sub_spec(spec, fine_idx)
        group_fine.append((g, make_sphere_fk_bm(sub), sub.sphere_radius))

    T = n_blocks * spb
    Kc = min(max(int(np.ceil(capacity_frac * T / 8.0)) * 8, 8), T)
    rc_m = radii_c + margin
    has_self = bool(spec.self_pairs.size)

    def check_blocks(q, env, base_rot=None, base_pos=None):
        batched = env.sphere_xyzr.ndim == 3
        if (
            env.hf_mask.shape[-1]
            or env.capts
            or env.has_attachments
            or base_rot is not None
            or base_pos is not None
        ):
            ok = check_fine(q, env, base_rot, base_pos)  # (T, L)
            return jnp.all(ok.reshape(n_blocks, spb, -1), axis=1)

        L = q.shape[2]
        t_iota = jnp.arange(T, dtype=jnp.int32)[:, None]  # (T, 1)
        k_iota = jnp.arange(Kc, dtype=jnp.int32)[:, None]  # (Kc, 1)

        # -- phase 1: coarse flags -----------------------------------------
        xs, ys, zs = fk_coarse(q, None, None)  # (C, T, L)
        rcol = jnp.asarray(rc_m).reshape((C, 1, 1))
        per_c = []
        for c in range(C):
            per_c.append(
                _env_hits_bm(
                    xs[c : c + 1], ys[c : c + 1], zs[c : c + 1],
                    rcol[c : c + 1], env, batched_env=batched,
                )
            )
        sflag = jnp.zeros((T, L), bool)
        for (a, b) in self_pairs_c:
            dx = xs[a] - xs[b]
            dy = ys[a] - ys[b]
            dz = zs[a] - zs[b]
            rs = float(rc_m[a] + rc_m[b])
            sflag = sflag | (dx * dx + dy * dy + dz * dz < rs * rs)

        bhit = jnp.zeros((n_blocks, L), bool)

        def compact_run(flag, fine_hits_fn):
            """flag (T, L) -> OR of exact fine hits into (n_blocks, L)."""
            # per-lane stable compaction along T via argsort (no scatter):
            # flagged states keep chronological order in the first cnt rows
            key = jnp.where(flag, t_iota, T + t_iota)  # (T, L)
            sel = jnp.argsort(key, axis=0)[:Kc].astype(jnp.int32)  # (Kc, L)
            cnt = jnp.sum(flag, axis=0)  # (L,)
            q_sel = jnp.take_along_axis(q, sel[None], axis=1)  # (dim, Kc, L)
            hits = fine_hits_fn(q_sel)  # (Kc, L)
            live = k_iota < cnt[None, :]
            hits = hits & live
            sel_block = sel // spb  # (Kc, L)
            bh = jnp.stack(
                [jnp.any(hits & (sel_block == b), axis=0) for b in range(n_blocks)]
            )
            # overflowed flagged states: conservatively invalid
            over = flag & (jnp.cumsum(flag.astype(jnp.int32), axis=0) > Kc)
            return bh | jnp.any(over.reshape(n_blocks, spb, L), axis=1)

        for (g, fk_g, rad_g) in group_fine:
            gflag = per_c[g[0]]  # (T, L)
            for c in g[1:]:
                gflag = gflag | per_c[c]

            def env_hits_g(q_sel, fk_g=fk_g, rad_g=rad_g):
                gx, gy, gz = fk_g(q_sel, None, None)  # (Sg, Kc, L)
                rc = jnp.asarray(rad_g).reshape((-1, 1, 1))
                return _env_hits_bm(gx, gy, gz, rc, env, batched_env=batched)

            bhit = bhit | compact_run(gflag, env_hits_g)

        if has_self and self_pairs_c:

            def self_hits(q_sel):
                fx, fy, fz = fk_full(q_sel, None, None)  # (S, Kc, L)
                if self_blocks is not None:
                    return _self_hits_blocks(fx, fy, fz, radii, self_blocks)
                return _self_hits_bm(fx, fy, fz, radii, spec.self_pairs)

            bhit = bhit | compact_run(sflag, self_hits)

        return ~bhit

    return check_blocks
