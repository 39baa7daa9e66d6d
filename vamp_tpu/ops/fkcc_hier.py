"""Hierarchical FK+CC: coarse bounding-sphere gate + compacted fine pass.

The reference's generated kernels check a per-link *bounding* sphere first and
only evaluate that link's fine spheres on a hit (reference:
src/impl/vamp/robots/panda/fk.hh:1336-1404 — the 2-level sphere hierarchy that
its branchy early-exit exploits). A dense vector machine can't branch per
state, but it can gate per STATE: the fkcc workload is VPU-FLOP-bound
(measured ~2.7 Tflop/s elementwise on TPU v5e), and most interpolated states
along candidate edges are nowhere near an obstacle, so:

phase 1 (dense, cheap): evaluate only the ~10 per-link bounding spheres
  against the environment, plus bounding-pair self-collision — a conservative
  "possibly colliding" flag per state at ~1/5 the fine FLOPs.

phase 2 (compacted, exact): gather the flagged states (bounded capacity),
  run the full fine checker (ops/fkcc_bm._make_checker — env + self, exact
  semantics) on the compact batch, and scatter verdicts back.

States that overflow the compaction capacity are conservatively reported as
colliding: planners then reject that candidate edge — sound (no invalid path
can be accepted), at worst a lost extension. Capacity defaults to 1/4 of the
batch; overflow means >25% of ALL states in the batch were near obstacles.

Not supported (falls back to the dense fine checker): heightfields, CAPT
pointclouds, attachments, per-lane base poses. The planner-facing factory
checks these per call.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..robots.spec import RobotSpec
from .fkcc_bm import _env_hits_bm, _make_checker, make_sphere_fk_bm


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
        pairs.add((int(owner[i]), int(owner[k])))
    if spec.self_pairs_attach is not None:
        for i, k in spec.self_pairs_attach:
            pairs.add((int(owner[i]), int(owner[k])))
    return sorted(pairs)


def make_fkcc_hier(spec: RobotSpec, capacity_frac: float = 0.25):
    """Planner-facing hierarchical checker with the same contract as
    ops.fkcc_bm.make_fkcc_planner: `check(q (dim, T, L), envs, base_rot,
    base_pos) -> valid (T, L)`. Batch must be exactly 2-D (T, L).

    Falls back to the dense fine checker for env features the compact path
    does not cover (heightfields, CAPT, attachments).
    """
    frames, centers, radii_c, cover = build_coarse_model(spec)
    cspec = dataclasses.replace(
        spec,
        sphere_frame=frames,
        sphere_center=centers,
        sphere_radius=radii_c,
        sphere_link_names=tuple(f"coarse{int(f)}" for f in frames),
    )
    fk_coarse = make_sphere_fk_bm(cspec)
    self_pairs_c = _coarse_self_pairs(spec, cover)
    check_fine = _make_checker(spec)
    C = len(radii_c)

    def check(q, env, base_rot=None, base_pos=None):
        batched = env.sphere_xyzr.ndim == 3
        if (
            env.hf_mask.shape[-1]
            or env.capts
            or env.has_attachments
            or (base_rot is not None and getattr(base_rot, "ndim", 2) != 2)
        ):
            return check_fine(q, env, base_rot, base_pos)

        T, L = q.shape[1], q.shape[2]
        TL = T * L
        Kc = max(int(np.ceil(capacity_frac * TL / 256.0)) * 256, 256)

        # -- phase 1: coarse possible-collision flag ------------------------
        xs, ys, zs = fk_coarse(q, base_rot, base_pos)  # (C, T, L)
        rcol = jnp.asarray(radii_c).reshape((C, 1, 1))
        poss = _env_hits_bm(xs, ys, zs, rcol, env, batched_env=batched)
        for (a, b) in self_pairs_c:
            dx = xs[a] - xs[b]
            dy = ys[a] - ys[b]
            dz = zs[a] - zs[b]
            rs = float(radii_c[a] + radii_c[b])
            poss = poss | (dx * dx + dy * dy + dz * dz < rs * rs)

        # -- phase 2: compact flagged states, run the exact fine checker ----
        flat = poss.reshape(-1)  # state-major, lane-minor (t*L + l)
        pos = jnp.cumsum(flat) - 1  # flagged rank
        n_flag = jnp.sum(flat)
        write = jnp.where(flat & (pos < Kc), pos, Kc)
        sel = (
            jnp.zeros((Kc + 1,), jnp.int32)
            .at[write]
            .set(jnp.arange(TL, dtype=jnp.int32), mode="drop")[:Kc]
        )
        q_sel = q.reshape(q.shape[0], TL)[:, sel]  # (dim, Kc)
        if batched:
            lane_sel = sel % L
            env_sel = jax.tree.map(lambda x: x[lane_sel], env)
        else:
            env_sel = env
        fine_valid = check_fine(q_sel[:, None, :], env_sel, base_rot, base_pos)[0]
        live = jnp.arange(Kc) < n_flag
        fine_hit = (~fine_valid) & live

        hit_flat = (
            jnp.zeros((TL,), bool).at[sel].max(fine_hit, mode="drop")
        )
        # overflowed flagged states: conservatively colliding
        hit_flat = hit_flat | (flat & (pos >= Kc))
        return ~hit_flat.reshape(T, L)

    return check
