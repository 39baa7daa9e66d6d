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
from jax import lax

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

    @classmethod
    def lane_partition_spec(cls, axes):
        """Declared lane axis per field (lane-major result convention), for
        parallel.mesh.make_sharded_batch_solver."""
        from jax.sharding import PartitionSpec as P

        lane = P(axes)
        return cls(path=lane, path_length=lane, cost=lane, iterations=lane)


def _path_cost(path, lengths):
    deltas = jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=2)
    mask = jnp.arange(1, path.shape[1])[None, :] < lengths[:, None]
    return jnp.sum(jnp.where(mask, deltas, 0.0), axis=1)


def make_simplify_batch(
    spec: RobotSpec,
    settings: SimplifySettings,
    max_path: int = 128,
    chunk_states: int = 64,
    seed: int = 0,
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

    def _gather_pt(paths, idx):
        return jnp.take_along_axis(
            paths, jnp.clip(idx, 0, P - 1)[:, None, None], 1
        )[:, 0, :]

    def reduce_op(paths, lengths, envs, br, bp, key):
        """Randomized shortcutting (reduce_path_vertices, simplify.hh:55-113).

        Faithful control flow — per lane: draw endpoints p0, p1 within
        range_ratio of each other, widen |p0-p1| < 2 picks, validate the
        straight p0->p1 motion, erase the interior on success; loop while
        `i < max_steps OR no_change < max_empty_steps` (the reference's OR).
        Randomness: per-lane jax.random in place of the RNG's mt19937
        (documented deviation — that stream is not portable anyway)."""
        rs = settings.reduce
        L = paths.shape[0]
        max_steps = rs.max_steps if rs.max_steps else P
        max_empty = rs.max_empty_steps if rs.max_empty_steps else P

        def act(c):
            return c["live"] & ((c["i"] < max_steps) | (c["empty"] < max_empty))

        def cond(c):
            return jnp.any(act(c))

        def body(c):
            paths, lengths = c["paths"], c["lengths"]
            key = jax.random.wrap_key_data(c["key"])
            key, k0, k1 = jax.random.split(key, 3)
            live = act(c)
            max_n = lengths - 1
            rng_range = 1 + jnp.floor(
                0.5 + lengths.astype(jnp.float32) * rs.range_ratio
            ).astype(jnp.int32)
            p0 = jax.random.randint(k0, (L,), 0, jnp.maximum(max_n + 1, 1))
            lo = jnp.maximum(p0 - rng_range, 0)
            hi = jnp.minimum(max_n, p0 + rng_range)
            p1 = jax.random.randint(k1, (L,), lo, jnp.maximum(hi + 1, lo + 1))
            near = jnp.abs(p0 - p1) < 2
            p1 = jnp.where(
                near & (p0 < max_n - 1),
                p0 + 2,
                jnp.where(near & (p0 > 1), p0 - 2, p1),
            )
            skip = near & ~(p0 < max_n - 1) & ~(p0 > 1)
            a = jnp.minimum(p0, p1)
            b = jnp.maximum(p0, p1)

            pa = _gather_pt(paths, a)
            pb = _gather_pt(paths, b)
            vec = pb - pa
            dist = jnp.linalg.norm(vec, axis=1)
            try_edge = live & ~skip & (b > a + 1)
            ok = validate_edges(
                pa[:, None], vec[:, None], dist[:, None], envs, br, bp,
                try_edge[:, None],
            )[:, 0]
            do_cut = try_edge & ok

            k = jnp.arange(P)[None, :]
            removed = jnp.where(do_cut, b - a - 1, 0)[:, None]
            src = jnp.where(k <= a[:, None], k, k + removed)
            src = jnp.clip(src, 0, P - 1)
            cut_paths = jnp.take_along_axis(paths, src[:, :, None], 1)
            paths = jnp.where(do_cut[:, None, None], cut_paths, paths)
            lengths = jnp.where(do_cut, lengths - removed[:, 0], lengths)

            return dict(
                paths=paths,
                lengths=lengths,
                i=c["i"] + live.astype(jnp.int32),
                empty=jnp.where(do_cut, 0, c["empty"] + live.astype(jnp.int32)),
                live=c["live"],
                changed=c["changed"] | do_cut,
                key=jax.random.key_data(key),
            )

        init = dict(
            paths=paths,
            lengths=lengths,
            i=jnp.zeros((paths.shape[0],), jnp.int32),
            empty=jnp.zeros((paths.shape[0],), jnp.int32),
            live=lengths >= 3,
            changed=jnp.zeros((paths.shape[0],), bool),
            key=jax.random.key_data(key),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out["paths"], out["lengths"], out["changed"]

    def perturb_op(paths, lengths, envs, br, bp, key):
        """Random vertex perturbation (perturb_path, simplify.hh:143-190).

        Per lane and step: pick an interior vertex, try
        `perturbation_attempts` random moves of size `range` toward sampled
        configurations, accept the first that lowers local cost with both
        adjacent motions valid. Loop while `step < max_steps AND
        no_change < max_empty_steps` (the reference's AND). All attempts for
        all lanes validate in one fused call."""
        ps = settings.perturb
        L = paths.shape[0]
        A = ps.perturbation_attempts
        max_steps = ps.max_steps if ps.max_steps else P
        max_empty = ps.max_empty_steps if ps.max_empty_steps else P
        lower = jnp.asarray(spec.lower)
        scale = jnp.asarray(spec.range)

        def act(c):
            return c["live"] & (c["i"] < max_steps) & (c["empty"] < max_empty)

        def cond(c):
            return jnp.any(act(c))

        def body(c):
            paths, lengths = c["paths"], c["lengths"]
            key = jax.random.wrap_key_data(c["key"])
            key, ki, ku = jax.random.split(key, 3)
            live = act(c)
            idx = jax.random.randint(ki, (L,), 1, jnp.maximum(lengths - 1, 2))
            p_cur = _gather_pt(paths, idx)
            p_before = _gather_pt(paths, idx - 1)
            p_after = _gather_pt(paths, idx + 1)
            old_cost = jnp.linalg.norm(p_cur - p_before, axis=1) + jnp.linalg.norm(
                p_cur - p_after, axis=1
            )

            u = jax.random.uniform(ku, (A, L, dim))
            target = u * scale[None, None, :] + lower[None, None, :]
            new = p_cur[None] + (target - p_cur[None]) * ps.range  # (A, L, dim)
            new_cost = jnp.linalg.norm(new - p_before[None], axis=2) + jnp.linalg.norm(
                new - p_after[None], axis=2
            )
            improves = (new_cost < old_cost[None]) & live[None]  # (A, L)

            # validate before->new and after->new for every attempt at once
            starts = jnp.concatenate(
                [
                    jnp.broadcast_to(p_before[None], (A, L, dim)),
                    jnp.broadcast_to(p_after[None], (A, L, dim)),
                ],
                axis=0,
            ).transpose(1, 0, 2)  # (L, 2A, dim)
            vecs = jnp.concatenate([new - p_before[None], new - p_after[None]], axis=0
                                   ).transpose(1, 0, 2)
            dists = jnp.linalg.norm(vecs, axis=2)
            mask = jnp.concatenate([improves, improves], axis=0).T  # (L, 2A)
            ok = validate_edges(starts, vecs, dists, envs, br, bp, mask)
            good = improves.T & ok[:, :A] & ok[:, A:]  # (L, A)
            any_good = jnp.any(good, axis=1)
            first = jnp.argmax(good, axis=1)  # first accepted attempt
            chosen = jnp.take_along_axis(
                new.transpose(1, 0, 2), first[:, None, None], 1
            )[:, 0, :]

            lanes = jnp.arange(L)
            upd = jnp.where(any_good[:, None], chosen - p_cur, 0.0)
            paths = paths.at[lanes, jnp.clip(idx, 0, P - 1), :].add(upd)

            return dict(
                paths=paths,
                lengths=lengths,
                i=c["i"] + live.astype(jnp.int32),
                empty=jnp.where(any_good, 0, c["empty"] + live.astype(jnp.int32)),
                live=c["live"],
                changed=c["changed"] | any_good,
                key=jax.random.key_data(key),
            )

        init = dict(
            paths=paths,
            lengths=lengths,
            i=jnp.zeros((paths.shape[0],), jnp.int32),
            empty=jnp.zeros((paths.shape[0],), jnp.int32),
            live=lengths >= 3,
            changed=jnp.zeros((paths.shape[0],), bool),
            key=jax.random.key_data(key),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out["paths"], out["lengths"], out["changed"]

    ops = {
        SHORTCUT: lambda p, l, e, br, bp, key: shortcut(p, l, e, br, bp),
        BSPLINE: lambda p, l, e, br, bp, key: bspline(p, l, e, br, bp),
        REDUCE: reduce_op,
        PERTURB: perturb_op,
    }
    enabled = [op for op in settings.operations if op in ops]
    unknown = [op for op in settings.operations if op not in ops]
    if unknown:
        raise ValueError(f"unknown simplification routines: {unknown}")

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
            paths, lengths, it, live, keydata = c
            key = jax.random.wrap_key_data(keydata)
            any_change = jnp.zeros((L,), bool)
            for op in enabled:
                # ops mutate the path in place in the reference (e.g. bspline's
                # subdivision persists even when no midpoint moved) — commit
                # outputs for every live lane; `changed` only drives the loop.
                key, sub = jax.random.split(key)
                p2, l2, ch = ops[op](paths, lengths, envs, br, bp, sub)
                paths = jnp.where(live[:, None, None], p2, paths)
                lengths = jnp.where(live, l2, lengths)
                any_change = any_change | (ch & live)
            it = it + live.astype(jnp.int32)
            live = live & any_change & (it < settings.max_iterations)
            return paths, lengths, it, live, jax.random.key_data(key)

        def loop_cond(c):
            return jnp.any(c[3])

        live0 = ~direct & (lengths > 2)
        paths_o, lengths_o, iters, _, _ = jax.lax.while_loop(
            loop_cond, loop_body,
            (
                paths,
                lengths,
                jnp.zeros((L,), jnp.int32),
                live0,
                jax.random.key_data(jax.random.PRNGKey(seed)),
            ),
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


def make_shortcut_dp_batch(
    spec: RobotSpec,
    max_path: int = 256,
    nodes: int = 32,
    relax_sweeps: int = 6,
    chunk_states: int = 16,
):
    """Latency-mode "simplify-lite": optimal waypoint-subsequence shortcut in
    a HANDFUL of serialized device phases.

    The default pipeline (reference simplify.hh:192-260 fixed-point over
    SHORTCUT+BSPLINE) is a per-candidate cursor state machine: hundreds of
    tiny dependent device steps, which on a ~100us-per-phase relay costs far
    more wall than its FLOPs (measured: the round-4 fused plan+simplify mode
    tripled single-query latency). This op replaces it for the fused
    single-query path:

      1. gather the first `nodes-1` waypoints + the true endpoint;
      2. validate ALL O(nodes^2) pairwise straight edges at the reference
         check set (validate.hh:41 j/(8n) fractions) in ONE chunked fused
         sweep (long edges early-exit collectively);
      3. min-plus (Bellman-Ford) relaxation over the validated-edge DAG,
         seeded with the original path's prefix costs — after k sweeps the
         result is the optimal subsequence shortcut using <= 2+k hops, and
         never worse than the input path;
      4. predecessor walk -> compacted path.

    Unlike the reference's greedy pairwise scan (simplify.hh:115-141) this
    finds the globally optimal subsequence (it cannot invent new midpoints,
    so BSPLINE-style smoothing is out of scope — documented lite tradeoff).
    Paths longer than `nodes` waypoints keep their tail intact via the
    endpoint node; if the clamped jump edge is invalid the DP falls back to
    the (always-valid) original chain among the first nodes-1 waypoints only
    when that chain reaches the endpoint — otherwise the input path is
    returned unchanged (valid by construction).

    Returns `simplify_lite(paths (L,P,dim), lengths (L,), envs, base_rot?,
    base_pos?) -> SimplifyResult`.
    """
    from ..ops.validate import make_validate_edges_chunked

    fkcc = make_fkcc_planner(spec)
    res = spec.resolution
    P = max_path
    M = nodes
    diam = float(np.linalg.norm(spec.range))
    max_chunks = max(int(np.ceil(diam * res / chunk_states)), 1)
    validate_edges = make_validate_edges_chunked(fkcc, res, chunk_states, max_chunks)

    # static upper-triangular pair list (i < j). Adjacent pairs are included
    # because the LAST adjacency (node M-2 -> endpoint node M-1) is a clamped
    # jump for paths longer than `nodes` waypoints — it skips real waypoints
    # and must be validated like any shortcut candidate.
    ii, jj = np.triu_indices(M, k=1)
    ii_c = jnp.asarray(ii, jnp.int32)
    jj_c = jnp.asarray(jj, jnp.int32)

    def simplify_lite(
        paths: jnp.ndarray,
        lengths: jnp.ndarray,
        envs: PackedEnvironment,
        base_rot: Optional[jnp.ndarray] = None,
        base_pos: Optional[jnp.ndarray] = None,
    ) -> SimplifyResult:
        L = paths.shape[0]
        assert paths.shape[1] == P, f"pad paths to max_path={P}"
        last = jnp.clip(lengths - 1, 0, P - 1)  # (L,)

        # node -> waypoint index: 0..M-2 clamp to the chain, M-1 is the end
        base_idx = jnp.minimum(jnp.arange(M - 1, dtype=jnp.int32)[None, :], last[:, None])
        node_idx = jnp.concatenate([base_idx, last[:, None]], axis=1)  # (L, M)
        pts = jnp.take_along_axis(paths, node_idx[:, :, None], 1)  # (L, M, dim)

        # -- 2. one fused all-pairs edge validation -------------------------
        p_i = jnp.take_along_axis(pts, ii_c[None, :, None], 1)  # (L, E, dim)
        p_j = jnp.take_along_axis(pts, jj_c[None, :, None], 1)
        vec = p_j - p_i
        dist = jnp.linalg.norm(vec, axis=2)  # (L, E)
        # degenerate (clamped) pairs are zero-length: skip their validation
        active = dist > 1e-9
        ok = validate_edges(p_i, vec, dist, envs, base_rot, base_pos, active)

        # -- 3. min-plus relaxation over the DAG ----------------------------
        # W[l, i, j]: cost of usable edge i->j (inf otherwise). Original
        # consecutive segments (nodes 0..M-2, and M-2->M-1 only when the path
        # fits in M nodes) are trusted by construction — the planner already
        # validated them — so validation noise cannot reject the input chain.
        seg = jnp.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=2)  # (L, M-1)
        W = jnp.full((L, M, M), jnp.inf, jnp.float32)
        W = W.at[:, ii_c, jj_c].set(jnp.where(ok & active, dist, jnp.inf))
        ar = jnp.arange(M - 2)
        W = W.at[:, ar, ar + 1].set(seg[:, :-1])
        # last adjacency: original segment iff the whole path fits (last node
        # index <= M-1 means node M-2 IS waypoint last-1 or a clamp duplicate)
        fits = last <= M - 1
        W = W.at[:, M - 2, M - 1].set(
            jnp.where(fits, seg[:, -1], W[:, M - 2, M - 1])
        )

        # seed: chain prefix costs through node M-2 (always feasible); the
        # endpoint seeds as inf unless the path fits — for long paths it must
        # be REACHED via a validated edge or the input is returned unchanged
        chain = jnp.concatenate(
            [jnp.zeros((L, 1)), jnp.cumsum(seg, axis=1)], axis=1
        )  # (L, M)
        d = chain.at[:, M - 1].set(jnp.where(fits, chain[:, M - 1], jnp.inf))
        pred = jnp.concatenate(
            [
                jnp.zeros((L, 1), jnp.int32),
                jnp.broadcast_to(
                    jnp.arange(M - 1)[None], (L, M - 1)
                ).astype(jnp.int32),
            ],
            axis=1,
        )  # pred[j] = j-1 (and 0 for node 0)

        # UNROLLED python loop, not lax.fori/while: on the axon relay a
        # loop of tiny-op iterations costs ~2-5 ms PER ITERATION (measured;
        # only big-body loops like the planner step amortize it), while
        # unrolled top-level ops cost ~0.3 ms each. relax_sweeps bounds the
        # hop count of the found path; the chain seed keeps any result valid.
        for _ in range(relax_sweeps):
            cand = d[:, :, None] + W  # (L, M src, M dst)
            best = jnp.min(cand, axis=1)
            arg = jnp.argmin(cand, axis=1).astype(jnp.int32)
            better = best < d - 1e-7
            d = jnp.where(better, best, d)
            pred = jnp.where(better, arg, pred)

        # -- 4. path extraction by pointer doubling (no sequential walk) ----
        # depth[j] = #pred-steps from node j to node 0 (pred[0] = 0
        # self-loop); then the t-th ancestor of the endpoint for every t at
        # once via binary-composed ancestor tables — log2(M) unrolled
        # phases instead of an M-step walk.
        kbits = max(1, (M - 1).bit_length())
        # d_k[j] after k doubling rounds = min(depth(j), 2^k): d[0] = 0 stops
        # the accumulation once a jump reaches the root.
        dk = jnp.where(jnp.arange(M)[None, :] == 0, 0, 1).astype(jnp.int32)
        dk = jnp.broadcast_to(dk, (L, M))
        ancs = [pred]  # ancs[k][l, j] = 2^k-th ancestor of j
        A = pred
        for _ in range(kbits - 1):
            dk = dk + jnp.take_along_axis(dk, A, 1)
            A = jnp.take_along_axis(A, A, 1)
            ancs.append(A)
        dk = dk + jnp.take_along_axis(dk, A, 1)  # cover depth up to 2^kbits
        n_hops = jnp.take_along_axis(dk, jnp.full((L, 1), M - 1, jnp.int32), 1)[
            :, 0
        ] + 1  # nodes on the chain incl. both endpoints

        # seq_end_first[t] = t-th ancestor of the endpoint node
        t = jnp.arange(M)[None, :]  # (1, M)
        cur = jnp.full((L, M), M - 1, jnp.int32)
        for k in range(kbits):
            hop = jnp.take_along_axis(ancs[k], cur, 1)
            cur = jnp.where((t >> k) & 1 == 1, hop, cur)
        # reverse into waypoint order
        pos = jnp.arange(M)[None, :]
        rev = jnp.clip(n_hops[:, None] - 1 - pos, 0, M - 1)
        seq_fwd = jnp.take_along_axis(cur, rev, 1)  # (L, M) node ids, start-first
        wp = jnp.take_along_axis(node_idx, seq_fwd, 1)  # waypoint indices
        new_path = jnp.zeros_like(paths)
        new_path = lax.dynamic_update_slice(
            new_path,
            jnp.take_along_axis(paths, jnp.minimum(wp, last[:, None])[:, :, None], 1),
            (0, 0, 0),
        )
        new_len = n_hops

        # lanes where the DP found nothing better than (or equal to) a path
        # ending at the endpoint keep their input (also covers length<=2)
        improved = (new_len >= 2) & (d[:, M - 1] < _path_cost(paths, lengths) - 1e-6)
        out_path = jnp.where(improved[:, None, None], new_path, paths)
        out_len = jnp.where(improved, new_len, lengths)
        return SimplifyResult(
            path=out_path,
            path_length=out_len,
            cost=_path_cost(out_path, out_len),
            iterations=jnp.where(improved, relax_sweeps, 0),
        )

    return simplify_lite
