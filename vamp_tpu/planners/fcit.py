"""FCIT*: fully-connected informed trees — batch lazy shortest path.

The reference FCIT* (planning/fcit.hh) grows a fully-connected implicit graph
in sample batches and runs a serial lazy best-first edge queue, validating an
edge only when it could improve the solution (fcit.hh:216-263), with
invalid-edge memoization (invalidList). That queue is deeply sequential; the
TPU-native equivalent keeps the algorithmic essence — batch sampling +
fully-connected graph + validate-only-improving-edges + memoization — as a
LazySP loop over dense device matrices:

per round (reference batch loop, fcit.hh:311-344):
  1. add a batch of collision-free Halton samples;
  2. repeat:
     a. min-plus Bellman–Ford to a fixpoint over the pairwise distance
        matrix, treating unknown edges optimistically as valid (the "lazy"
        admissible relaxation — identical to FCIT*'s f-hat ordering logic);
     b. walk the shortest start->goal path; batch-validate exactly its
        unvalidated edges in one fused kernel (the path selector — the
        minimal set of edges whose validity the solution depends on);
     c. mark verdicts in the validity cache (== invalidList memoization);
        stop when the path is fully validated.

Because both searches are exact over the same sample set (same Halton
stream), the converged cost equals the reference's optimum for that sample
count; only the validation *order* (and hence edge-validation counts)
differs — that ordering is a CPU-queue artifact with no bearing on results.

Capacities are static: N samples, per-lane dense (N, N) distance/validity
matrices — FCIT* is a single/few-problem anytime planner, so lanes are few
and dense matrices are the right TPU trade.
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
from ..ops.validate import RAKE, make_validate_edges_chunked
from ..robots.spec import RobotSpec
from ..samplers.halton import HaltonState, halton_init_batch, halton_next
from ..utils.settings import RoadmapSettings

INF = jnp.float32(np.inf)
UNKNOWN, VALID, INVALID = jnp.int8(0), jnp.int8(1), jnp.int8(2)

# Budgets above this use the neighbor-capped tiled mode (_make_fcit_knn)
# instead of dense (N, N) matrices. Patchable for tests.
_DENSE_MAX = 8192


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FCITResult:
    path: jnp.ndarray  # (L, max_path, dim)
    path_length: jnp.ndarray  # (L,) i32
    cost: jnp.ndarray  # (L,) f32
    iterations: jnp.ndarray  # (L,) i32 — sampling rounds executed per lane
    solved: jnp.ndarray  # (L,) bool
    graph_size: jnp.ndarray  # (L,) i32
    sampler: HaltonState
    # Anytime trace: best validated cost after each sampling round
    # (L, R_max), inf where unsolved / round not executed.
    cost_trace: jnp.ndarray

    @classmethod
    def lane_partition_spec(cls, axes):
        """Declared lane axis per field (lane-major result convention), for
        parallel.mesh.make_sharded_batch_solver."""
        from jax.sharding import PartitionSpec as P

        lane = P(axes)
        return cls(path=lane, path_length=lane, cost=lane, iterations=lane,
                   solved=lane, graph_size=lane, cost_trace=lane,
                   sampler=HaltonState.lane_partition_spec(axes))


def make_fcit_batch(
    spec: RobotSpec,
    settings: RoadmapSettings,
    n_goals: int = 1,
    max_path: int = 64,
    lazy_iters: int = 192,
):
    """Build `solve(starts (L,dim), goals (L,G,dim), goal_mask, envs,
    samplers?) -> FCITResult`.

    Anytime budget semantics (reference fcit.hh:311-344): sampling rounds of
    `settings.batch_size` run while round < max_iterations, the sample budget
    (max_samples) has room for another batch, and some lane is unsolved — or
    forever within budgets when `settings.optimize` (keep refining after the
    first solution; converged cost decreases monotonically, recorded per
    round in FCITResult.cost_trace). The Bellman-Ford relaxation runs to a
    fixpoint (no fixed sweep ceiling), so any path up to max_path vertices is
    found exactly.

    lazy_iters: max validate-and-repair cycles per round.
    """
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    N = settings.max_samples
    B = settings.batch_size
    # rounds that fit the sample budget and the iteration budget
    rounds = min(max((N - 1 - n_goals) // B, 0), settings.max_iterations)
    assert rounds >= 1, (
        f"max_samples={N} must hold 1+{n_goals} endpoints + one {B}-sample batch"
    )
    if N > _DENSE_MAX:
        # beyond the dense (N, N) regime: neighbor-capped tiled mode
        return _make_fcit_knn(spec, settings, n_goals, max_path, lazy_iters)
    diam = float(np.linalg.norm(spec.range))
    validate_edges = make_validate_edges_chunked(
        fkcc, res, 64, max(int(np.ceil(diam * res / 64)), 1)
    )
    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def solve(
        starts: jnp.ndarray,  # (L, dim)
        goals: jnp.ndarray,  # (L, G, dim)
        goal_mask: jnp.ndarray,  # (L, G)
        envs: PackedEnvironment,
        samplers: Optional[HaltonState] = None,
        base_rot=None,
        base_pos=None,
    ) -> FCITResult:
        L, G = goals.shape[0], goals.shape[1]
        if samplers is None:
            samplers = halton_init_batch(dim, L)
        br, bp = base_rot, base_pos

        # node 0 = start; 1..G = goals; rest sample slots
        states = jnp.zeros((L, N, dim), jnp.float32)
        states = states.at[:, 0].set(starts)
        states = states.at[:, 1 : 1 + G].set(goals)
        active = jnp.zeros((L, N), bool).at[:, 0].set(True)
        active = active.at[:, 1 : 1 + G].set(goal_mask)
        validity = jnp.zeros((L, N, N), jnp.int8)  # UNKNOWN

        def pairwise(states, active):
            d = states[:, :, None, :] - states[:, None, :, :]
            D = jnp.sqrt(jnp.sum(d * d, axis=3))
            ok = active[:, :, None] & active[:, None, :]
            return jnp.where(ok, D, INF)

        def sample_batch(states, active, slot, sampler):
            """Draw until B VALID samples per lane (reference fcit.hh:320-343
            keeps drawing on invalid samples). Lane streams advance only while
            that lane still needs samples — exact per-lane stream parity. L is
            small for FCIT, so the per-lane scatter insert is cheap."""

            lanes = jnp.arange(L)

            def cond(c):
                return jnp.any(c["count"] < B) & (c["draws"] < 64 * B)

            def body(c):
                need = c["count"] < B
                u, s2 = halton_next(c["sampler"])
                sampler = jax.tree.map(
                    lambda new, old: jnp.where(
                        need if new.ndim == 1 else need[None], new, old
                    ),
                    s2,
                    c["sampler"],
                )
                q = (u * scale[:, None] + lower[:, None]).T  # (L, dim)
                ok = fkcc(q.T[:, None, :], envs, br, bp)[0] & need
                dest = jnp.where(ok, slot + c["count"], N - 1)
                states = c["states"].at[lanes, dest].set(
                    jnp.where(ok[:, None], q, c["states"][lanes, dest])
                )
                active = c["active"].at[lanes, dest].set(
                    c["active"][lanes, dest] | ok
                )
                return dict(
                    states=states,
                    active=active,
                    sampler=sampler,
                    count=c["count"] + ok.astype(jnp.int32),
                    draws=c["draws"] + 1,
                )

            out = lax.while_loop(
                cond,
                body,
                dict(
                    states=states,
                    active=active,
                    sampler=sampler,
                    count=jnp.zeros((L,), jnp.int32),
                    draws=jnp.int32(0),
                ),
            )
            return out["states"], out["active"], out["sampler"]

        def lazy_sp(D, validity, active, optimistic=True):
            """Bellman-Ford to a true fixpoint (no sweep ceiling: a fixed
            count would silently under-relax paths deeper than it).
            `optimistic` treats UNKNOWN edges as valid (the lazy relaxation);
            pessimistic uses only VALIDATED edges — for sound extraction.
            Returns (g (L,N), parent (L,N))."""
            if optimistic:
                Dm = jnp.where(validity == INVALID, INF, D)
            else:
                Dm = jnp.where(validity == VALID, D, INF)
            Dm = jnp.where(jnp.eye(N, dtype=bool)[None], INF, Dm)

            def bf(c):
                g, parent, _, it = c
                tot = g[:, :, None] + Dm  # (L, p, c)
                best = jnp.min(tot, axis=1)  # (L, c)
                argp = jnp.argmin(tot, axis=1).astype(jnp.int32)
                better = best < g
                g2 = jnp.where(better, best, g)
                p2 = jnp.where(better, argp, parent)
                return g2, p2, jnp.any(better), it + 1

            g0 = jnp.full((L, N), INF).at[:, 0].set(0.0)
            p0 = jnp.zeros((L, N), jnp.int32)
            g, parent, _, _ = lax.while_loop(
                lambda c: c[2] & (c[3] < N),
                bf,
                (g0, p0, jnp.bool_(True), jnp.int32(0)),
            )
            return g, parent

        def goal_choice(g):
            gg = lax.dynamic_slice_in_dim(g, 1, G, axis=1)  # (L, G)
            gg = jnp.where(goal_mask, gg, INF)
            best_goal = jnp.argmin(gg, axis=1).astype(jnp.int32) + 1
            best_cost = jnp.min(gg, axis=1)
            return best_goal, best_cost

        def walk_path(parent, goal_idx):
            """goal -> start chain as (L, max_path) indices (start-first)."""

            def step(i, acc):
                buf, cur, length = acc
                buf = buf.at[:, i].set(cur)
                at_start = cur == 0
                nxt = jnp.take_along_axis(parent, cur[:, None], 1)[:, 0]
                length = jnp.where(at_start, length, length + 1)
                cur = jnp.where(at_start, cur, nxt)
                return buf, cur, length

            buf = jnp.zeros((L, max_path), jnp.int32)
            buf, _, length = lax.fori_loop(
                0, max_path, step, (buf, goal_idx, jnp.ones((L,), jnp.int32))
            )
            # reverse into start-first order
            pos = jnp.arange(max_path)[None, :]
            ridx = jnp.clip(length[:, None] - 1 - pos, 0, max_path - 1)
            seq = jnp.take_along_axis(buf, ridx, 1)
            return seq, length

        def repair(D, validity, states, active):
            """Validate-and-repair until the best path is fully validated."""

            def cond(c):
                _, _, pending, it = c
                return jnp.any(pending) & (it < lazy_iters)

            def body(c):
                validity, best_cost, _, it = c
                g, parent = lazy_sp(D, validity, active)
                goal_idx, cost = goal_choice(g)
                seq, length = walk_path(parent, goal_idx)
                # path edges: (seq[i], seq[i+1]) for i < length-1
                E = max_path - 1
                u_idx = seq[:, :-1]
                v_idx = seq[:, 1:]
                edge_live = (jnp.arange(E)[None, :] < (length - 1)[:, None]) & (
                    cost[:, None] < INF
                )
                flat = u_idx * N + v_idx  # (L, E)
                vflat = validity.reshape(L, N * N)
                known = jnp.take_along_axis(vflat, flat, 1)
                need = edge_live & (known == UNKNOWN)

                su = jnp.take_along_axis(states, u_idx[:, :, None], 1)
                sv = jnp.take_along_axis(states, v_idx[:, :, None], 1)
                vecs = sv - su
                dists = jnp.linalg.norm(vecs, axis=2)
                ok = validate_edges(su, vecs, dists, envs, br, bp, need)
                verdict = jnp.where(ok, VALID, INVALID).astype(jnp.int8)
                # scatter verdicts symmetrically (edge validity is symmetric)
                upd = jnp.where(need, verdict, known).astype(jnp.int8)
                vflat = _scatter_rows(vflat, flat, upd, need)
                vflat = _scatter_rows(vflat, v_idx * N + u_idx, upd, need)
                validity = vflat.reshape(L, N, N)
                pending = jnp.any(need & ~ok, axis=1)  # invalid found -> re-relax
                return validity, cost, pending, it + 1

            validity, cost, _, _ = lax.while_loop(
                cond,
                body,
                (validity, jnp.full((L,), INF), jnp.ones((L,), bool), jnp.int32(0)),
            )
            return validity, cost

        def _scatter_rows(vflat, idx, values, mask):
            """Masked per-lane scatter into (L, N*N) along axis 1."""
            lanes = jnp.arange(L)[:, None]
            safe = jnp.where(mask, idx, 0)
            cur = jnp.take_along_axis(vflat, safe, 1)
            new = jnp.where(mask, values, cur)
            return vflat.at[lanes, safe].set(new)

        # -- anytime budget loop (fcit.hh:311-344) --------------------------
        # Rounds run while iteration + sample budgets hold and either some
        # lane is unsolved or `optimize` keeps refining; each round's best
        # validated cost lands in the trace.
        carry = dict(
            states=states,
            active=active,
            validity=validity,
            sampler=samplers,
            slot=jnp.int32(1 + G),
            round=jnp.int32(0),
            solved=jnp.zeros((L,), bool),
            trace=jnp.full((rounds, L), INF),
        )

        def round_cond(c):
            room = c["slot"] + B <= N
            budget = c["round"] < rounds
            work = jnp.any(~c["solved"]) | jnp.bool_(settings.optimize)
            return budget & room & work

        def round_body(c):
            s2, a2, smp = sample_batch(c["states"], c["active"], c["slot"], c["sampler"])
            D = pairwise(s2, a2)
            validity, _ = repair(D, c["validity"], s2, a2)
            # trace/solved report only fully-VALIDATED paths (sound even when
            # repair exhausts lazy_iters with optimistic edges outstanding)
            gp, _ = lazy_sp(D, validity, a2, optimistic=False)
            _, best_cost = goal_choice(gp)
            trace = lax.dynamic_update_slice(
                c["trace"], best_cost[None, :], (c["round"], jnp.int32(0))
            )
            return dict(
                states=s2,
                active=a2,
                validity=validity,
                sampler=smp,
                slot=c["slot"] + B,
                round=c["round"] + 1,
                solved=best_cost < INF,
                trace=trace,
            )

        carry = lax.while_loop(round_cond, round_body, carry)

        # final extraction — pessimistic: the returned path uses only
        # validated edges (repair's converged best path is all-VALID, so no
        # converged solution is ever lost)
        D = pairwise(carry["states"], carry["active"])
        g, parent = lazy_sp(D, carry["validity"], carry["active"], optimistic=False)
        goal_idx, cost = goal_choice(g)
        seq, length = walk_path(parent, goal_idx)
        path = jnp.take_along_axis(carry["states"], seq[:, :, None], 1)
        solved = cost < INF

        return FCITResult(
            path=path,
            path_length=jnp.where(solved, length, 0),
            cost=jnp.where(solved, cost, 0.0),
            iterations=jnp.broadcast_to(carry["round"], (L,)).astype(jnp.int32),
            solved=solved,
            graph_size=jnp.sum(carry["active"], axis=1).astype(jnp.int32),
            sampler=carry["sampler"],
            cost_trace=carry["trace"].T,
        )

    return solve


def _make_fcit_knn(
    spec: RobotSpec,
    settings: RoadmapSettings,
    n_goals: int,
    max_path: int,
    lazy_iters: int,
):
    """FCIT* beyond the dense-matrix regime (max_samples > 8192).

    The dense mode's (N, N) distance/validity matrices are O(N^2) memory —
    268 MB/lane at N=16k — so large budgets instead keep, per node, its K
    nearest active nodes (K >= the k-PRM* bound ceil(e(1+1/d) ln N), which
    preserves asymptotic optimality; Karaman & Frazzoli 2011). Distances are
    rebuilt each sampling round in row tiles via |a-b|^2 = |a|^2+|b|^2-2ab
    (batched GEMM) + lax.top_k, so no O(N^2) buffer ever materializes.

    Documented deviations from the dense mode / reference fcit.hh:
    - the roadmap is a directed K-nearest graph relaxed pull-style (node v
      improves through its own K-nearest list), not fully connected
      (roadmap.hh:86-95); with K at the k-PRM* bound the sampled optimum is
      preserved asymptotically;
    - edge-validity memoization (fcit.hh invalidList) persists only within a
      round: neighbor lists change at every rebuild, so verdict slots are
      re-derived (extra re-validations, never unsoundness — the extracted
      path uses validated edges only).
    """
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    N = settings.max_samples
    B = settings.batch_size
    R = 256  # distance-tile rows: (L, R, N) temp stays O(100MB) at L<=8
    N = -(-N // R) * R  # round capacity up to whole tiles
    rounds = min(max((N - 1 - n_goals) // B, 0), settings.max_iterations)
    kstar = int(np.ceil(np.e * (1.0 + 1.0 / dim) * np.log(N)))
    K = max(settings.max_neighbors, kstar)
    diam = float(np.linalg.norm(spec.range))
    validate_edges = make_validate_edges_chunked(
        fkcc, res, 64, max(int(np.ceil(diam * res / 64)), 1)
    )
    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def solve(
        starts: jnp.ndarray,  # (L, dim)
        goals: jnp.ndarray,  # (L, G, dim)
        goal_mask: jnp.ndarray,  # (L, G)
        envs: PackedEnvironment,
        samplers: Optional[HaltonState] = None,
        base_rot=None,
        base_pos=None,
    ) -> FCITResult:
        L, G = goals.shape[0], goals.shape[1]
        if samplers is None:
            samplers = halton_init_batch(dim, L)
        br, bp = base_rot, base_pos

        states = jnp.zeros((L, N, dim), jnp.float32)
        states = states.at[:, 0].set(starts)
        states = states.at[:, 1 : 1 + G].set(goals)
        active = jnp.zeros((L, N), bool).at[:, 0].set(True)
        active = active.at[:, 1 : 1 + G].set(goal_mask)

        lanes = jnp.arange(L)
        lane_off = (lanes * N)[:, None, None]  # for linear-index gathers

        def sample_batch(states, active, slot, sampler):
            """Identical per-lane stream semantics to the dense mode."""

            def cond(c):
                return jnp.any(c["count"] < B) & (c["draws"] < 64 * B)

            def body(c):
                need = c["count"] < B
                u, s2 = halton_next(c["sampler"])
                sampler = jax.tree.map(
                    lambda new, old: jnp.where(
                        need if new.ndim == 1 else need[None], new, old
                    ),
                    s2,
                    c["sampler"],
                )
                q = (u * scale[:, None] + lower[:, None]).T  # (L, dim)
                ok = fkcc(q.T[:, None, :], envs, br, bp)[0] & need
                dest = jnp.where(ok, slot + c["count"], N - 1)
                states = c["states"].at[lanes, dest].set(
                    jnp.where(ok[:, None], q, c["states"][lanes, dest])
                )
                active = c["active"].at[lanes, dest].set(
                    c["active"][lanes, dest] | ok
                )
                return dict(
                    states=states,
                    active=active,
                    sampler=sampler,
                    count=c["count"] + ok.astype(jnp.int32),
                    draws=c["draws"] + 1,
                )

            out = lax.while_loop(
                cond,
                body,
                dict(
                    states=states,
                    active=active,
                    sampler=sampler,
                    count=jnp.zeros((L,), jnp.int32),
                    draws=jnp.int32(0),
                ),
            )
            return out["states"], out["active"], out["sampler"]

        def build_knn(states, active):
            """(L, N, K) K-nearest indices + distances over active nodes,
            rebuilt in (L, R, N) row tiles — no (N, N) buffer."""
            s2 = jnp.sum(states * states, axis=2)  # (L, N)
            iota_n = jnp.arange(N)

            def tile(t, acc):
                idx_acc, d_acc = acc
                r0 = t * R
                rows = lax.dynamic_slice_in_dim(states, r0, R, axis=1)
                rs2 = lax.dynamic_slice_in_dim(s2, r0, R, axis=1)
                dots = jnp.einsum("lrd,lnd->lrn", rows, states)
                d2 = rs2[:, :, None] - 2.0 * dots + s2[:, None, :]
                d2 = jnp.where(active[:, None, :], d2, INF)
                self_mask = iota_n[None, None, :] == (r0 + jnp.arange(R))[None, :, None]
                d2 = jnp.where(self_mask, INF, d2)
                negd, idx = lax.top_k(-d2, K)
                idx_acc = lax.dynamic_update_slice(
                    idx_acc, idx.astype(jnp.int32), (0, r0, 0)
                )
                d_acc = lax.dynamic_update_slice(
                    d_acc, jnp.sqrt(jnp.maximum(-negd, 0.0)), (0, r0, 0)
                )
                return idx_acc, d_acc

            idx0 = jnp.zeros((L, N, K), jnp.int32)
            d0 = jnp.full((L, N, K), INF)
            return lax.fori_loop(0, N // R, tile, (idx0, d0))

        def lazy_sp(nbr_idx, nbr_dist, validity, active, optimistic=True):
            """Pull-style Bellman-Ford over each node's K-nearest list."""
            if optimistic:
                Dm = jnp.where(validity == INVALID, INF, nbr_dist)
            else:
                Dm = jnp.where(validity == VALID, nbr_dist, INF)
            flat_idx = (lane_off + nbr_idx).reshape(-1)

            def bf(c):
                g, parent, _, it = c
                gu = jnp.take(g.reshape(-1), flat_idx).reshape(L, N, K)
                tot = gu + Dm
                best = jnp.min(tot, axis=2)
                argk = jnp.argmin(tot, axis=2)
                cand_parent = jnp.take_along_axis(nbr_idx, argk[..., None], 2)[..., 0]
                better = (best < g) & active
                g2 = jnp.where(better, best, g)
                p2 = jnp.where(better, cand_parent, parent)
                return g2, p2, jnp.any(better), it + 1

            g0 = jnp.full((L, N), INF).at[:, 0].set(0.0)
            p0 = jnp.zeros((L, N), jnp.int32)
            g, parent, _, _ = lax.while_loop(
                lambda c: c[2] & (c[3] < N), bf, (g0, p0, jnp.bool_(True), jnp.int32(0))
            )
            return g, parent

        def goal_choice(g):
            gg = lax.dynamic_slice_in_dim(g, 1, G, axis=1)
            gg = jnp.where(goal_mask, gg, INF)
            return jnp.argmin(gg, axis=1).astype(jnp.int32) + 1, jnp.min(gg, axis=1)

        def walk_path(parent, goal_idx):
            def step(i, acc):
                buf, cur, length = acc
                buf = buf.at[:, i].set(cur)
                at_start = cur == 0
                nxt = jnp.take_along_axis(parent, cur[:, None], 1)[:, 0]
                length = jnp.where(at_start, length, length + 1)
                cur = jnp.where(at_start, cur, nxt)
                return buf, cur, length

            buf = jnp.zeros((L, max_path), jnp.int32)
            buf, _, length = lax.fori_loop(
                0, max_path, step, (buf, goal_idx, jnp.ones((L,), jnp.int32))
            )
            pos = jnp.arange(max_path)[None, :]
            ridx = jnp.clip(length[:, None] - 1 - pos, 0, max_path - 1)
            return jnp.take_along_axis(buf, ridx, 1), length

        def _scatter_rows(vflat, idx, values, mask):
            ll = jnp.arange(L)[:, None]
            safe = jnp.where(mask, idx, 0)
            cur = jnp.take_along_axis(vflat, safe, 1)
            new = jnp.where(mask, values, cur)
            return vflat.at[ll, safe].set(new)

        def repair(nbr_idx, nbr_dist, validity, states, active):
            """Validate-and-repair the best optimistic path until all-valid.
            Path edges are (parent u -> v) with u in v's neighbor list by
            construction; verdicts scatter into validity[v, slot_of(u)]."""

            def cond(c):
                _, _, pending, it = c
                return jnp.any(pending) & (it < lazy_iters)

            def body(c):
                validity, best_cost, _, it = c
                g, parent = lazy_sp(nbr_idx, nbr_dist, validity, active)
                goal_idx, cost = goal_choice(g)
                seq, length = walk_path(parent, goal_idx)
                E = max_path - 1
                u_idx = seq[:, :-1]  # parent side
                v_idx = seq[:, 1:]
                edge_live = (jnp.arange(E)[None, :] < (length - 1)[:, None]) & (
                    cost[:, None] < INF
                )
                # slot of u in v's K-list (guaranteed present for tree edges)
                v_nbrs = jnp.take(
                    nbr_idx.reshape(L * N, K),
                    (lanes[:, None] * N + v_idx).reshape(-1),
                    axis=0,
                ).reshape(L, E, K)
                slot = jnp.argmax(v_nbrs == u_idx[:, :, None], axis=2)
                flat = v_idx * K + slot  # (L, E) into (N*K)
                vflat = validity.reshape(L, N * K)
                known = jnp.take_along_axis(vflat, flat, 1)
                need = edge_live & (known == UNKNOWN)

                su = jnp.take_along_axis(states, u_idx[:, :, None], 1)
                sv = jnp.take_along_axis(states, v_idx[:, :, None], 1)
                vecs = sv - su
                dists = jnp.linalg.norm(vecs, axis=2)
                ok = validate_edges(su, vecs, dists, envs, br, bp, need)
                verdict = jnp.where(ok, VALID, INVALID).astype(jnp.int8)
                upd = jnp.where(need, verdict, known).astype(jnp.int8)
                vflat = _scatter_rows(vflat, flat, upd, need)
                validity = vflat.reshape(L, N, K)
                pending = jnp.any(need & ~ok, axis=1)
                return validity, cost, pending, it + 1

            validity, cost, _, _ = lax.while_loop(
                cond,
                body,
                (validity, jnp.full((L,), INF), jnp.ones((L,), bool), jnp.int32(0)),
            )
            return validity, cost

        carry = dict(
            states=states,
            active=active,
            nbr_idx=jnp.zeros((L, N, K), jnp.int32),
            nbr_dist=jnp.full((L, N, K), INF),
            validity=jnp.zeros((L, N, K), jnp.int8),
            sampler=samplers,
            slot=jnp.int32(1 + G),
            round=jnp.int32(0),
            solved=jnp.zeros((L,), bool),
            trace=jnp.full((rounds, L), INF),
            # Best validated path across rounds, by node indices (stable:
            # nodes only append). Per-round validity resets (neighbor lists
            # change) would otherwise let a later round report WORSE than an
            # earlier one when repair exhausts before re-validating an
            # equivalent path — the anytime contract is a running minimum.
            best_cost=jnp.full((L,), INF),
            best_seq=jnp.zeros((L, max_path), jnp.int32),
            best_len=jnp.ones((L,), jnp.int32),
        )

        def round_cond(c):
            room = c["slot"] + B <= N
            budget = c["round"] < rounds
            work = jnp.any(~c["solved"]) | jnp.bool_(settings.optimize)
            return budget & room & work

        def round_body(c):
            s2, a2, smp = sample_batch(c["states"], c["active"], c["slot"], c["sampler"])
            nbr_idx, nbr_dist = build_knn(s2, a2)
            validity = jnp.zeros((L, N, K), jnp.int8)  # lists changed: reset
            validity, _ = repair(nbr_idx, nbr_dist, validity, s2, a2)
            gp, parent_p = lazy_sp(nbr_idx, nbr_dist, validity, a2, optimistic=False)
            goal_idx, round_cost = goal_choice(gp)
            seq, length = walk_path(parent_p, goal_idx)
            improved = round_cost < c["best_cost"]
            best_cost = jnp.where(improved, round_cost, c["best_cost"])
            best_seq = jnp.where(improved[:, None], seq, c["best_seq"])
            best_len = jnp.where(improved, length, c["best_len"])
            trace = lax.dynamic_update_slice(
                c["trace"], best_cost[None, :], (c["round"], jnp.int32(0))
            )
            return dict(
                states=s2,
                active=a2,
                nbr_idx=nbr_idx,
                nbr_dist=nbr_dist,
                validity=validity,
                sampler=smp,
                slot=c["slot"] + B,
                round=c["round"] + 1,
                solved=best_cost < INF,
                trace=trace,
                best_cost=best_cost,
                best_seq=best_seq,
                best_len=best_len,
            )

        carry = lax.while_loop(round_cond, round_body, carry)

        # best validated path across ALL rounds (node states never move)
        cost = carry["best_cost"]
        seq, length = carry["best_seq"], carry["best_len"]
        path = jnp.take_along_axis(carry["states"], seq[:, :, None], 1)
        solved = cost < INF

        return FCITResult(
            path=path,
            path_length=jnp.where(solved, length, 0),
            cost=jnp.where(solved, cost, 0.0),
            iterations=jnp.broadcast_to(carry["round"], (L,)).astype(jnp.int32),
            solved=solved,
            graph_size=jnp.sum(carry["active"], axis=1).astype(jnp.int32),
            sampler=carry["sampler"],
            cost_trace=carry["trace"].T,
        )

    return solve
