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
    assert N <= 8192, "dense (N, N) matrices: keep max_samples <= 8192"
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
