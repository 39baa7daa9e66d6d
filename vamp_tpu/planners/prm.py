"""PRM / PRM* with roadmap construction — batched, device-grown graphs.

Re-architecture of the reference PRM (planning/prm.hh) for TPU lanes:

- the roadmap lives in fixed-capacity slot-major arrays: states (dim, N, L),
  forward neighbor lists (N, K, L) (+ distances); slots allocate per loop
  step (shared scalar index), so every write is a dynamic_update_slice;
- per iteration: one Halton sample per lane, validity check, k/r-nearest via
  a masked distance sweep + top_k (PRM* neighbor counts/radii per
  roadmap.hh:49-67), then ALL candidate edges validated in one fused chunked
  kernel at exact reference resolution;
- connected components use FLAT labels with value-relabeling (after linking
  to neighbor roots r_1..r_K, every node labeled r_i is relabeled min(r));
  this replaces the reference's pointer-based union-find
  (planning/utils.hh:17-62) with K elementwise passes — no pointer chasing;
- the shortest path is recovered by A* on the host over the extracted graph
  (reference runs A* inline, planning/utils.hh:75-142); graph extraction is a
  one-time device->host pull after the grow loop.

Forward adjacency fully determines the undirected graph (the reference
stores both directions; A* here expands both from forward lists).
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

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

BIG = jnp.float32(3.4e38)


@dataclass
class PRMResult:
    """Host-side result (paths recovered by A*)."""

    path: np.ndarray  # (P, dim) — empty (0, dim) when unsolved
    cost: float
    iterations: int
    roadmap_size: int
    solved: bool


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RoadmapArrays:
    """Device roadmap (leading axes slot-major, lane-minor)."""

    states: jnp.ndarray  # (dim, N, L)
    nbr_idx: jnp.ndarray  # (N, K, L) i32, -1 padded (forward edges)
    nbr_dist: jnp.ndarray  # (N, K, L) f32
    node_active: jnp.ndarray  # (N, L) bool
    comp: jnp.ndarray  # (N, L) i32 flat component labels
    n_nodes: jnp.ndarray  # (L,) f32 — roadmap sizes
    iterations: jnp.ndarray  # (L,) i32
    connected: jnp.ndarray  # (L,) bool — start connected to some goal
    sampler: HaltonState


def neighbor_k(n, dim):
    """PRM* max neighbors (roadmap.hh:49-56): ceil((e + e/d) ln n)."""
    c = np.e + np.e / dim
    return jnp.ceil(c * jnp.log(jnp.maximum(n, 2.0)))


def neighbor_radius(n, dim, space_measure, gamma_scale=2.0):
    """PRM* connection radius (roadmap.hh:58-67)."""
    inv = 1.0 / dim
    unit_ball = float(np.pi ** (dim / 2.0) / math.gamma(dim / 2.0 + 1.0))
    ratio = space_measure / unit_ball
    const = 2.0 * (1.0 + inv) ** inv * ratio**inv
    return gamma_scale * const * (jnp.log(jnp.maximum(n, 2.0)) / jnp.maximum(n, 2.0)) ** inv


def make_prm_grow(
    spec: RobotSpec,
    settings: RoadmapSettings,
    n_goals: int = 1,
    stop_on_connect: bool = True,
):
    """Build the jittable roadmap-grow loop:

    `grow(starts (L,dim), goals (L,G,dim), goal_mask, envs, samplers?) ->
    RoadmapArrays`. With stop_on_connect (PRM::solve semantics) a lane
    freezes once a goal joins the start's component; without it the loop
    runs the full budget (PRM::build_roadmap semantics, prm.hh:198-299).
    """
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    N = min(settings.max_samples, settings.max_iterations + n_goals + 1)
    K = settings.max_neighbors
    measure = spec.space_measure()
    diam = float(np.linalg.norm(spec.range))
    validate_edges = make_validate_edges_chunked(
        fkcc, res, 64, max(int(np.ceil(diam * res / 64)), 1)
    )

    use_prm_star = settings.neighbor_params == "prm_star"

    def grow(starts, goals, goal_mask, envs, samplers=None, base_rot=None, base_pos=None):
        L, G = goals.shape[0], goals.shape[1]
        if samplers is None:
            samplers = halton_init_batch(dim, L)
        br, bp = base_rot, base_pos

        states = jnp.zeros((dim, N, L), jnp.float32)
        states = lax.dynamic_update_slice(states, starts.T[:, None, :], (0, 0, 0))
        states = lax.dynamic_update_slice(states, goals.transpose(2, 1, 0), (0, 1, 0))
        node_active = jnp.zeros((N, L), bool).at[0].set(True)
        node_active = lax.dynamic_update_slice(node_active, goal_mask.T, (1, 0))
        nbr_idx = jnp.full((N, K, L), -1, jnp.int32)
        nbr_dist = jnp.zeros((N, K, L), jnp.float32)
        # flat component labels: node's initial label = its slot index
        comp = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))

        iota_N = jnp.arange(N, dtype=jnp.int32)

        carry = dict(
            states=states,
            node_active=node_active,
            nbr_idx=nbr_idx,
            nbr_dist=nbr_dist,
            comp=comp,
            n_nodes=jnp.full((L,), 1.0) + jnp.sum(goal_mask, axis=1).astype(jnp.float32),
            slot=jnp.int32(1 + G),
            sampler=samplers,
            iter=jnp.zeros((L,), jnp.int32),
            done=jnp.zeros((L,), bool),
            connected=jnp.zeros((L,), bool),
        )

        def connected_now(comp):
            start_label = comp[0]  # (L,)
            goal_labels = lax.dynamic_slice_in_dim(comp, 1, G, axis=0)  # (G, L)
            return jnp.any(
                (goal_labels == start_label[None, :]) & goal_mask.T, axis=0
            )

        def cond(c):
            run = (~c["done"]) & (c["iter"] < settings.max_iterations)
            return jnp.any(run) & (c["slot"] < N)

        def body(c):
            states, node_active = c["states"], c["node_active"]
            nbr_idx, nbr_dist, comp = c["nbr_idx"], c["nbr_dist"], c["comp"]
            slot, n_nodes = c["slot"], c["n_nodes"]
            run = (~c["done"]) & (c["iter"] < settings.max_iterations)

            u, sampler_next = halton_next(c["sampler"])
            sampler = jax.tree.map(
                lambda new, old: jnp.where(run if new.ndim == 1 else run[None], new, old),
                sampler_next,
                c["sampler"],
            )
            sample = u * jnp.asarray(spec.range)[:, None] + jnp.asarray(spec.lower)[:, None]

            valid = fkcc(sample[:, None, :], envs, br, bp)[0] & run  # (L,)

            # -- k/r nearest among active nodes (reference prm.hh:262-264) --
            d = states - sample[:, None, :]
            sq = jnp.sum(d * d, axis=0)  # (N, L)
            sq = jnp.where(node_active, sq, BIG)
            neg, top_idx = jax.lax.top_k(-sq.T, K)  # (L, K) nearest K
            top_d = jnp.sqrt(jnp.maximum(-neg, 0.0))
            if use_prm_star:
                k_dyn = neighbor_k(n_nodes, dim)  # (L,)
                r_dyn = neighbor_radius(n_nodes, dim, measure)
            else:
                k_dyn = jnp.full((L,), float(K))
                r_dyn = jnp.full((L,), settings.neighbor_radius)
            in_k = jnp.arange(K)[None, :] < k_dyn[:, None]
            cand = (
                valid[:, None]
                & in_k
                & (top_d <= r_dyn[:, None])
                & (top_d < BIG)
                & jnp.take_along_axis(node_active.T, top_idx, 1)
            )

            # -- validate all candidate edges in one chunked fused kernel ---
            nbr_states = jnp.take_along_axis(
                states.transpose(2, 1, 0), top_idx[:, :, None], 1
            )  # (L, K, dim)
            sample_lm = sample.T  # (L, dim)
            vecs = sample_lm[:, None, :] - nbr_states
            edge_ok = validate_edges(
                nbr_states, vecs, top_d, envs, br, bp, cand
            ) & cand  # (L, K)

            # -- insert node at shared slot ---------------------------------
            states = lax.dynamic_update_slice(states, sample[:, None, :], (0, slot, 0))
            node_active = lax.dynamic_update_slice(
                node_active, valid[None, :], (slot, 0)
            )
            new_idx = jnp.where(edge_ok, top_idx, -1).T  # (K, L)
            new_dist = jnp.where(edge_ok, top_d, 0.0).T
            nbr_idx = lax.dynamic_update_slice(nbr_idx, new_idx[None], (slot, 0, 0))
            nbr_dist = lax.dynamic_update_slice(nbr_dist, new_dist[None], (slot, 0, 0))

            # -- flat-label component union ---------------------------------
            nbr_labels = jnp.where(
                edge_ok, jnp.take_along_axis(comp.T, top_idx, 1), N
            )  # (L, K); N = +inf sentinel
            min_nbr = jnp.min(nbr_labels, axis=1)  # (L,)
            own = jnp.where(valid, slot, N)
            new_label = jnp.minimum(min_nbr, own)
            # the new node takes new_label; every node labeled with any
            # connected neighbor's root relabels to new_label
            comp = lax.dynamic_update_slice(
                comp, jnp.where(valid, new_label, slot).astype(jnp.int32)[None], (slot, 0)
            )
            for kk in range(K):
                lbl = nbr_labels[:, kk]  # (L,)
                hitk = (comp == lbl[None, :]) & (lbl < N)[None, :]
                comp = jnp.where(hitk, new_label[None, :].astype(jnp.int32), comp)

            n_nodes = n_nodes + valid.astype(jnp.float32)
            conn = connected_now(comp)
            done = c["done"] | (jnp.bool_(stop_on_connect) & conn)

            return dict(
                states=states,
                node_active=node_active,
                nbr_idx=nbr_idx,
                nbr_dist=nbr_dist,
                comp=comp,
                n_nodes=n_nodes,
                slot=slot + 1,
                sampler=sampler,
                iter=c["iter"] + run.astype(jnp.int32),
                done=done,
                connected=c["connected"] | conn,
            )

        out = jax.lax.while_loop(cond, body, carry)
        return RoadmapArrays(
            states=out["states"],
            nbr_idx=out["nbr_idx"],
            nbr_dist=out["nbr_dist"],
            node_active=out["node_active"],
            comp=out["comp"],
            n_nodes=out["n_nodes"],
            iterations=out["iter"],
            connected=out["connected"],
            sampler=out["sampler"],
        )

    return grow


def astar_host(
    states: np.ndarray,  # (N, dim)
    nbr_idx: np.ndarray,  # (N, K)
    nbr_dist: np.ndarray,  # (N, K)
    active: np.ndarray,  # (N,)
    start: int,
    goals: List[int],
) -> Tuple[Optional[List[int]], float]:
    """Host A* over the undirected graph induced by forward adjacency
    (reference: planning/utils.hh:75-142). Heuristic: L2 to nearest goal."""
    N, K = nbr_idx.shape
    adj: List[List[Tuple[int, float]]] = [[] for _ in range(N)]
    for i in range(N):
        if not active[i]:
            continue
        for k in range(K):
            j = int(nbr_idx[i, k])
            if j < 0 or not active[j]:
                continue
            w = float(nbr_dist[i, k])
            adj[i].append((j, w))
            adj[j].append((i, w))

    goal_states = states[goals]

    def h(i):
        return float(np.min(np.linalg.norm(goal_states - states[i], axis=1)))

    goal_set = set(goals)
    g = np.full(N, np.inf)
    g[start] = 0.0
    parent = np.full(N, -1, np.int64)
    open_heap = [(h(start), start)]
    closed = np.zeros(N, bool)
    while open_heap:
        f, cur = heapq.heappop(open_heap)
        if closed[cur]:
            continue
        closed[cur] = True
        if cur in goal_set:
            path = [cur]
            while parent[path[-1]] >= 0:
                path.append(int(parent[path[-1]]))
            return path[::-1], float(g[cur])
        for (j, w) in adj[cur]:
            ng = g[cur] + w
            if ng < g[j]:
                g[j] = ng
                parent[j] = cur
                heapq.heappush(open_heap, (ng + h(j), j))
    return None, float("inf")


def prm_solve_batch(
    grow_fn,
    starts,
    goals,
    goal_mask,
    envs,
    samplers=None,
    base_rot=None,
    base_pos=None,
) -> List[PRMResult]:
    """Run the device grow loop, then recover paths with host A*."""
    rm = grow_fn(starts, goals, goal_mask, envs, samplers, base_rot, base_pos)
    states = np.asarray(rm.states).transpose(2, 1, 0)  # (L, N, dim)
    nbr_idx = np.asarray(rm.nbr_idx).transpose(2, 0, 1)  # (L, N, K)
    nbr_dist = np.asarray(rm.nbr_dist).transpose(2, 0, 1)
    active = np.asarray(rm.node_active).T  # (L, N)
    connected = np.asarray(rm.connected)
    iters = np.asarray(rm.iterations)
    sizes = np.asarray(rm.n_nodes).astype(int)
    gm = np.asarray(goal_mask)

    results = []
    L, G = gm.shape
    for l in range(L):
        goal_ids = [1 + g for g in range(G) if gm[l, g]]
        if not connected[l]:
            results.append(
                PRMResult(
                    path=np.zeros((0, states.shape[2]), np.float32),
                    cost=0.0,
                    iterations=int(iters[l]),
                    roadmap_size=int(sizes[l]),
                    solved=False,
                )
            )
            continue
        node_path, cost = astar_host(
            states[l], nbr_idx[l], nbr_dist[l], active[l], 0, goal_ids
        )
        solved = node_path is not None
        results.append(
            PRMResult(
                path=states[l][node_path] if solved else np.zeros((0, states.shape[2]), np.float32),
                cost=cost if solved else 0.0,
                iterations=int(iters[l]),
                roadmap_size=int(sizes[l]),
                solved=solved,
            )
        )
    return results
