"""Conflict-Based Search multi-robot planning over per-robot PRM roadmaps.

The reference fork planned a CBSPlanner (MR_DEV_PLAN.md:212-217 "Implement
Conflict-Based Search / Handle constraints and conflicts") but never built it;
this module delivers it in the CBS-on-roadmaps formulation (CBS-MP style):

- Each robot gets a PRM roadmap in the shared static environment (built by the
  batched TPU PRM, planners/prm.py — roadmap edges are already statically
  valid, so CBS only has to resolve robot-robot conflicts).
- The low level is time-expanded A* over (vertex, timestep) with wait moves;
  a constraint (t, spheres) forbids colliding with a specific sphere sweep
  during step t.
- The high level is the standard CBS constraint tree: find the first
  robot-robot conflict on the synchronized timeline, branch into two children
  each constraining one robot away from the other's conflicting motion,
  replan only that robot.

Motion-motion collision uses sphere sweeps precomputed ON DEVICE in one
batched FK evaluation per robot (every roadmap edge x K synchronized
fractions x all robot spheres), after which conflict checks are cheap host
numpy reductions — the same split the rest of the framework uses (device for
FK/geometry batch work, host for pointer-chasing search, like PRM's host A*).
"""

from __future__ import annotations

import heapq
import itertools
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


K_FRACTIONS = 8  # synchronized interpolation fractions per timestep


@dataclass
class _RobotGraph:
    """One robot's roadmap with precomputed sphere sweeps."""

    vertices: np.ndarray  # (N, dim)
    adj: List[List[int]]  # symmetric adjacency
    start: int
    goal: int
    h: np.ndarray  # (N,) admissible cost-to-goal (graph Dijkstra)
    edge_spheres: Dict[Tuple[int, int], np.ndarray]  # (u,v) -> (K, S, 4)
    edge_cost: Dict[Tuple[int, int], float]

    def spheres(self, u: int, v: int) -> np.ndarray:
        key = (u, v) if u <= v else (v, u)
        s = self.edge_spheres[key]
        return s if u <= v else s[::-1]

    def cost(self, u: int, v: int) -> float:
        if u == v:
            return 0.0
        key = (u, v) if u <= v else (v, u)
        return self.edge_cost[key]


def _build_robot_graph(robot, start, goal, env, settings) -> Optional[_RobotGraph]:
    """PRM roadmap + device-batched sphere sweep table for one robot."""
    from ..multi_robot import _cached_fk

    rm = robot.roadmap(start, goal, env, settings)
    vertices = np.asarray(rm["vertices"], np.float32)
    fwd = rm["edges"]
    n = len(vertices)
    adj: List[set] = [set() for _ in range(n)]
    for u, nbrs in enumerate(fwd):
        for v in nbrs:
            adj[u].add(v)
            adj[v].add(u)
    adj = [sorted(a) for a in adj]

    # heuristic: Dijkstra from goal over edge lengths
    h = np.full(n, np.inf)
    h[1] = 0.0
    pq = [(0.0, 1)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > h[u]:
            continue
        for v in adj[u]:
            nd = d + float(np.linalg.norm(vertices[u] - vertices[v]))
            if nd < h[v]:
                h[v] = nd
                heapq.heappush(pq, (nd, v))
    if not np.isfinite(h[0]):
        return None  # start and goal not connected in the static roadmap

    # canonical edges (u <= v), including self-sweeps (wait at a vertex)
    edges = sorted({(min(u, v), max(u, v)) for u in range(n) for v in adj[u]} | {(u, u) for u in range(n)})
    fr = np.linspace(0.0, 1.0, K_FRACTIONS, dtype=np.float32)
    ua = vertices[[e[0] for e in edges]]  # (E, dim)
    va = vertices[[e[1] for e in edges]]
    states = ua[:, None, :] + fr[None, :, None] * (va - ua)[:, None, :]  # (E, K, dim)
    E = len(edges)
    flat = states.reshape(E * K_FRACTIONS, -1)
    fk = _cached_fk(robot.spec)
    xs, ys, zs = fk(jnp.asarray(flat.T))  # (S, E*K)
    S = robot.spec.n_spheres
    centers = np.stack([np.asarray(xs), np.asarray(ys), np.asarray(zs)], axis=-1)  # (S, E*K, 3)
    centers = centers.transpose(1, 0, 2).reshape(E, K_FRACTIONS, S, 3)
    radii = np.broadcast_to(robot.spec.sphere_radius[None, None, :, None], (E, K_FRACTIONS, S, 1))
    sweeps = np.concatenate([centers, radii], axis=-1).astype(np.float32)

    edge_spheres = {e: sweeps[i] for i, e in enumerate(edges)}
    edge_cost = {e: float(np.linalg.norm(vertices[e[0]] - vertices[e[1]])) for e in edges}
    return _RobotGraph(
        vertices=vertices, adj=adj, start=0, goal=1, h=h,
        edge_spheres=edge_spheres, edge_cost=edge_cost,
    )


def _motions_collide(sa: np.ndarray, sb: np.ndarray) -> bool:
    """Two synchronized sphere sweeps (K, S, 4) collide at some fraction."""
    d = sa[:, :, None, :3] - sb[:, None, :, :3]
    rs = sa[:, :, None, 3] + sb[:, None, :, 3]
    return bool(np.any(np.sum(d * d, axis=-1) < rs * rs))


def _low_level(
    g: _RobotGraph,
    constraints: Dict[int, List[np.ndarray]],
    t_max: int,
) -> Optional[Tuple[List[int], float]]:
    """Time-expanded A* over (vertex, t) with wait moves.

    A constraint at time t is a sphere sweep the robot's step-t motion must
    not collide with. Returns (vertex path of length T+1, cost) or None.
    """
    t_req = (max(constraints) + 1) if constraints else 0
    start_key = (g.start, 0)
    open_heap = [(g.h[g.start], 0.0, next(_COUNTER), start_key)]
    g_cost = {start_key: 0.0}
    parent: Dict[Tuple[int, int], Tuple[int, int]] = {}
    while open_heap:
        f, gc, _, (v, t) = heapq.heappop(open_heap)
        if gc > g_cost.get((v, t), np.inf):
            continue
        if v == g.goal and t >= t_req:
            path = [v]
            key = (v, t)
            while key in parent:
                key = parent[key]
                path.append(key[0])
            return path[::-1], gc
        if t >= t_max:
            continue
        cons_t = constraints.get(t)
        for w in itertools.chain(g.adj[v], (v,)):
            if cons_t is not None:
                sweep = g.spheres(v, w)
                if any(_motions_collide(sweep, c) for c in cons_t):
                    continue
            ng = gc + g.cost(v, w)
            key = (w, t + 1)
            if ng < g_cost.get(key, np.inf) - 1e-12:
                g_cost[key] = ng
                parent[key] = (v, t)
                heapq.heappush(open_heap, (ng + g.h[w], ng, next(_COUNTER), key))
    return None


_COUNTER = itertools.count()


@dataclass
class _CTNode:
    paths: List[List[int]]  # per-robot vertex sequences
    costs: List[float]
    constraints: List[Dict[int, List[np.ndarray]]]  # per robot: t -> sweeps

    @property
    def cost(self) -> float:
        return sum(self.costs)


def _first_conflict(graphs: List[_RobotGraph], paths: List[List[int]]):
    """First (i, j, t) where robots i and j collide during step t on the
    synchronized timeline (shorter paths park at their goals)."""
    T = max(len(p) for p in paths) - 1
    motions = []
    for g, p in zip(graphs, paths):
        padded = p + [p[-1]] * (T + 1 - len(p))
        motions.append([(padded[t], padded[t + 1]) for t in range(T)])
    for t in range(T):
        for i in range(len(paths)):
            si = graphs[i].spheres(*motions[i][t])
            for j in range(i + 1, len(paths)):
                sj = graphs[j].spheres(*motions[j][t])
                if _motions_collide(si, sj):
                    return i, j, t, motions[i][t], motions[j][t]
    return None


def cbs_plan(
    robots: Sequence,
    starts: Sequence,
    goals: Sequence,
    env,
    roadmap_settings=None,
    t_max: int = 64,
    max_ct_nodes: int = 128,
):
    """Plan all robots with CBS. Returns (paths (list of (T, dim_i)), cost,
    iterations) or None when unsolved within the budgets.

    `robots` are multi_robot.Robot instances (base pose baked into FK, so all
    sweeps are in world frame and cross-robot sphere checks need no extra
    transforms).
    """
    from ..utils.settings import RoadmapSettings

    if roadmap_settings is None:
        roadmap_settings = RoadmapSettings(max_iterations=512, max_samples=512)

    graphs = []
    for r, s, q in zip(robots, starts, goals):
        g = _build_robot_graph(r, s, q, env, roadmap_settings)
        if g is None:
            return None
        graphs.append(g)

    root_paths, root_costs = [], []
    for g in graphs:
        res = _low_level(g, {}, t_max)
        if res is None:
            return None
        root_paths.append(res[0])
        root_costs.append(res[1])

    open_heap = [(sum(root_costs), next(_COUNTER), _CTNode(root_paths, root_costs, [dict() for _ in graphs]))]
    expansions = 0
    while open_heap and expansions < max_ct_nodes:
        _, _, node = heapq.heappop(open_heap)
        expansions += 1
        conflict = _first_conflict(graphs, node.paths)
        if conflict is None:
            paths = []
            for g, p in zip(graphs, node.paths):
                T = max(len(q) for q in node.paths)
                padded = p + [p[-1]] * (T - len(p))
                paths.append(g.vertices[padded])
            return paths, float(node.cost), expansions
        i, j, t, mi, mj = conflict
        for (a, b, mb) in ((i, j, mj), (j, i, mi)):
            cons = [dict((k, list(v)) for k, v in c.items()) for c in node.constraints]
            cons[a].setdefault(t, []).append(graphs[b].spheres(*mb).copy())
            res = _low_level(graphs[a], cons[a], t_max)
            if res is None:
                continue
            new_paths = list(node.paths)
            new_costs = list(node.costs)
            new_paths[a], new_costs[a] = res
            heapq.heappush(
                open_heap, (sum(new_costs), next(_COUNTER), _CTNode(new_paths, new_costs, cons))
            )
    return None
