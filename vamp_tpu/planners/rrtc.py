"""RRT-Connect: dynamic-domain, balanced, bidirectional, multi-goal.

Faithful re-architecture of the reference planner (planning/rrtc.hh:33-248)
as one jitted `lax.while_loop` over fixed-capacity arrays, vmappable so a
whole batch of independent problems advances per device step — the TPU
replacement for the reference's single-core loop.

Design: the reference's per-iteration control flow (extend, then a greedy
multi-step connect toward the other tree) is flattened into a two-mode state
machine — EXTEND steps sample/swap/extend exactly like rrtc.hh:99-158;
CONNECT steps validate one connect segment each (rrtc.hh:160-194). Every
loop step costs exactly one edge validation (a fused fkcc over the
interpolation tile), which keeps vmapped lanes doing identical work. The
Halton stream only advances on EXTEND steps, so sample sequences — and hence
grown trees and returned paths — match the reference's for the same stream.

Control-flow parity, line for line:
- tree balancing swap by size ratio            (rrtc.hh:101-109)
- Halton sample -> scale to joint space        (rrtc.hh:111-112)
- nearest by masked argmin (replaces nigh)     (rrtc.hh:117-123)
- dynamic-domain accept/reject + radius decay  (rrtc.hh:126-129, 229-240)
- range-clipped extension + validation         (rrtc.hh:133-158)
- greedy connect, one segment per step         (rrtc.hh:160-194)
- path recovery by parent walk from both trees (rrtc.hh:196-227)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..env import PackedEnvironment
from ..ops.fkcc import make_fkcc
from ..ops.validate import interpolate_edges, states_needed
from ..robots.spec import RobotSpec
from ..samplers.halton import HaltonState, halton_init, halton_next
from ..utils.settings import RRTCSettings
from .tree import masked_nearest

INF = jnp.float32(np.inf)
EXTEND, CONNECT = jnp.int8(0), jnp.int8(1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RRTCResult:
    path: jnp.ndarray  # (max_path, dim)
    path_length: jnp.ndarray  # () i32 — number of valid waypoints
    cost: jnp.ndarray  # () f32
    iterations: jnp.ndarray  # () i32 — sampling iterations (reference iter)
    solved: jnp.ndarray  # () bool
    tree_sizes: jnp.ndarray  # (2,) i32 (start, goal)
    sampler: HaltonState  # advanced sampler state (for simplify parity)


def make_rrtc(
    spec: RobotSpec,
    settings: RRTCSettings,
    n_goals: int = 1,
    max_path: int = 256,
):
    """Build `solve(start, goals, goal_mask, env, sampler, base_rot, base_pos)
    -> RRTCResult`. vmap over leading axes for batched problems."""

    fkcc = make_fkcc(spec)
    dim = spec.dimension
    res = spec.resolution
    N = settings.max_samples
    rng_range = jnp.float32(settings.range)

    diam = float(np.linalg.norm(spec.range))  # max possible C-space distance
    T_edge = states_needed(min(settings.range, diam), res)
    T_line = states_needed(diam, res)

    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def validate_one(start, vector, dist, env, base_rot, base_pos):
        configs = interpolate_edges(start[None], vector[None], dist[None], res, T_edge)
        v = fkcc(configs.reshape(-1, dim), env, base_rot, base_pos)
        return jnp.all(v)

    def validate_line(starts, vectors, dists, env, base_rot, base_pos):
        configs = interpolate_edges(starts, vectors, dists, res, T_line)
        v = fkcc(configs.reshape(-1, dim), env, base_rot, base_pos)
        return jnp.all(v.reshape(-1, T_line), axis=1)

    def solve(
        start: jnp.ndarray,  # (dim,)
        goals: jnp.ndarray,  # (G, dim)
        goal_mask: jnp.ndarray,  # (G,) bool
        env: PackedEnvironment,
        sampler: Optional[HaltonState] = None,
        base_rot: Optional[jnp.ndarray] = None,
        base_pos: Optional[jnp.ndarray] = None,
    ) -> RRTCResult:
        if sampler is None:
            sampler = halton_init(dim)
        br = jnp.eye(3, dtype=jnp.float32) if base_rot is None else base_rot
        bp = jnp.zeros(3, dtype=jnp.float32) if base_pos is None else base_pos
        G = goals.shape[0]

        # -- straight-line early exit (rrtc.hh:61-74) -----------------------
        line_vecs = goals - start[None, :]
        line_dists = jnp.linalg.norm(line_vecs, axis=1)
        starts_rep = jnp.broadcast_to(start, (G, dim))
        line_valid = validate_line(starts_rep, line_vecs, line_dists, env, br, bp)
        line_valid = line_valid & goal_mask
        any_line = jnp.any(line_valid)
        first_goal = jnp.argmax(line_valid)

        # -- tree buffers ---------------------------------------------------
        states = jnp.zeros((N, dim), jnp.float32).at[0].set(start)
        states = jax.lax.dynamic_update_slice(states, goals, (1, 0))
        parents = jnp.arange(N, dtype=jnp.int32)  # roots are self-parents
        radii = jnp.full((N,), INF)
        in_tree = jnp.zeros((N,), jnp.int8).at[1 : 1 + G].set(1)
        slot_active = jnp.zeros((N,), bool).at[0].set(True)
        slot_active = jax.lax.dynamic_update_slice(slot_active, goal_mask, (1,))
        n_goals_active = jnp.sum(goal_mask).astype(jnp.float32)

        carry = dict(
            states=states,
            parents=parents,
            radii=radii,
            in_tree=in_tree,
            slot_active=slot_active,
            free_index=jnp.int32(1 + G),
            sizes=jnp.stack([jnp.float32(1.0), n_goals_active]),
            # reference starts tree_a as the goal tree when start_tree_first
            # (rrtc.hh:77-79); the in-loop swap flips it on iteration one.
            tree_a=jnp.int8(1 if settings.start_tree_first else 0),
            sampler=sampler,
            iter=jnp.int32(0),
            done=jnp.bool_(any_line),
            mode=EXTEND,
            # connect-mode registers
            c_prior=jnp.zeros((dim,), jnp.float32),  # last connect waypoint
            c_prior_idx=jnp.int32(0),
            c_inc=jnp.zeros((dim,), jnp.float32),
            c_inc_len=jnp.float32(0.0),
            c_segs_left=jnp.int32(0),
            c_target=jnp.int32(0),  # other tree's nearest node
            tail_a=jnp.int32(0),
            tail_b=jnp.int32(0),
        )

        def cond(c):
            budget = (c["iter"] < settings.max_iterations) | (c["mode"] == CONNECT)
            return budget & (c["free_index"] < N) & (~c["done"])

        def body(c):
            states, parents, radii = c["states"], c["parents"], c["radii"]
            in_tree, slot_active = c["in_tree"], c["slot_active"]
            free_index, sizes, tree_a = c["free_index"], c["sizes"], c["tree_a"]
            extend = c["mode"] == EXTEND

            # ---------------- EXTEND-side computation ----------------------
            # balance swap (rrtc.hh:101-109); only on sampling iterations
            ta = tree_a.astype(jnp.int32)
            asize = sizes[ta]
            bsize = sizes[1 - ta]
            ratio = jnp.abs(asize - bsize) / asize
            if settings.balance:
                do_swap = ratio < settings.tree_ratio
            else:
                do_swap = jnp.bool_(True)
            tree_a = jnp.where(extend & do_swap, 1 - tree_a, tree_a).astype(jnp.int8)

            u, sampler_next = halton_next(c["sampler"])
            sampler = jax.tree.map(
                lambda new, old: jnp.where(extend, new, old), sampler_next, c["sampler"]
            )
            sample = u * scale + lower

            mask_a = slot_active & (in_tree == tree_a)
            near_idx, near_dist = masked_nearest(states, mask_a, sample)
            near_radius = radii[near_idx]
            dd_reject = jnp.bool_(settings.dynamic_domain) & (near_radius < near_dist)

            near_cfg = states[near_idx]
            vec = sample - near_cfg
            reach = near_dist < rng_range
            ext_vec = jnp.where(
                reach, vec, vec * (rng_range / jnp.maximum(near_dist, 1e-12))
            )
            ext_dist = jnp.where(reach, near_dist, rng_range)

            # ---------------- shared single edge validation -----------------
            v_start = jnp.where(extend, near_cfg, c["c_prior"])
            v_vec = jnp.where(extend, ext_vec, c["c_inc"])
            v_dist = jnp.where(extend, ext_dist, c["c_inc_len"])
            edge_valid = validate_one(v_start, v_vec, v_dist, env, br, bp)

            # ---------------- EXTEND bookkeeping ----------------------------
            ext_ok = extend & edge_valid & ~dd_reject
            new_cfg = jnp.where(ext_ok, near_cfg + ext_vec, c["c_prior"] + c["c_inc"])

            # dynamic-domain radius update (rrtc.hh:155-158, 229-240)
            grow = ext_ok & jnp.bool_(settings.dynamic_domain) & (near_radius != INF)
            shrink = (
                extend & ~edge_valid & ~dd_reject & jnp.bool_(settings.dynamic_domain)
            )
            shrunk = jnp.where(
                near_radius == INF,
                jnp.float32(settings.radius),
                jnp.maximum(near_radius * (1.0 - settings.alpha), settings.min_radius),
            )
            r_new = jnp.where(
                grow, near_radius * (1.0 + settings.alpha),
                jnp.where(shrink, shrunk, near_radius),
            )
            radii = radii.at[near_idx].set(r_new)

            # ---------------- CONNECT bookkeeping ---------------------------
            con_ok = (~extend) & edge_valid

            # ---------------- node insertion (both modes) -------------------
            ins = ext_ok | con_ok
            node_cfg = new_cfg
            node_parent = jnp.where(extend, near_idx, c["c_prior_idx"])
            states = states.at[free_index].set(
                jnp.where(ins, node_cfg, states[free_index])
            )
            parents = parents.at[free_index].set(
                jnp.where(ins, node_parent, parents[free_index])
            )
            in_tree = in_tree.at[free_index].set(
                jnp.where(ins, tree_a, in_tree[free_index])
            )
            slot_active = slot_active.at[free_index].set(
                slot_active[free_index] | ins
            )
            node_id = free_index
            free_index = free_index + ins.astype(jnp.int32)
            sizes = sizes.at[tree_a.astype(jnp.int32)].add(ins.astype(jnp.float32))

            # ---------------- connect-mode transitions ----------------------
            # On a successful extension, aim at the other tree (rrtc.hh:160-175).
            mask_b = slot_active & (in_tree == (1 - tree_a)) & (
                jnp.arange(N) != node_id
            )
            ob_idx, ob_dist = masked_nearest(states, mask_b, node_cfg)
            n_ext = jnp.maximum(jnp.ceil(ob_dist / rng_range), 1.0)
            start_connect = ext_ok
            segs_left = jnp.where(
                start_connect,
                n_ext.astype(jnp.int32),
                jnp.where(con_ok, c["c_segs_left"] - 1, 0),
            )
            connected = con_ok & (segs_left == 0)

            c_inc = jnp.where(
                start_connect, (states[ob_idx] - node_cfg) / n_ext, c["c_inc"]
            )
            c_inc_len = jnp.where(start_connect, ob_dist / n_ext, c["c_inc_len"])
            c_target = jnp.where(start_connect, ob_idx, c["c_target"])
            c_prior = jnp.where(ins, node_cfg, c["c_prior"])
            c_prior_idx = jnp.where(ins, node_id, c["c_prior_idx"])

            in_connect = (start_connect | con_ok) & ~connected & (free_index < N)
            mode = jnp.where(in_connect, CONNECT, EXTEND).astype(jnp.int8)

            tail_a = jnp.where(connected, node_id, c["tail_a"])
            tail_b = jnp.where(connected, c_target, c["tail_b"])

            return dict(
                states=states,
                parents=parents,
                radii=radii,
                in_tree=in_tree,
                slot_active=slot_active,
                free_index=free_index,
                sizes=sizes,
                tree_a=tree_a,
                sampler=sampler,
                iter=c["iter"] + extend.astype(jnp.int32),
                done=c["done"] | connected,
                mode=mode,
                c_prior=c_prior,
                c_prior_idx=c_prior_idx,
                c_inc=c_inc,
                c_inc_len=c_inc_len,
                c_segs_left=segs_left,
                c_target=c_target,
                tail_a=tail_a,
                tail_b=tail_b,
            )

        out = jax.lax.while_loop(cond, body, carry)

        # -- path recovery (rrtc.hh:196-227) --------------------------------
        states, parents = out["states"], out["parents"]
        tree_a_end = out["tree_a"]

        def walk(tail):
            def step(i, acc):
                buf, cur, length = acc
                buf = buf.at[i].set(cur)
                nxt = parents[cur]
                length = jnp.where(cur == nxt, length, length + 1)
                return buf, nxt, length

            buf = jnp.zeros((max_path,), jnp.int32)
            buf, _, length = jax.lax.fori_loop(
                0, max_path, step, (buf, tail, jnp.int32(1))
            )
            return buf, length

        chain_a, len_a = walk(out["tail_a"])
        # The reference pushes only the connect target's ANCESTORS (the target
        # config equals the last inserted connect node, rrtc.hh:210-219).
        b_root = parents[out["tail_b"]] == out["tail_b"]
        chain_b, len_b = walk(parents[out["tail_b"]])
        len_b = jnp.where(b_root, 0, len_b)
        total = len_a + len_b

        pos = jnp.arange(max_path)
        idx_a = jnp.clip(len_a - 1 - pos, 0, max_path - 1)
        idx_b = jnp.clip(pos - len_a, 0, max_path - 1)
        seq = jnp.where(pos < len_a, chain_a[idx_a], chain_b[idx_b])
        # tree_a holds the start tree iff tree_a == 0; otherwise flip so the
        # path runs start -> goal (rrtc.hh:221-224).
        flipped = jnp.clip(total - 1 - pos, 0, max_path - 1)
        seq = jnp.where(tree_a_end == 0, seq, seq[flipped])
        path = states[seq]

        line_path = (
            jnp.zeros((max_path, dim), jnp.float32)
            .at[0]
            .set(start)
            .at[1]
            .set(goals[first_goal])
        )
        path = jnp.where(any_line, line_path, path)
        total = jnp.where(any_line, 2, total)

        deltas = jnp.linalg.norm(path[1:] - path[:-1], axis=1)
        seg_mask = jnp.arange(1, max_path) < total
        cost = jnp.sum(jnp.where(seg_mask, deltas, 0.0))

        solved = out["done"]
        return RRTCResult(
            path=path,
            path_length=jnp.where(solved, total, 0).astype(jnp.int32),
            cost=jnp.where(solved, cost, jnp.float32(0.0)),
            iterations=out["iter"],
            solved=solved,
            tree_sizes=out["sizes"].astype(jnp.int32),
            sampler=out["sampler"],
        )

    return solve
