"""AORRTC: anytime-optimal RRT-Connect — batched.

Reference: planning/aorrtc.hh. Meta-algorithm (aorrtc.hh:457-563): RRT-Connect
until an initial solution, simplify, then repeatedly run AOX_RRTC — an
RRT-Connect in cost-augmented space bounded by the best cost so far — with
PHS informed sampling (single-goal), simplifying and keeping each improved
solution.

The inner AOX_RRTC (aorrtc.hh:19-449) re-architected on the batched slot-major
machinery of planners/rrtc.py, with the cost augmentation:
- every node carries its cost-to-root g; samples draw an upper cost bound
  c_rand = u * max(max_cost - f_hat, 0) + g_hat (aorrtc.hh:169-180);
- "nearest" = argmin of the cost-augmented metric sqrt(d^2 + (g - c_rand)^2)
  over nodes that satisfy the bound (g == 0 or c_rand >= g + d) — exactly the
  node the reference's sorted r-disc scan stops at (aorrtc.hh:40-46,192-207),
  computed as one masked chunked sweep instead of a GNAT walk;
- connect to the other tree only under bound max_cost - new_cost
  (aorrtc.hh:322-365), one segment per step (CONNECT mode), accumulating g
  along the chain.

Deliberate deviations (documented):
- the reference's parent cost-resampling loop (cost_bound_resample,
  aorrtc.hh:238-305) re-queries the tree an UNBOUNDED number of times per
  insertion; here it is implemented as a bounded number of batched re-parent
  rounds (`cost_bound_resample` below, default on, round count from
  AORRTCSettings.cost_bound_resample_rounds — the reference loop typically
  exits within a couple of rounds via its same-parent / no-improvement /
  invalid-edge checks);
- the scalar uniforms (cost bound, PHS radius) come from a per-lane
  counter-based jax.random stream instead of the RNG's embedded mt19937
  (random/distribution.hh) — the reference's stream is not reproducible
  cross-platform anyway.

The meta loop lives in Python (jitted stages): rrtc -> simplify -> rounds of
(aox -> simplify), all batched over lanes.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..env import PackedEnvironment
from ..ops.fkcc_bm import make_fkcc_planner
from ..ops.validate import RAKE
from ..robots.spec import RobotSpec
from ..samplers.halton import HaltonState, halton_init_batch, halton_next
from ..samplers.phs import PHS, phs_init, phs_transform, uniform_in_ball
from ..utils.settings import AORRTCSettings, RRTCSettings
from .rrtc import RRTCResult, make_rrtc_batch, _tile_states
from .simplify import make_simplify_batch

INF = jnp.float32(np.inf)
BIG = jnp.float32(3.4e38)
EXTEND, CONNECT = jnp.int8(0), jnp.int8(1)


def make_aox_rrtc_batch(
    spec: RobotSpec,
    settings: AORRTCSettings,
    max_path: int = 256,
):
    """Build the inner cost-bounded search:

    `solve(starts (L,dim), goals (L,dim), envs, samplers, max_costs (L,),
    rng_key, use_phs) -> RRTCResult` (single goal; reference uses plain
    sampling for multi-goal AORRTC)."""
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    rs = settings.rrtc
    N = rs.max_samples
    rng_range = jnp.float32(rs.range)
    diam = float(np.linalg.norm(spec.range))
    T_edge = _tile_states(min(rs.range, diam), res)
    lower = jnp.asarray(spec.lower)
    upper = jnp.asarray(spec.upper)
    scale = jnp.asarray(spec.range)

    def validate_lanes(starts_bm, vecs_bm, dists, envs, br, bp):
        n = jnp.maximum(jnp.ceil(dists * (res / RAKE)), 1.0)
        total = RAKE * n
        j = jnp.arange(1, T_edge + 1, dtype=jnp.float32)
        frac = jnp.minimum(j[:, None], total[None, :]) / total[None, :]
        q = starts_bm[:, None, :] + vecs_bm[:, None, :] * frac[None]
        ok = fkcc(q, envs, br, bp)
        return jnp.all(ok, axis=0)

    CH = min(256, N)

    def solve(
        starts,  # (L, dim)
        goals,  # (L, G, dim) — goal tree seeded with every live goal
        envs: PackedEnvironment,
        samplers: HaltonState,
        max_costs,  # (L,) current best path costs (upper bounds)
        rng_key,
        use_phs: bool = True,
        goal_mask=None,  # (L, G) bool
        base_rot=None,
        base_pos=None,
    ) -> RRTCResult:
        L, G = goals.shape[0], goals.shape[1]
        if goal_mask is None:
            goal_mask = jnp.ones((L, G), bool)
        br, bp = base_rot, base_pos
        # unsolved lanes carry inf bounds; clamp to a finite bound so the PHS
        # transform stays well-defined (it then covers the whole joint space)
        diam_f = jnp.float32(float(np.linalg.norm(np.asarray(spec.range))))
        max_costs = jnp.minimum(max_costs, 8.0 * diam_f)
        # PHS is only used single-goal (reference aorrtc.hh:518,528-535)
        phs = phs_init(starts, goals[:, 0])
        start_bm = starts.T  # (dim, L)
        goals_bm = goals.transpose(2, 1, 0)  # (dim, G, L)

        states = jnp.zeros((dim, N, L), jnp.float32)
        states = lax.dynamic_update_slice(states, start_bm[:, None, :], (0, 0, 0))
        states = lax.dynamic_update_slice(states, goals_bm, (0, 1, 0))
        parents = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))
        radii = jnp.full((N, L), INF)
        g_cost = jnp.zeros((N, L), jnp.float32)  # cost to own tree root
        in_tree = jnp.zeros((N, L), jnp.int8)
        in_tree = lax.dynamic_update_slice(
            in_tree, jnp.ones((G, L), jnp.int8), (1, 0)
        )
        slot_active = jnp.zeros((N, L), bool).at[0].set(True)
        slot_active = lax.dynamic_update_slice(slot_active, goal_mask.T, (1, 0))
        iota_N = jnp.arange(N, dtype=jnp.int32)[:, None]

        carry = dict(
            states=states,
            parents=parents,
            radii=radii,
            g=g_cost,
            in_tree=in_tree,
            slot_active=slot_active,
            slot=jnp.int32(1 + G),
            sizes=jnp.stack(
                [jnp.ones((L,)), jnp.sum(goal_mask, axis=1).astype(jnp.float32)]
            ),
            tree_a=jnp.full((L,), 1 if rs.start_tree_first else 0, jnp.int8),
            sampler=samplers,
            key=rng_key,
            iter=jnp.zeros((L,), jnp.int32),
            done=jnp.zeros((L,), bool),
            mode=jnp.full((L,), 0, jnp.int8),
            c_prior=jnp.zeros((dim, L), jnp.float32),
            c_prior_idx=jnp.zeros((L,), jnp.int32),
            c_prior_g=jnp.zeros((L,), jnp.float32),
            c_inc=jnp.zeros((dim, L), jnp.float32),
            c_inc_len=jnp.zeros((L,), jnp.float32),
            c_segs_left=jnp.zeros((L,), jnp.int32),
            c_target=jnp.zeros((L,), jnp.int32),
            tail_a=jnp.zeros((L,), jnp.int32),
            tail_b=jnp.zeros((L,), jnp.int32),
            steps=jnp.int32(0),
        )

        def running(c):
            budget = (c["iter"] < rs.max_iterations) | (c["mode"] == CONNECT)
            return budget & (~c["done"])

        def cond(c):
            return jnp.any(running(c)) & (c["slot"] < N)

        def bounded_nearest(states, g, mask, q_bm, c_rand, bound_slot):
            """argmin over eligible nodes of sqrt(d^2 + (g - c_rand)^2),
            eligible = (g == 0) | (c_rand >= g + d). Returns (idx, eucl_dist,
            cfg, g_of, radius?) via chunked sweep."""
            n_chunks = (bound_slot + CH - 1) // CH

            def chunk(ci, carry):
                best_aox, best_idx, best_cfg, best_g, best_d = carry
                off = ci * CH
                blk = lax.dynamic_slice(states, (0, off, 0), (dim, CH, L))
                mblk = lax.dynamic_slice(mask, (off, 0), (CH, L))
                gblk = lax.dynamic_slice(g, (off, 0), (CH, L))
                d2 = jnp.sum((blk - q_bm[:, None, :]) ** 2, axis=0)  # (CH, L)
                d = jnp.sqrt(d2)
                eligible = mblk & ((gblk == 0.0) | (c_rand[None, :] >= gblk + d))
                aox = jnp.sqrt(d2 + (gblk - c_rand[None, :]) ** 2)
                aox = jnp.where(eligible, aox, BIG)
                ci_min = jnp.min(aox, axis=0)
                ci_arg = jnp.argmin(aox, axis=0).astype(jnp.int32)
                oh = jnp.arange(CH, dtype=jnp.int32)[:, None] == ci_arg[None, :]
                ci_cfg = jnp.sum(jnp.where(oh[None], blk, 0.0), axis=1)
                ci_g = jnp.sum(jnp.where(oh, gblk, 0.0), axis=0)
                ci_d = jnp.sum(jnp.where(oh, d, 0.0), axis=0)
                better = ci_min < best_aox
                return (
                    jnp.minimum(best_aox, ci_min),
                    jnp.where(better, ci_arg + off, best_idx),
                    jnp.where(better[None], ci_cfg, best_cfg),
                    jnp.where(better, ci_g, best_g),
                    jnp.where(better, ci_d, best_d),
                )

            init = (
                jnp.full((L,), BIG),
                jnp.zeros((L,), jnp.int32),
                jnp.zeros((dim, L), jnp.float32),
                jnp.zeros((L,), jnp.float32),
                jnp.zeros((L,), jnp.float32),
            )
            out = lax.while_loop(
                lambda c: c[0] < n_chunks,
                lambda c: (c[0] + 1, chunk(c[0], c[1])),
                (jnp.int32(0), init),
            )[1]
            return out[1], out[4], out[2], out[3]

        def body(c):
            states, parents, radii, g = c["states"], c["parents"], c["radii"], c["g"]
            in_tree, slot_active = c["in_tree"], c["slot_active"]
            slot, sizes, tree_a = c["slot"], c["sizes"], c["tree_a"]
            run = running(c)
            is_ext = c["mode"] == EXTEND
            extend = run & is_ext

            # balance swap
            ta_oh = jnp.stack([tree_a == 0, tree_a == 1]).astype(jnp.float32)
            asize = jnp.sum(sizes * ta_oh, axis=0)
            bsize = jnp.sum(sizes * (1.0 - ta_oh), axis=0)
            ratio = jnp.abs(asize - bsize) / asize
            do_swap = (
                jnp.full((L,), True) if not rs.balance else ratio < rs.tree_ratio
            )
            tree_a = jnp.where(extend & do_swap, 1 - tree_a, tree_a).astype(jnp.int8)

            # -- informed sample + cost bound (aorrtc.hh:146-180) -----------
            u, sampler_next = halton_next(c["sampler"])
            sampler = jax.tree.map(
                lambda new, old: jnp.where(
                    extend if new.ndim == 1 else extend[None], new, old
                ),
                sampler_next,
                c["sampler"],
            )
            key = jax.random.wrap_key_data(c["key"])
            key, k1, k2, k3 = jax.random.split(key, 4)
            u_rad = jax.random.uniform(k1, (L,))
            u_cost = jax.random.uniform(k2, (L,))
            n_resample = (
                settings.cost_bound_resample_rounds if settings.cost_bound_resample else 0
            )
            u_resample = jax.random.uniform(k3, (max(n_resample, 1), L))
            new_key = jax.random.key_data(key)

            if use_phs:
                ball = uniform_in_ball(u, u_rad)
                sample = phs_transform(phs, ball, max_costs)
                sample = jnp.clip(sample, lower[:, None], upper[:, None])
            else:
                sample = u * scale[:, None] + lower[:, None]

            # root of tree_a (start when tree_a == 0 else the CLOSEST live
            # goal to the sample — the reference's multi-goal optimistic f^,
            # aorrtc.hh:154-166)
            a_is_start = tree_a == 0
            gd = jnp.linalg.norm(sample[:, None, :] - goals_bm, axis=0)  # (G, L)
            gd = jnp.where(goal_mask.T, gd, INF)
            g_near = jnp.argmin(gd, axis=0)  # (L,)
            oh_g = jnp.arange(G)[:, None] == g_near[None, :]
            closest_goal_bm = jnp.sum(jnp.where(oh_g[None], goals_bm, 0.0), axis=1)
            root_bm = jnp.where(a_is_start[None, :], start_bm, closest_goal_bm)
            target_bm = jnp.where(a_is_start[None, :], closest_goal_bm, start_bm)
            g_hat = jnp.linalg.norm(sample - root_bm, axis=0)
            h_hat = jnp.linalg.norm(sample - target_bm, axis=0)
            c_range = jnp.maximum(max_costs - (g_hat + h_hat), 0.0)
            c_rand = u_cost * c_range + g_hat

            mask_a = slot_active & (in_tree == tree_a[None, :])
            near_idx, near_dist, near_cfg, near_g = bounded_nearest(
                states, g, mask_a, sample, c_rand, slot
            )
            oh_near = iota_N == near_idx[None, :]
            near_radius = jnp.sum(jnp.where(oh_near, radii, 0.0), axis=0)
            dd_reject = jnp.bool_(rs.dynamic_domain) & (near_radius < near_dist)

            vec = sample - near_cfg
            reach = near_dist < rng_range
            ext_vec = jnp.where(
                reach[None], vec, vec * (rng_range / jnp.maximum(near_dist, 1e-12))[None]
            )
            ext_dist = jnp.where(reach, near_dist, rng_range)

            v_start = jnp.where(is_ext[None], near_cfg, c["c_prior"])
            v_vec = jnp.where(is_ext[None], ext_vec, c["c_inc"])
            v_dist = jnp.where(is_ext, ext_dist, c["c_inc_len"])
            edge_valid = validate_lanes(v_start, v_vec, v_dist, envs, br, bp)

            ext_ok = extend & edge_valid & ~dd_reject
            con_ok = run & (c["mode"] == CONNECT) & edge_valid
            new_cfg = jnp.where(
                ext_ok[None], near_cfg + ext_vec, c["c_prior"] + c["c_inc"]
            )
            # -- parent cost-bound resampling (aorrtc.hh:238-305) -----------
            # The reference re-draws the cost bound and re-queries the tree
            # until a same-parent / no-improvement / invalid-edge exit; here
            # the loop is bounded at `cost_bound_resample_rounds` batched
            # rounds (each = one sweep + one edge validation, all lanes).
            parent_ext = near_idx
            g_ext = near_g + ext_dist
            if n_resample:
                ghat2 = jnp.linalg.norm(new_cfg - root_bm, axis=0)
                resampling = ext_ok
                for rr in range(n_resample):
                    c_range2 = jnp.maximum(g_ext - ghat2, 0.0)
                    c_rand2 = u_resample[rr] * c_range2 + ghat2
                    idx2, d2, cfg2, g2 = bounded_nearest(
                        states, g, mask_a, new_cfg, c_rand2, slot
                    )
                    better = (
                        (idx2 != parent_ext)
                        & (g2 + d2 < g_ext)
                        & (c_range2 > 0.0)
                    )
                    cand = resampling & better
                    ok2 = validate_lanes(cfg2, new_cfg - cfg2, d2, envs, br, bp)
                    accept = cand & ok2
                    parent_ext = jnp.where(accept, idx2, parent_ext)
                    g_ext = jnp.where(accept, g2 + d2, g_ext)
                    resampling = accept  # any exit condition stops the lane

            new_g = jnp.where(ext_ok, g_ext, c["c_prior_g"] + c["c_inc_len"])

            # dynamic-domain updates (shared with rrtc semantics)
            grow = ext_ok & jnp.bool_(rs.dynamic_domain) & (near_radius != INF)
            shrink = extend & ~edge_valid & ~dd_reject & jnp.bool_(rs.dynamic_domain)
            shrunk = jnp.where(
                near_radius == INF,
                jnp.float32(rs.radius),
                jnp.maximum(near_radius * (1.0 - rs.alpha), rs.min_radius),
            )
            r_new = jnp.where(
                grow, near_radius * (1.0 + rs.alpha), jnp.where(shrink, shrunk, near_radius)
            )
            radii = jnp.where(oh_near & (grow | shrink)[None, :], r_new[None, :], radii)

            # insertion at shared slot
            ins = ext_ok | con_ok
            node_parent = jnp.where(is_ext, parent_ext, c["c_prior_idx"])
            states = lax.dynamic_update_slice(states, new_cfg[:, None, :], (0, slot, 0))
            parents = lax.dynamic_update_slice(parents, node_parent[None, :], (slot, 0))
            g = lax.dynamic_update_slice(g, new_g[None, :], (slot, 0))
            in_tree = lax.dynamic_update_slice(in_tree, tree_a[None, :], (slot, 0))
            slot_active = lax.dynamic_update_slice(slot_active, ins[None, :], (slot, 0))
            node_id = slot
            slot = slot + 1
            ta2_oh = jnp.stack([tree_a == 0, tree_a == 1]).astype(jnp.float32)
            sizes = sizes + ta2_oh * ins[None, :].astype(jnp.float32)

            # -- bounded connect toward tree_b (aorrtc.hh:322-365) ----------
            mask_b = slot_active & (in_tree == (1 - tree_a)[None, :])
            bound_b = max_costs - new_g
            ob_idx, ob_dist, ob_cfg, ob_g = bounded_nearest(
                states, g, mask_b, new_cfg, bound_b, slot
            )
            improves = (new_g + ob_dist + ob_g) < max_costs
            n_ext = jnp.maximum(jnp.ceil(ob_dist / rng_range), 1.0)
            start_connect = ext_ok & improves
            segs_left = jnp.where(
                start_connect,
                n_ext.astype(jnp.int32),
                jnp.where(con_ok, c["c_segs_left"] - 1, jnp.int32(0)),
            )
            connected = con_ok & (segs_left == 0)

            c_inc = jnp.where(
                start_connect[None], (ob_cfg - new_cfg) / n_ext[None], c["c_inc"]
            )
            c_inc_len = jnp.where(start_connect, ob_dist / n_ext, c["c_inc_len"])
            c_target = jnp.where(start_connect, ob_idx, c["c_target"])
            c_prior = jnp.where(ins[None], new_cfg, c["c_prior"])
            c_prior_idx = jnp.where(ins, node_id, c["c_prior_idx"])
            c_prior_g = jnp.where(ins, new_g, c["c_prior_g"])

            in_connect = (start_connect | con_ok) & ~connected
            mode = jnp.where(run, jnp.where(in_connect, 1, 0), c["mode"]).astype(jnp.int8)

            tail_a = jnp.where(connected, node_id, c["tail_a"])
            tail_b = jnp.where(connected, c_target, c["tail_b"])

            return dict(
                states=states,
                parents=parents,
                radii=radii,
                g=g,
                in_tree=in_tree,
                slot_active=slot_active,
                slot=slot,
                sizes=sizes,
                tree_a=tree_a,
                sampler=sampler,
                key=new_key,
                iter=c["iter"] + extend.astype(jnp.int32),
                done=c["done"] | connected,
                mode=mode,
                c_prior=c_prior,
                c_prior_idx=c_prior_idx,
                c_prior_g=c_prior_g,
                c_inc=c_inc,
                c_inc_len=c_inc_len,
                c_segs_left=segs_left,
                c_target=c_target,
                tail_a=tail_a,
                tail_b=tail_b,
                steps=c["steps"] + 1,
            )

        out = lax.while_loop(cond, body, carry)

        # -- path recovery (same as rrtc) -----------------------------------
        states_lm = out["states"].transpose(2, 1, 0)
        parents_lm = out["parents"].T
        tree_a_end = out["tree_a"]
        lanes = jnp.arange(L)

        def walk(tail):
            def step(i, acc):
                buf, cur, length = acc
                buf = buf.at[:, i].set(cur)
                nxt = jnp.take_along_axis(parents_lm, cur[:, None], 1)[:, 0]
                length = jnp.where(cur == nxt, length, length + 1)
                return buf, nxt, length

            buf = jnp.zeros((L, max_path), jnp.int32)
            buf, _, length = lax.fori_loop(
                0, max_path, step, (buf, tail, jnp.ones((L,), jnp.int32))
            )
            return buf, length

        chain_a, len_a = walk(out["tail_a"])
        tb_parent = jnp.take_along_axis(parents_lm, out["tail_b"][:, None], 1)[:, 0]
        b_root = tb_parent == out["tail_b"]
        chain_b, len_b = walk(tb_parent)
        len_b = jnp.where(b_root, 0, len_b)
        total = len_a + len_b

        pos = jnp.arange(max_path)[None, :]
        idx_a = jnp.clip(len_a[:, None] - 1 - pos, 0, max_path - 1)
        idx_b = jnp.clip(pos - len_a[:, None], 0, max_path - 1)
        seq = jnp.where(
            pos < len_a[:, None],
            jnp.take_along_axis(chain_a, idx_a, 1),
            jnp.take_along_axis(chain_b, idx_b, 1),
        )
        flipped_idx = jnp.clip(total[:, None] - 1 - pos, 0, max_path - 1)
        seq = jnp.where(
            (tree_a_end == 0)[:, None], seq, jnp.take_along_axis(seq, flipped_idx, 1)
        )
        path = jnp.take_along_axis(states_lm, seq[:, :, None], 1)

        deltas = jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=2)
        seg_mask = jnp.arange(1, max_path)[None, :] < total[:, None]
        cost = jnp.sum(jnp.where(seg_mask, deltas, 0.0), axis=1)

        solved = out["done"]
        return RRTCResult(
            path=path,
            path_length=jnp.where(solved, total, 0).astype(jnp.int32),
            cost=jnp.where(solved, cost, 0.0),
            iterations=out["iter"],
            solved=solved,
            tree_sizes=out["sizes"].T.astype(jnp.int32),
            sampler=out["sampler"],
        )

    return solve


def make_aorrtc_batch(
    spec: RobotSpec,
    settings: AORRTCSettings,
    max_path: int = 256,
    rounds: int = 4,
    seed: int = 0,
):
    """Anytime meta loop (aorrtc.hh:457-563): rrtc -> simplify -> rounds of
    (aox_rrtc bounded by best cost -> simplify), all batched.

    Returns `solve(starts (L,dim), goals (L,dim), envs, samplers?) ->
    (best_paths (L,P,dim), lengths (L,), costs (L,), solved (L,),
    iterations (L,))` with iterations = actual sampling iterations summed
    over the initial RRTC and every optimization round. Stages are
    independently jitted; the meta loop runs in Python.
    """
    rs = replace(
        settings.rrtc,
        max_iterations=settings.max_iterations,
        max_samples=settings.max_samples,
    )
    inner = replace(settings, rrtc=rs)
    _rrtc_cache = {}

    def rrtc_multi(G):
        if G not in _rrtc_cache:
            _rrtc_cache[G] = jax.jit(
                make_rrtc_batch(spec, rs, n_goals=G, max_path=max_path)
            )
        return _rrtc_cache[G]

    aox = jax.jit(
        make_aox_rrtc_batch(spec, inner, max_path=max_path), static_argnames=("use_phs",)
    )
    simplify = jax.jit(
        make_simplify_batch(spec, settings.simplify, max_path=max_path, chunk_states=16)
    )
    dim = spec.dimension

    def solve(starts, goals, envs, samplers=None, goal_mask=None):
        """goals: (L, dim) single goal, or (L, G, dim) multi-goal — the
        initial RRTC is seeded with every goal and the AOX rounds use plain
        sampling when G > 1 (PHS only when G == 1; aorrtc.hh:528-535)."""
        L = starts.shape[0]
        if samplers is None:
            samplers = halton_init_batch(dim, L)
        if goals.ndim == 2:
            goals = goals[:, None, :]
        G = goals.shape[1]
        if goal_mask is None:
            goal_mask = jnp.ones((L, G), bool)

        res = rrtc_multi(G)(starts, goals, goal_mask, envs, samplers)
        simp = simplify(res.path, res.path_length, envs)
        best_paths = simp.path
        best_lens = simp.path_length
        best_costs = jnp.where(res.solved, simp.cost, INF)
        samplers = res.sampler
        iterations = res.iterations
        key = jax.random.key_data(jax.random.PRNGKey(seed))

        if settings.optimize:
            for r in range(rounds):
                ar = aox(
                    starts, goals, envs, samplers, best_costs, key,
                    use_phs=settings.use_phs and G == 1,
                    goal_mask=goal_mask,
                )
                samplers = ar.sampler
                iterations = iterations + ar.iterations
                key = jax.random.key_data(jax.random.PRNGKey(seed + r + 1))
                s2 = simplify(ar.path, ar.path_length, envs)
                better = ar.solved & (s2.cost < best_costs)
                best_paths = jnp.where(better[:, None, None], s2.path, best_paths)
                best_lens = jnp.where(better, s2.path_length, best_lens)
                best_costs = jnp.where(better, s2.cost, best_costs)

        solved = best_costs < INF
        return (
            best_paths,
            best_lens,
            jnp.where(solved, best_costs, 0.0),
            solved,
            iterations,
        )

    return solve
