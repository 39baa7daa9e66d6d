"""RRT-Connect: dynamic-domain, balanced, bidirectional, multi-goal — batched.

Faithful re-architecture of the reference planner (planning/rrtc.hh:33-248)
as one jitted `lax.while_loop` advancing L independent problems per device
step. The batch (lane) axis is hand-laid MINOR in every hot tensor — the TPU
analogue of the reference's 8 SIMD lanes, but the lanes are whole *problems*:

- edge validation: all L lanes' candidate edges interpolate into one
  (dim, T, L) block and run through ONE fused batch-minor fkcc call
  (ops.fkcc_bm.make_fkcc_planner) — T interpolation states in sublanes,
  problems in vector lanes;
- nearest neighbor: tree states are stored transposed (L, dim, N) so the
  masked-argmin distance sweep reduces over the sublane dim axis with N in
  vector lanes;
- Halton streams are batch-minor (dim, L) and only advance on EXTEND steps,
  so each lane's sample sequence — and hence its tree and path — is exactly
  the reference's for the same stream (verified by tests/test_rrtc_parity.py
  against the reference planner itself).

The reference's per-iteration flow (extend, then a greedy multi-segment
connect) is flattened into a two-mode per-lane state machine (EXTEND/CONNECT)
so every loop step costs exactly one edge validation per lane.

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
from ..ops.fkcc_bm import make_fkcc_planner
from ..ops.validate import RAKE
from ..robots.spec import RobotSpec
from ..samplers.halton import HaltonState, halton_init_batch, halton_next
from ..utils.settings import RRTCSettings

INF = jnp.float32(np.inf)
BIG = jnp.float32(3.4e38)
EXTEND, CONNECT = jnp.int8(0), jnp.int8(1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RRTCResult:
    path: jnp.ndarray  # (L, max_path, dim)
    path_length: jnp.ndarray  # (L,) i32 — number of valid waypoints
    cost: jnp.ndarray  # (L,) f32
    iterations: jnp.ndarray  # (L,) i32 — sampling iterations (reference iter)
    solved: jnp.ndarray  # (L,) bool
    tree_sizes: jnp.ndarray  # (L, 2) i32 (start, goal)
    sampler: HaltonState  # advanced sampler states (dim, L)


def _tile_states(max_dist: float, resolution: int) -> int:
    n_max = max(int(np.ceil(max_dist * resolution / RAKE)), 1)
    return RAKE * n_max


def make_rrtc_batch(
    spec: RobotSpec,
    settings: RRTCSettings,
    n_goals: int = 1,
    max_path: int = 256,
):
    """Build `solve_batch(starts (L,dim), goals (L,G,dim), goal_mask (L,G),
    envs, samplers (dim,L), base_rot?, base_pos?) -> RRTCResult` (leading L).

    `envs` is either a single PackedEnvironment (shared by all lanes) or a
    lane-batched one (leading L on every leaf).
    """
    fkcc = make_fkcc_planner(spec)
    dim = spec.dimension
    res = spec.resolution
    N = settings.max_samples
    rng_range = jnp.float32(settings.range)

    diam = float(np.linalg.norm(spec.range))
    T_edge = _tile_states(min(settings.range, diam), res)
    T_line = _tile_states(diam, res)

    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def _interp_bm(starts, vecs, dists, T):
        """starts/vecs (L, dim), dists (L,) -> configs (dim, T, L) at the
        reference's check fractions (validate.hh:41; j/(8n), j=1..8n)."""
        n = jnp.maximum(jnp.ceil(dists * (res / RAKE)), 1.0)  # (L,)
        total = RAKE * n
        j = jnp.arange(1, T + 1, dtype=jnp.float32)  # (T,)
        frac = jnp.minimum(j[:, None], total[None, :]) / total[None, :]  # (T, L)
        return starts.T[:, None, :] + vecs.T[:, None, :] * frac[None, :, :]

    def validate_lanes(starts, vecs, dists, envs, br, bp, T):
        """One fused kernel validating one edge per lane -> (L,) bool."""
        q = _interp_bm(starts, vecs, dists, T)  # (dim, T, L)
        ok = fkcc(q, envs, br, bp)  # (T, L)
        return jnp.all(ok, axis=0)

    def solve_batch(
        starts: jnp.ndarray,  # (L, dim)
        goals: jnp.ndarray,  # (L, G, dim)
        goal_mask: jnp.ndarray,  # (L, G) bool
        envs: PackedEnvironment,
        samplers: Optional[HaltonState] = None,
        base_rot: Optional[jnp.ndarray] = None,
        base_pos: Optional[jnp.ndarray] = None,
    ) -> RRTCResult:
        L, G = goals.shape[0], goals.shape[1]
        if samplers is None:
            samplers = halton_init_batch(dim, L)

        # -- straight-line early exit (rrtc.hh:61-74) -----------------------
        line_vecs = goals - starts[:, None, :]  # (L, G, dim)
        line_dists = jnp.linalg.norm(line_vecs, axis=2)
        # flatten goals into lanes: (L*G) edges; env lanes repeat per goal
        lv = line_vecs.transpose(2, 0, 1).reshape(dim, 1, L * G)
        ls = jnp.repeat(starts.T[:, None, :], G, axis=2) if G > 1 else starts.T[:, None, :]
        # interpolate directly: fractions per (L*G) edge
        n = jnp.maximum(jnp.ceil(line_dists.reshape(-1) * (res / RAKE)), 1.0)
        total = RAKE * n
        jj = jnp.arange(1, T_line + 1, dtype=jnp.float32)
        frac = jnp.minimum(jj[:, None], total[None, :]) / total[None, :]  # (T, L*G)
        q_line = ls + lv * frac[None, :, :]
        if G > 1:
            envs_rep = (
                jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), envs)
                if envs.sphere_xyzr.ndim == 3
                else envs
            )
        else:
            envs_rep = envs
        ok = fkcc(q_line, envs_rep, base_rot, base_pos)  # (T, L*G)
        line_valid = jnp.all(ok, axis=0).reshape(L, G) & goal_mask
        any_line = jnp.any(line_valid, axis=1)  # (L,)
        first_goal = jnp.argmax(line_valid, axis=1)  # (L,)

        # -- tree buffers (lane-major for gathers, transposed copy for NN) --
        states = jnp.zeros((L, N, dim), jnp.float32)
        states = states.at[:, 0, :].set(starts)
        states = states.at[:, 1 : 1 + G, :].set(goals)
        states_T = jnp.swapaxes(states, 1, 2)  # (L, dim, N)
        parents = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (L, N))
        radii = jnp.full((L, N), INF)
        in_tree = jnp.zeros((L, N), jnp.int8).at[:, 1 : 1 + G].set(1)
        slot_active = jnp.zeros((L, N), bool).at[:, 0].set(True)
        slot_active = slot_active.at[:, 1 : 1 + G].set(goal_mask)

        lanes = jnp.arange(L)

        carry = dict(
            states=states,
            states_T=states_T,
            parents=parents,
            radii=radii,
            in_tree=in_tree,
            slot_active=slot_active,
            free_index=jnp.full((L,), 1 + G, jnp.int32),
            sizes=jnp.stack(
                [jnp.ones((L,)), jnp.sum(goal_mask, axis=1).astype(jnp.float32)], axis=1
            ),
            tree_a=jnp.full((L,), 1 if settings.start_tree_first else 0, jnp.int8),
            sampler=samplers,
            iter=jnp.zeros((L,), jnp.int32),
            done=any_line,
            mode=jnp.full((L,), 0, jnp.int8),
            c_prior=jnp.zeros((L, dim), jnp.float32),
            c_prior_idx=jnp.zeros((L,), jnp.int32),
            c_inc=jnp.zeros((L, dim), jnp.float32),
            c_inc_len=jnp.zeros((L,), jnp.float32),
            c_segs_left=jnp.zeros((L,), jnp.int32),
            c_target=jnp.zeros((L,), jnp.int32),
            tail_a=jnp.zeros((L,), jnp.int32),
            tail_b=jnp.zeros((L,), jnp.int32),
        )

        def running(c):
            budget = (c["iter"] < settings.max_iterations) | (c["mode"] == CONNECT)
            return budget & (c["free_index"] < N) & (~c["done"])

        def cond(c):
            return jnp.any(running(c))

        def nearest(states_T, sq_mask, q):
            """Per-lane masked nearest. states_T (L,dim,N); q (L,dim);
            sq_mask (L,N) bool -> (idx (L,), dist (L,))."""
            d = states_T - q[:, :, None]  # (L, dim, N)
            sq = jnp.sum(d * d, axis=1)  # (L, N)
            sq = jnp.where(sq_mask, sq, BIG)
            idx = jnp.argmin(sq, axis=1).astype(jnp.int32)
            dist = jnp.sqrt(jnp.take_along_axis(sq, idx[:, None], 1)[:, 0])
            return idx, dist

        def body(c):
            states, states_T = c["states"], c["states_T"]
            parents, radii = c["parents"], c["radii"]
            in_tree, slot_active = c["in_tree"], c["slot_active"]
            free_index, sizes, tree_a = c["free_index"], c["sizes"], c["tree_a"]
            run = running(c)
            extend = run & (c["mode"] == EXTEND)

            # -- balance swap (EXTEND lanes only; rrtc.hh:101-109) ----------
            ta = tree_a.astype(jnp.int32)
            asize = jnp.take_along_axis(sizes, ta[:, None], 1)[:, 0]
            bsize = jnp.take_along_axis(sizes, (1 - ta)[:, None], 1)[:, 0]
            ratio = jnp.abs(asize - bsize) / asize
            do_swap = (
                jnp.full((L,), True)
                if not settings.balance
                else ratio < settings.tree_ratio
            )
            tree_a = jnp.where(extend & do_swap, 1 - tree_a, tree_a).astype(jnp.int8)

            # -- sample (rrtc.hh:111-112); stream advances on EXTEND only ---
            u, sampler_next = halton_next(c["sampler"])  # u (dim, L)
            sampler = jax.tree.map(
                lambda new, old: jnp.where(
                    extend if new.ndim == 1 else extend[None], new, old
                ),
                sampler_next,
                c["sampler"],
            )
            sample = (u * scale[:, None] + lower[:, None]).T  # (L, dim)

            # -- nearest in tree_a (rrtc.hh:117-123) ------------------------
            mask_a = slot_active & (in_tree == tree_a[:, None])
            near_idx, near_dist = nearest(states_T, mask_a, sample)
            near_radius = jnp.take_along_axis(radii, near_idx[:, None], 1)[:, 0]
            dd_reject = jnp.bool_(settings.dynamic_domain) & (near_radius < near_dist)

            near_cfg = states[lanes, near_idx]  # (L, dim)
            vec = sample - near_cfg
            reach = near_dist < rng_range
            ext_vec = jnp.where(
                reach[:, None], vec, vec * (rng_range / jnp.maximum(near_dist, 1e-12))[:, None]
            )
            ext_dist = jnp.where(reach, near_dist, rng_range)

            # -- one fused edge validation for all lanes --------------------
            is_ext = (c["mode"] == EXTEND)
            v_start = jnp.where(is_ext[:, None], near_cfg, c["c_prior"])
            v_vec = jnp.where(is_ext[:, None], ext_vec, c["c_inc"])
            v_dist = jnp.where(is_ext, ext_dist, c["c_inc_len"])
            edge_valid = validate_lanes(
                v_start, v_vec, v_dist, envs, base_rot, base_pos, T_edge
            )

            # -- EXTEND bookkeeping -----------------------------------------
            ext_ok = extend & edge_valid & ~dd_reject
            con_ok = run & (c["mode"] == CONNECT) & edge_valid
            new_cfg = jnp.where(
                ext_ok[:, None], near_cfg + ext_vec, c["c_prior"] + c["c_inc"]
            )

            grow = ext_ok & jnp.bool_(settings.dynamic_domain) & (near_radius != INF)
            shrink = extend & ~edge_valid & ~dd_reject & jnp.bool_(settings.dynamic_domain)
            shrunk = jnp.where(
                near_radius == INF,
                jnp.float32(settings.radius),
                jnp.maximum(near_radius * (1.0 - settings.alpha), settings.min_radius),
            )
            r_new = jnp.where(
                grow,
                near_radius * (1.0 + settings.alpha),
                jnp.where(shrink, shrunk, near_radius),
            )
            radii = radii.at[lanes, near_idx].set(r_new)

            # -- node insertion (either mode) -------------------------------
            ins = ext_ok | con_ok
            node_parent = jnp.where(is_ext, near_idx, c["c_prior_idx"])
            old_rows = states[lanes, free_index]
            row = jnp.where(ins[:, None], new_cfg, old_rows)
            states = states.at[lanes, free_index].set(row)
            states_T = states_T.at[lanes, :, free_index].set(row)
            parents = parents.at[lanes, free_index].set(
                jnp.where(ins, node_parent, parents[lanes, free_index])
            )
            in_tree = in_tree.at[lanes, free_index].set(
                jnp.where(ins, tree_a, in_tree[lanes, free_index])
            )
            slot_active = slot_active.at[lanes, free_index].set(
                slot_active[lanes, free_index] | ins
            )
            node_id = free_index
            free_index = free_index + ins.astype(jnp.int32)
            sizes_flat = sizes.reshape(-1)
            add_idx = lanes * 2 + tree_a.astype(jnp.int32)
            sizes = sizes_flat.at[add_idx].add(ins.astype(jnp.float32)).reshape(L, 2)

            # -- connect transitions (rrtc.hh:160-194) ----------------------
            mask_b = slot_active & (in_tree == (1 - tree_a)[:, None])
            ob_idx, ob_dist = nearest(states_T, mask_b, new_cfg)
            ob_cfg = states[lanes, ob_idx]
            n_ext = jnp.maximum(jnp.ceil(ob_dist / rng_range), 1.0)
            start_connect = ext_ok
            segs_left = jnp.where(
                start_connect,
                n_ext.astype(jnp.int32),
                jnp.where(con_ok, c["c_segs_left"] - 1, jnp.int32(0)),
            )
            connected = con_ok & (segs_left == 0)

            c_inc = jnp.where(
                start_connect[:, None], (ob_cfg - new_cfg) / n_ext[:, None], c["c_inc"]
            )
            c_inc_len = jnp.where(start_connect, ob_dist / n_ext, c["c_inc_len"])
            c_target = jnp.where(start_connect, ob_idx, c["c_target"])
            c_prior = jnp.where(ins[:, None], new_cfg, c["c_prior"])
            c_prior_idx = jnp.where(ins, node_id, c["c_prior_idx"])

            in_connect = (start_connect | con_ok) & ~connected & (free_index < N)
            mode = jnp.where(run, jnp.where(in_connect, 1, 0), c["mode"]).astype(jnp.int8)

            tail_a = jnp.where(connected, node_id, c["tail_a"])
            tail_b = jnp.where(connected, c_target, c["tail_b"])

            return dict(
                states=states,
                states_T=states_T,
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
                buf = buf.at[:, i].set(cur)
                nxt = parents[lanes, cur]
                length = jnp.where(cur == nxt, length, length + 1)
                return buf, nxt, length

            buf = jnp.zeros((L, max_path), jnp.int32)
            buf, _, length = jax.lax.fori_loop(
                0, max_path, step, (buf, tail, jnp.ones((L,), jnp.int32))
            )
            return buf, length

        chain_a, len_a = walk(out["tail_a"])
        # reference pushes only the connect target's ANCESTORS (rrtc.hh:210-219)
        tb_parent = parents[lanes, out["tail_b"]]
        b_root = tb_parent == out["tail_b"]
        chain_b, len_b = walk(tb_parent)
        len_b = jnp.where(b_root, 0, len_b)
        total = len_a + len_b

        pos = jnp.arange(max_path)[None, :]  # (1, P)
        idx_a = jnp.clip(len_a[:, None] - 1 - pos, 0, max_path - 1)
        idx_b = jnp.clip(pos - len_a[:, None], 0, max_path - 1)
        seq = jnp.where(
            pos < len_a[:, None],
            jnp.take_along_axis(chain_a, idx_a, 1),
            jnp.take_along_axis(chain_b, idx_b, 1),
        )
        flipped_idx = jnp.clip(total[:, None] - 1 - pos, 0, max_path - 1)
        seq_flipped = jnp.take_along_axis(seq, flipped_idx, 1)
        seq = jnp.where((tree_a_end == 0)[:, None], seq, seq_flipped)
        path = jnp.take_along_axis(states, seq[:, :, None], 1)  # (L, P, dim)

        # straight-line overrides
        line_goal = jnp.take_along_axis(goals, first_goal[:, None, None], 1)[:, 0]
        line_path = jnp.zeros((L, max_path, dim), jnp.float32)
        line_path = line_path.at[:, 0, :].set(starts).at[:, 1, :].set(line_goal)
        path = jnp.where(any_line[:, None, None], line_path, path)
        total = jnp.where(any_line, 2, total)

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
            tree_sizes=out["sizes"].astype(jnp.int32),
            sampler=out["sampler"],
        )

    return solve_batch


def make_rrtc(
    spec: RobotSpec,
    settings: RRTCSettings,
    n_goals: int = 1,
    max_path: int = 256,
):
    """Single-problem wrapper over the batched solver (L = 1): `solve(start
    (dim,), goals (G, dim), goal_mask (G,), env, sampler?, base_rot?,
    base_pos?) -> RRTCResult` with scalar leading shapes."""
    solve_batch = make_rrtc_batch(spec, settings, n_goals, max_path)
    dim = spec.dimension

    def solve(start, goals, goal_mask, env, sampler=None, base_rot=None, base_pos=None):
        if sampler is not None and sampler.b.ndim == 1:
            sampler = HaltonState(
                b=sampler.b[:, None],
                n=sampler.n[:, None],
                d=sampler.d[:, None],
                iterations=sampler.iterations[None],
            )
        res = solve_batch(
            start[None],
            goals[None],
            goal_mask[None],
            env,
            sampler,
            base_rot,
            base_pos,
        )
        return RRTCResult(
            path=res.path[0],
            path_length=res.path_length[0],
            cost=res.cost[0],
            iterations=res.iterations[0],
            solved=res.solved[0],
            tree_sizes=res.tree_sizes[0],
            sampler=res.sampler,
        )

    return solve
