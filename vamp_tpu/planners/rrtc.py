"""RRT-Connect: dynamic-domain, balanced, bidirectional, multi-goal — batched.

Faithful re-architecture of the reference planner (planning/rrtc.hh:33-248)
as one jitted `lax.while_loop` advancing L independent problems per device
step. The lane (problem) axis is hand-laid MINOR in every hot tensor — the
TPU analogue of the reference's 8 SIMD lanes, but the lanes are whole
problems:

- edge validation: all L lanes' candidate edges interpolate into one
  (dim, T, L) block and run through ONE fused batch-minor fkcc call;
- tree storage is slot-major lane-minor (states (dim, N, L)) and slots are
  allocated per STEP, shared across lanes: every insertion is a
  `dynamic_update_slice` at one traced scalar slot — per-lane scatter
  (pathologically slow on TPU: ~4 ms per scatter at L=4096) never happens.
  Lanes that don't insert on a step leave their column of that slot inactive,
  and a step where NO lane inserts doesn't consume the slot at all (the next
  step overwrites it). Consequence: `max_samples` bounds insertion STEPS
  (steps where at least one lane grew a tree) — between the reference's
  per-node bound (rrtc.hh:48-54) and a raw step bound; tree content and
  paths are unchanged;
- nearest neighbor is a masked distance sweep over (N, L) with argmin on the
  slot axis; node reads use one-hot reductions (vector-friendly), never
  per-lane gathers in the hot loop;
- Halton streams are batch-minor (dim, L) and advance only on EXTEND steps,
  so each lane's sample sequence — and hence its tree and path — is exactly
  the reference's for the same stream (tests/test_rrtc_parity.py pins this
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
from jax import lax

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

    @classmethod
    def lane_partition_spec(cls, axes):
        """Declared lane axis per field (lane-major result convention), for
        parallel.mesh.make_sharded_batch_solver — replaces extent-guessing,
        which mis-sharded tree_sizes (L, 2) whenever L == 2."""
        from jax.sharding import PartitionSpec as P

        lane = P(axes)
        return cls(path=lane, path_length=lane, cost=lane, iterations=lane,
                   solved=lane, tree_sizes=lane,
                   sampler=HaltonState.lane_partition_spec(axes))


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
    N = settings.max_samples  # slot capacity (= loop-step capacity, see above)
    rng_range = jnp.float32(settings.range)

    diam = float(np.linalg.norm(spec.range))
    T_edge = _tile_states(min(settings.range, diam), res)
    T_line = _tile_states(diam, res)

    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def validate_lanes(starts_bm, vecs_bm, dists, envs, br, bp, T):
        """starts_bm/vecs_bm (dim, L); dists (L,) -> (L,) bool. One fused
        kernel at the reference's check set (validate.hh:41; j/(8n))."""
        n = jnp.maximum(jnp.ceil(dists * (res / RAKE)), 1.0)
        total = RAKE * n
        j = jnp.arange(1, T + 1, dtype=jnp.float32)
        frac = jnp.minimum(j[:, None], total[None, :]) / total[None, :]  # (T, L)
        q = starts_bm[:, None, :] + vecs_bm[:, None, :] * frac[None]
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
        br, bp = base_rot, base_pos

        # -- straight-line early exit (rrtc.hh:61-74) -----------------------
        line_vecs = goals - starts[:, None, :]  # (L, G, dim)
        line_dists = jnp.linalg.norm(line_vecs, axis=2)
        lv = line_vecs.transpose(2, 0, 1).reshape(dim, L * G)
        ls = jnp.broadcast_to(starts.T[:, :, None], (dim, L, G)).reshape(dim, L * G)
        if envs.sphere_xyzr.ndim == 3 and G > 1:
            envs_rep = jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), envs)
        else:
            envs_rep = envs
        line_ok = validate_lanes(
            ls, lv, line_dists.reshape(-1), envs_rep, br, bp, T_line
        ).reshape(L, G)
        line_valid = line_ok & goal_mask
        any_line = jnp.any(line_valid, axis=1)
        first_goal = jnp.argmax(line_valid, axis=1)

        # -- tree buffers: slot-major, lane-minor ---------------------------
        states = jnp.zeros((dim, N, L), jnp.float32)
        states = lax.dynamic_update_slice(states, starts.T[:, None, :], (0, 0, 0))
        states = lax.dynamic_update_slice(
            states, goals.transpose(2, 1, 0), (0, 1, 0)
        )
        parents = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))
        radii = jnp.full((N, L), INF)
        in_tree = jnp.zeros((N, L), jnp.int8).at[1 : 1 + G].set(1)
        slot_active = jnp.zeros((N, L), bool).at[0].set(True)
        slot_active = lax.dynamic_update_slice(slot_active, goal_mask.T, (1, 0))

        iota_N = jnp.arange(N, dtype=jnp.int32)[:, None]  # (N, 1)

        carry = dict(
            states=states,
            parents=parents,
            radii=radii,
            in_tree=in_tree,
            slot_active=slot_active,
            slot=jnp.int32(1 + G),  # shared next-slot counter
            sizes=jnp.stack(
                [jnp.ones((L,)), jnp.sum(goal_mask, axis=1).astype(jnp.float32)]
            ),  # (2, L)
            tree_a=jnp.full((L,), 1 if settings.start_tree_first else 0, jnp.int8),
            sampler=samplers,
            iter=jnp.zeros((L,), jnp.int32),
            done=any_line,
            mode=jnp.full((L,), 0, jnp.int8),
            c_prior=jnp.zeros((dim, L), jnp.float32),
            c_prior_idx=jnp.zeros((L,), jnp.int32),
            c_inc=jnp.zeros((dim, L), jnp.float32),
            c_inc_len=jnp.zeros((L,), jnp.float32),
            c_segs_left=jnp.zeros((L,), jnp.int32),
            c_target=jnp.zeros((L,), jnp.int32),
            tail_a=jnp.zeros((L,), jnp.int32),
            tail_b=jnp.zeros((L,), jnp.int32),
        )

        def running(c):
            budget = (c["iter"] < settings.max_iterations) | (c["mode"] == CONNECT)
            return budget & (~c["done"])

        def cond(c):
            return jnp.any(running(c)) & (c["slot"] < N)

        CH = min(256, N)  # slots per NN sweep chunk
        n_chunks_static = -(-N // CH)

        def nearest_and_cfg(states, radii, sq_mask, q_bm, bound_slot):
            """Masked nearest per lane + its configuration + its radius.

            Sweeps only the slots allocated so far (bound_slot is the shared
            slot counter) in CH-slot chunks — step cost grows with the tree
            like the reference's incremental kd-tree, instead of paying the
            full static capacity every step.

            states (dim, N, L); radii (N, L); q_bm (dim, L); sq_mask (N, L).
            Returns (idx (L,), dist (L,), cfg (dim, L), radius (L,)).
            """
            n_chunks = (bound_slot + CH - 1) // CH

            def chunk(ci, carry):
                best_sq, best_idx, best_cfg, best_rad = carry
                off = ci * CH
                blk = lax.dynamic_slice(states, (0, off, 0), (dim, CH, L))
                mblk = lax.dynamic_slice(sq_mask, (off, 0), (CH, L))
                rblk = lax.dynamic_slice(radii, (off, 0), (CH, L))
                d = blk - q_bm[:, None, :]
                sq = jnp.sum(d * d, axis=0)  # (CH, L)
                sq = jnp.where(mblk, sq, BIG)
                ci_min = jnp.min(sq, axis=0)  # (L,)
                ci_arg = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (L,)
                oh = jnp.arange(CH, dtype=jnp.int32)[:, None] == ci_arg[None, :]
                ci_cfg = jnp.sum(jnp.where(oh[None], blk, 0.0), axis=1)  # (dim, L)
                ci_rad = jnp.sum(jnp.where(oh, rblk, 0.0), axis=0)  # (L,)
                better = ci_min < best_sq
                best_cfg = jnp.where(better[None], ci_cfg, best_cfg)
                best_idx = jnp.where(better, ci_arg + off, best_idx)
                best_rad = jnp.where(better, ci_rad, best_rad)
                best_sq = jnp.minimum(best_sq, ci_min)
                return best_sq, best_idx, best_cfg, best_rad

            init = (
                jnp.full((L,), BIG),
                jnp.zeros((L,), jnp.int32),
                jnp.zeros((dim, L), jnp.float32),
                jnp.zeros((L,), jnp.float32),
            )
            best_sq, best_idx, best_cfg, best_rad = lax.while_loop(
                lambda c: c[0] < n_chunks,
                lambda c: (c[0] + 1, chunk(c[0], c[1])),
                (jnp.int32(0), init),
            )[1]
            return best_idx, jnp.sqrt(best_sq), best_cfg, best_rad

        def body(c):
            states, parents, radii = c["states"], c["parents"], c["radii"]
            in_tree, slot_active = c["in_tree"], c["slot_active"]
            slot, sizes, tree_a = c["slot"], c["sizes"], c["tree_a"]
            run = running(c)
            is_ext = c["mode"] == EXTEND
            extend = run & is_ext

            # -- balance swap (EXTEND lanes only; rrtc.hh:101-109) ----------
            ta_oh = jnp.stack([tree_a == 0, tree_a == 1]).astype(jnp.float32)  # (2,L)
            asize = jnp.sum(sizes * ta_oh, axis=0)
            bsize = jnp.sum(sizes * (1.0 - ta_oh), axis=0)
            ratio = jnp.abs(asize - bsize) / asize
            do_swap = (
                jnp.full((L,), True) if not settings.balance else ratio < settings.tree_ratio
            )
            tree_a = jnp.where(extend & do_swap, 1 - tree_a, tree_a).astype(jnp.int8)

            # -- sample (rrtc.hh:111-112); stream advances on EXTEND only ---
            u, sampler_next = halton_next(c["sampler"])  # (dim, L)
            sampler = jax.tree.map(
                lambda new, old: jnp.where(
                    extend if new.ndim == 1 else extend[None], new, old
                ),
                sampler_next,
                c["sampler"],
            )
            sample = u * scale[:, None] + lower[:, None]  # (dim, L)

            # -- nearest in tree_a (rrtc.hh:117-123) ------------------------
            # Swept only when some lane is actually EXTENDing this step
            # (CONNECT lanes don't use it) — the reference's per-iteration NN
            # count, recovered with a whole-batch conditional.
            mask_a = slot_active & (in_tree == tree_a[None, :])
            near_idx, near_dist, near_cfg, near_radius = lax.cond(
                jnp.any(extend),
                lambda: nearest_and_cfg(states, radii, mask_a, sample, slot),
                lambda: (
                    jnp.zeros((L,), jnp.int32),
                    jnp.zeros((L,), jnp.float32),
                    jnp.zeros((dim, L), jnp.float32),
                    jnp.zeros((L,), jnp.float32),
                ),
            )
            dd_reject = jnp.bool_(settings.dynamic_domain) & (near_radius < near_dist)

            vec = sample - near_cfg
            reach = near_dist < rng_range
            ext_vec = jnp.where(
                reach[None], vec, vec * (rng_range / jnp.maximum(near_dist, 1e-12))[None]
            )
            ext_dist = jnp.where(reach, near_dist, rng_range)

            # -- one fused edge validation for all lanes --------------------
            v_start = jnp.where(is_ext[None], near_cfg, c["c_prior"])
            v_vec = jnp.where(is_ext[None], ext_vec, c["c_inc"])
            v_dist = jnp.where(is_ext, ext_dist, c["c_inc_len"])
            edge_valid = validate_lanes(v_start, v_vec, v_dist, envs, br, bp, T_edge)

            # -- EXTEND / CONNECT bookkeeping -------------------------------
            ext_ok = extend & edge_valid & ~dd_reject
            con_ok = run & (c["mode"] == CONNECT) & edge_valid
            new_cfg = jnp.where(
                ext_ok[None], near_cfg + ext_vec, c["c_prior"] + c["c_inc"]
            )

            # dynamic-domain radius update (one-hot write at near_idx)
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

            def _radii_update():
                oh_near = iota_N == near_idx[None, :]  # (N, L)
                return jnp.where(
                    oh_near & (grow | shrink)[None, :], r_new[None, :], radii
                )

            radii = lax.cond(jnp.any(grow | shrink), _radii_update, lambda: radii)

            # -- node insertion at the SHARED slot --------------------------
            # The slot is consumed only when SOME lane inserts: a no-insert
            # step leaves the slot inactive for every lane and the next step
            # overwrites it, so trees stay dense and NN sweeps (bounded by the
            # slot counter) only pay for steps that actually grew a tree.
            ins = ext_ok | con_ok
            node_parent = jnp.where(is_ext, near_idx, c["c_prior_idx"])
            states = lax.dynamic_update_slice(states, new_cfg[:, None, :], (0, slot, 0))
            parents = lax.dynamic_update_slice(parents, node_parent[None, :], (slot, 0))
            in_tree = lax.dynamic_update_slice(in_tree, tree_a[None, :], (slot, 0))
            slot_active = lax.dynamic_update_slice(slot_active, ins[None, :], (slot, 0))
            node_id = slot
            slot = slot + jnp.any(ins).astype(jnp.int32)
            ta2_oh = jnp.stack([tree_a == 0, tree_a == 1]).astype(jnp.float32)
            sizes = sizes + ta2_oh * ins[None, :].astype(jnp.float32)

            # -- connect transitions (rrtc.hh:160-194) ----------------------
            # The other-tree NN is only consumed by lanes that just completed
            # a successful EXTEND (start_connect = ext_ok); skip the sweep
            # entirely on steps where none did.
            mask_b = slot_active & (in_tree == (1 - tree_a)[None, :])
            ob_idx, ob_dist, ob_cfg, _ = lax.cond(
                jnp.any(ext_ok),
                lambda: nearest_and_cfg(states, radii, mask_b, new_cfg, slot),
                lambda: (
                    jnp.zeros((L,), jnp.int32),
                    jnp.zeros((L,), jnp.float32),
                    jnp.zeros((dim, L), jnp.float32),
                    jnp.zeros((L,), jnp.float32),
                ),
            )
            n_ext = jnp.maximum(jnp.ceil(ob_dist / rng_range), 1.0)
            start_connect = ext_ok
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

            in_connect = (start_connect | con_ok) & ~connected
            mode = jnp.where(run, jnp.where(in_connect, 1, 0), c["mode"]).astype(jnp.int8)

            tail_a = jnp.where(connected, node_id, c["tail_a"])
            tail_b = jnp.where(connected, c_target, c["tail_b"])

            return dict(
                states=states,
                parents=parents,
                radii=radii,
                in_tree=in_tree,
                slot_active=slot_active,
                slot=slot,
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

        # -- path recovery (rrtc.hh:196-227); cold path, lane-major is fine --
        states_lm = out["states"].transpose(2, 1, 0)  # (L, N, dim)
        parents_lm = out["parents"].T  # (L, N)
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
            buf, _, length = jax.lax.fori_loop(
                0, max_path, step, (buf, tail, jnp.ones((L,), jnp.int32))
            )
            return buf, length

        chain_a, len_a = walk(out["tail_a"])
        # reference pushes only the connect target's ANCESTORS (rrtc.hh:210-219)
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
        seq_flipped = jnp.take_along_axis(seq, flipped_idx, 1)
        seq = jnp.where((tree_a_end == 0)[:, None], seq, seq_flipped)
        path = jnp.take_along_axis(states_lm, seq[:, :, None], 1)  # (L, P, dim)

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
            tree_sizes=out["sizes"].T.astype(jnp.int32),
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

    def solve(start, goals, goal_mask, env, sampler=None, base_rot=None, base_pos=None):
        if sampler is not None and sampler.b.ndim == 1:
            sampler = HaltonState(
                b=sampler.b[:, None],
                n=sampler.n[:, None],
                d=sampler.d[:, None],
                iterations=sampler.iterations[None],
            )
        res = solve_batch(
            start[None], goals[None], goal_mask[None], env, sampler, base_rot, base_pos
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
