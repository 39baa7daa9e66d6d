"""Throughput-mode batched RRT-Connect — the benchmark solver.

Same algorithm family as planners/rrtc.py (dynamic-domain, balanced,
bidirectional RRT-Connect; reference planning/rrtc.hh:33-248) re-tuned for
device-step throughput instead of reference stream parity. Three structural
changes, each motivated by measurement on TPU v5e (see benchmarks/):

1. **One-pass nearest neighbor.** The parity solver's chunked one-hot sweeps
   cost ~500us/step at L=1024 — the step bottleneck. Here NN is
   `argmin(|s|^2 - 2 s.q + |q|^2)` with squared norms maintained incrementally
   at insertion, tree membership encoded as +BIG sentinels in the norm arrays
   (no mask tensors in the loop), and the winning configuration fetched with a
   single small take_along_axis from a lane-major mirror of the tree.

2. **Speculative connect.** The reference's greedy connect loop advances one
   `range`-length segment per validation (rrtc.hh:160-194). Here the extend
   edge AND the first K connect segments validate in ONE fused fkcc call per
   step; colinear connect segments merge into a single tree edge (identical
   path geometry, fewer nodes). A step therefore completes a whole
   extend+connect iteration in the common case, instead of 2-4 steps.

3. **Slot capacity ~ budget, staged.** Tree buffers are sized to the wave's
   iteration budget (two slots are consumed per step — fixed allocation keeps
   tree updates to one contiguous write per buffer), so NN sweep cost tracks
   the budget instead of a static worst case. Callers should size
   `max_samples >= ~2.6x` the iteration budget (steps ~ 1.3x iterations).
   For large budgets the solve additionally runs as a sequence of
   geometrically growing capacities inside ONE jit program (N/8 -> N/4 ->
   N/2 -> N): each stage is its own while_loop whose buffers are exactly as
   big as the slots consumed so far, so early steps pay NN/insert/radii cost
   proportional to the LIVE tree, not the final capacity (the "segmented NN
   sweep" lever; cuts the N-proportional step terms ~33% integrated over a
   budget-exhausting run). Between stages the buffers pad with sentinel
   rows — tree state is identical, so the trajectory is unchanged.

4. **Phase-latency-aware step.** On the axon TPU relay every *serialized*
   dependency phase inside the loop body (NN gather -> dependent gather ->
   conditional -> scattered update) costs ~100-190us of latency regardless of
   its FLOPs (measured, benchmarks/nn_micro2.py). The body is therefore
   organized to have exactly three phases: {NN sweeps (both trees,
   data-independent)} -> {fused edge validation} -> {one contiguous tree
   update per buffer}; the other-tree NN queries the sample rather than the
   new node, and the dynamic-domain radius update is an unconditional mask.

Consequences: paths are still validated edge-by-edge at the reference's
resolution semantics (ops/validate.py check set), but tree growth no longer
reproduces the reference sample-for-sample (colinear connect nodes are not
materialized, so later NN queries can differ). Use planners/rrtc.py when
stream parity matters; use this for throughput.
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
from .rrtc import RRTCResult

INF = jnp.float32(np.inf)
BIG = jnp.float32(1.0e30)  # tree-membership sentinel in squared-norm arrays
EXTEND, CONNECT = jnp.int8(0), jnp.int8(1)

# Profiling-only knobs (benchmarks/step_profile.py): comma list of body pieces
# to stub out, plus an optional fixed step count that overrides the loop cond.
import os as _os

_DISABLE = set(filter(None, _os.environ.get("VAMP_TURBO_DISABLE", "").split(",")))
_FIXED_STEPS = int(_os.environ.get("VAMP_TURBO_FIXED_STEPS", "0"))
if _DISABLE or _FIXED_STEPS:
    # Same loud-warning treatment as VAMP_FKCC_DISABLE (ops/fkcc_bm.py): these
    # knobs exist only for benchmarks/step_profile.py ablation and CHANGE
    # RESULTS — a leaked value silently stubs out planner phases or truncates
    # every solve at a fixed step count.
    import warnings as _warnings

    _warnings.warn(
        "VAMP_TURBO_DISABLE/VAMP_TURBO_FIXED_STEPS are set "
        f"(disable={sorted(_DISABLE)!r}, fixed_steps={_FIXED_STEPS}): "
        "rrtc_turbo is running in PROFILING mode and will return wrong or "
        "truncated planning results. Unset these outside step_profile runs.",
        stacklevel=2,
    )
# Steps per while_loop iteration: >1 amortizes the loop-condition reduce +
# phase scheduling across U body evaluations (the body is masked by `run`
# internally, so an extra masked evaluation at the tail is harmless).
_UNROLL = max(1, int(_os.environ.get("VAMP_TURBO_UNROLL", "1")))


def _tile_states(max_dist: float, resolution: int) -> int:
    n_max = max(int(np.ceil(max_dist * resolution / RAKE)), 1)
    return RAKE * n_max


def make_rrtc_turbo_batch(
    spec: RobotSpec,
    settings: RRTCSettings,
    n_goals: int = 1,
    max_path: int = 256,
    connect_segs: int = 1,
    hier: Optional[bool] = None,
    line_check: bool = True,
    unroll: Optional[int] = None,
    nn_bf16: bool = False,
    restarts: int = 1,
):
    """Build `solve_batch(starts (L,dim), goals (L,G,dim), goal_mask (L,G),
    envs, samplers?, base_rot?, base_pos?, group_id?) -> RRTCResult`.

    `envs`: one PackedEnvironment shared by all lanes, or a lane-batched one
    (leading L on every leaf). `connect_segs` = K speculative connect segments
    validated per step alongside the extend edge. `hier` uses the coarse-gate
    + compacted fine checker (ops/fkcc_hier) for edge validation — boolean-
    identical to dense except compaction overflow, which conservatively
    rejects the edge (it auto-falls back to dense for env features the
    hierarchy does not cover). `line_check=False` skips the straight-line
    early exit (for wave harnesses whose lanes are survivors of an earlier
    wave — they already failed it).

    `restarts=R > 1` runs up to R independent solve attempts INSIDE one jit
    program: each segment re-initializes the trees from scratch with a fresh
    sampler bank and runs the full staged budget; lanes whose problem solved
    in an earlier segment (or a racing sibling's — done sharing) skip the
    segment at one while_loop-cond's cost. `samplers` then carries a leading
    (R, ...) axis of decorrelated banks. This fuses what the wave harness
    previously ran as `repeats` — separate device calls each paying the
    ~27 ms relay floor and a host re-batch — into one call, exploiting the
    same heavy-tailed restart distribution.

    `nn_bf16` computes the NN dot over a bfloat16 mirror of the tree states
    (f32 accumulation via dot_general) — halves the dominant per-step HBM
    read, the (dim, N, L) sweep. The sentinel-norm surface stays float32
    (benchmarks/nn_bf16_micro.py: the f32-norm "dot_only" form matches the
    all-bf16 form's speed — 219.5 vs 220.7 us/step at N=4096, L=320, vs
    240.1 f32 — while confining rounding to the coordinates inside the dot).
    Geometry, edge validation, and the gathered configurations stay float32,
    so every returned path is still validated at the exact reference check
    set; only WHICH near node the argmin picks can differ among nodes within
    ~bf16 dot resolution of the true nearest — a documented turbo deviation
    (this solver already trades stream parity for throughput; use
    planners/rrtc.py for reference parity)."""
    if hier is None:
        hier = _os.environ.get("VAMP_TURBO_HIER", "0") == "1"
    # Steps per while_loop iteration (measured +4% suite throughput at 2:
    # amortizes the loop-cond reduce + phase scheduling; trades compile time).
    U = _UNROLL if unroll is None else max(1, unroll)
    stage_thresh = int(_os.environ.get("VAMP_TURBO_STAGE_MIN", "2048"))
    # jnp.sin/cos instead of the reference's 16-op polynomial: one XLA op
    # each, more accurate; op count is what's priced on the target device.
    # Explicit settings field (not ambient env state) — see RRTCSettings.
    fkcc = make_fkcc_planner(spec, native_trig=settings.native_trig)
    dim = spec.dimension
    res = spec.resolution
    N = settings.max_samples
    K = connect_segs
    rng_range = jnp.float32(settings.range)

    # Staged slot capacities (docstring item 3). Profiling with a fixed step
    # count keeps a single stage so step cost is measured at one capacity.
    if N >= stage_thresh and not _FIXED_STEPS:
        stage_caps = sorted({-(-N // 8), -(-N // 4), -(-N // 2), N})
    else:
        stage_caps = [N]

    diam = float(np.linalg.norm(spec.range))
    T_edge = _tile_states(min(settings.range, diam), res)
    T_line = _tile_states(diam, res)
    T_total = (1 + K) * T_edge

    if hier:
        from ..ops.fkcc_hier import make_fkcc_hier_blocks

        check_edge_blocks = make_fkcc_hier_blocks(spec, 1 + K, T_edge)
        check_line_blocks = make_fkcc_hier_blocks(spec, 1, T_line)

    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def validate_blocks(p_blocks, v_blocks, d_blocks, envs, br, bp):
        """p/v_blocks (1+K, dim, L); d_blocks (1+K, L) -> valid (1+K, L).

        One fused fkcc evaluation of every block's interpolated states at the
        reference check set (validate.hh:41: fractions j/(RAKE*n))."""
        n = jnp.maximum(jnp.ceil(d_blocks * (res / RAKE)), 1.0)  # (1+K, L)
        total = RAKE * n
        j = jnp.arange(1, T_edge + 1, dtype=jnp.float32)  # (T,)
        frac = jnp.minimum(j[None, :, None], total[:, None, :]) / total[:, None, :]
        # (1+K, T, L); configs (dim, 1+K, T, L) -> (dim, (1+K)*T, L)
        q = p_blocks[:, :, None, :] + v_blocks[:, :, None, :] * frac[:, None]
        q = jnp.moveaxis(q, 1, 0).reshape(dim, T_total, -1)
        if hier:
            return check_edge_blocks(q, envs, br, bp)  # (1+K, L)
        ok = fkcc(q, envs, br, bp)  # (T_total, L)
        return jnp.all(ok.reshape(1 + K, T_edge, -1), axis=1)  # (1+K, L)

    def validate_line(starts_bm, vecs_bm, dists, envs, br, bp):
        n = jnp.maximum(jnp.ceil(dists * (res / RAKE)), 1.0)
        total = RAKE * n
        j = jnp.arange(1, T_line + 1, dtype=jnp.float32)
        frac = jnp.minimum(j[:, None], total[None, :]) / total[None, :]
        q = starts_bm[:, None, :] + vecs_bm[:, None, :] * frac[None]
        if hier:
            return check_line_blocks(q, envs, br, bp)[0]
        ok = fkcc(q, envs, br, bp)
        return jnp.all(ok, axis=0)

    def solve_batch(
        starts: jnp.ndarray,  # (L, dim)
        goals: jnp.ndarray,  # (L, G, dim)
        goal_mask: jnp.ndarray,  # (L, G) bool
        envs: PackedEnvironment,
        samplers: Optional[HaltonState] = None,
        base_rot: Optional[jnp.ndarray] = None,
        base_pos: Optional[jnp.ndarray] = None,
        group_id: Optional[jnp.ndarray] = None,
    ) -> RRTCResult:
        """`group_id` (L,) int32: racing-replica groups. Lanes sharing a group
        id solve the same problem with different sample streams; the moment one
        replica solves, its siblings stop stepping (their `solved` stays False
        — only self-solved lanes report a path). Without it every replica runs
        to its own budget even after the problem is won."""
        L, G = goals.shape[0], goals.shape[1]
        if samplers is None:
            if restarts > 1:
                raise ValueError(
                    "restarts > 1 requires explicit samplers with a leading "
                    "(restarts, ...) axis of decorrelated banks"
                )
            samplers = halton_init_batch(dim, L)
        if restarts > 1 and samplers.b.ndim != 3:
            raise ValueError(
                f"restarts={restarts} expects sampler arrays (R, dim, L); "
                f"got b.shape={samplers.b.shape}"
            )
        br, bp = base_rot, base_pos

        def share(d):
            # any() within each replica group, scattered back per lane
            if group_id is None:
                return d
            seg = jnp.zeros((L,), bool).at[group_id].max(d)
            return seg[group_id]

        # -- straight-line early exit (rrtc.hh:61-74) -----------------------
        # `line_check=False` skips it: wave harnesses re-batch SURVIVORS of an
        # earlier wave, which by definition already failed this exact check —
        # re-validating diam*resolution states per lane every wave is pure
        # waste (the T_line tile is ~7 step-equivalents of fkcc).
        if line_check:
            line_vecs = goals - starts[:, None, :]
            line_dists = jnp.linalg.norm(line_vecs, axis=2)
            lv = line_vecs.transpose(2, 0, 1).reshape(dim, L * G)
            ls = jnp.broadcast_to(starts.T[:, :, None], (dim, L, G)).reshape(dim, L * G)
            if envs.sphere_xyzr.ndim == 3 and G > 1:
                envs_rep = jax.tree.map(lambda x: jnp.repeat(x, G, axis=0), envs)
            else:
                envs_rep = envs
            line_ok = validate_line(
                ls, lv, line_dists.reshape(-1), envs_rep, br, bp
            ).reshape(L, G)
            line_valid = line_ok & goal_mask
            any_line = jnp.any(line_valid, axis=1)
            first_goal = jnp.argmax(line_valid, axis=1)
        else:
            any_line = jnp.zeros((L,), bool)
            first_goal = jnp.zeros((L,), jnp.int32)
        # Lanes with no live goal can never connect: done from the start
        # (otherwise padding lanes run every wave to its full budget).
        dead = ~jnp.any(goal_mask, axis=1)

        # -- tree buffers ---------------------------------------------------
        # Slot 0 = start, slots 1..G = goals. Tree membership + live mask are
        # folded into the squared-norm arrays (BIG = not in this tree).
        # Buffers start at the first stage capacity and grow between stages.
        start_sq = jnp.sum(starts * starts, axis=1)  # (L,)
        goal_sq = jnp.sum(goals * goals, axis=2)  # (L, G)

        def init_carry(sampler_bank, done0, solved0):
            N0 = stage_caps[0]
            states = jnp.zeros((dim, N0, L), jnp.float32)
            states = lax.dynamic_update_slice(states, starts.T[:, None, :], (0, 0, 0))
            states = lax.dynamic_update_slice(
                states, goals.transpose(2, 1, 0), (0, 1, 0)
            )
            # Both trees' sentinel-norm arrays in ONE (2, N, L) buffer: one
            # argmin and one contiguous insert write instead of two of each
            # (serialized phases are what per-step cost is made of on this
            # device). The surface stays float32 even under nn_bf16
            # (docstring: only the dot's states read is bf16).
            s2ab = jnp.full((2, N0, L), BIG, jnp.float32)
            s2ab = lax.dynamic_update_slice(s2ab, start_sq[None, None, :], (0, 0, 0))
            s2ab = lax.dynamic_update_slice(
                s2ab, jnp.where(goal_mask, goal_sq, BIG).T[None], (1, 1, 0)
            )
            parents = jnp.broadcast_to(
                jnp.arange(N0, dtype=jnp.int32)[:, None], (N0, L)
            )
            radii = jnp.full((N0, L), INF)
            return dict(
                states=states,
                s2ab=s2ab,
                **({"states_bf": states.astype(jnp.bfloat16)} if nn_bf16 else {}),
                parents=parents,
                radii=radii,
                slot=jnp.int32(1 + G),
                sizes=jnp.stack(
                    [jnp.ones((L,)), jnp.sum(goal_mask, axis=1).astype(jnp.float32)]
                ),
                tree_a=jnp.full(
                    (L,), 1 if settings.start_tree_first else 0, jnp.int8
                ),
                sampler=sampler_bank,
                iter=jnp.zeros((L,), jnp.int32),
                done=done0,
                solved=solved0,
                mode=jnp.zeros((L,), jnp.int8),
                c_prior=jnp.zeros((dim, L), jnp.float32),
                c_prior_idx=jnp.zeros((L,), jnp.int32),
                c_inc=jnp.zeros((dim, L), jnp.float32),
                c_inc_len=jnp.zeros((L,), jnp.float32),
                c_segs_left=jnp.zeros((L,), jnp.int32),
                c_target=jnp.zeros((L,), jnp.int32),
                tail_a=jnp.zeros((L,), jnp.int32),
                tail_b=jnp.zeros((L,), jnp.int32),
                step=jnp.int32(0),
            )

        def running(c):
            budget = (c["iter"] < settings.max_iterations) | (c["mode"] == CONNECT)
            return budget & (~c["done"])

        def make_cond(cap):
            # U unrolled body calls consume 2*U slots per loop iteration; the
            # last call's 2-row write needs slot <= cap-2, so the entry bound
            # tightens to cap - (2*U - 1).
            bound = cap - (2 * U - 1)

            def cond(c):
                if _FIXED_STEPS:
                    # Slot guard still applies: an odd _FIXED_STEPS with U>1
                    # must not write past cap (advisor round-4 finding).
                    return (c["step"] < _FIXED_STEPS) & (c["slot"] < bound)
                return jnp.any(running(c)) & (c["slot"] < bound)

            return cond

        def fetch_cfg(states, idx):
            """(L,) slot ids -> (dim, L) configurations, gathered per lane
            along the slot axis of the (dim, N, L) buffer (no lane-major
            mirror: one fewer big carried buffer + per-step update)."""
            got = jnp.take_along_axis(
                states, jnp.broadcast_to(idx[None, None, :], (dim, 1, L)), axis=1
            )
            return got[:, 0, :]

        def body(c):
            states = c["states"]
            states_bf = c.get("states_bf")
            s2ab = c["s2ab"]
            parents, radii = c["parents"], c["radii"]
            slot, sizes, tree_a = c["slot"], c["sizes"], c["tree_a"]
            run = running(c)
            is_ext = c["mode"] == EXTEND
            extend = run & is_ext
            continuing = run & ~is_ext

            # -- balance swap (EXTEND lanes only; rrtc.hh:101-109) ----------
            ta_oh = jnp.stack([tree_a == 0, tree_a == 1]).astype(jnp.float32)
            asize = jnp.sum(sizes * ta_oh, axis=0)
            bsize = jnp.sum(sizes * (1.0 - ta_oh), axis=0)
            ratio = jnp.abs(asize - bsize) / asize
            do_swap = (
                jnp.full((L,), True)
                if not settings.balance
                else ratio < settings.tree_ratio
            )
            tree_a = jnp.where(extend & do_swap, 1 - tree_a, tree_a).astype(jnp.int8)
            in_a = (tree_a == 0)[None, :]  # (1, L)

            # -- sample; stream advances on EXTEND lanes only ---------------
            if "halton" in _DISABLE:
                u = jnp.full((dim, L), 0.5) * (
                    1.0 + c["step"].astype(jnp.float32) * 1e-4
                )
                sampler = c["sampler"]
            else:
                u, sampler_next = halton_next(c["sampler"])
                sampler = jax.tree.map(
                    lambda new, old: jnp.where(
                        extend if new.ndim == 1 else extend[None], new, old
                    ),
                    sampler_next,
                    c["sampler"],
                )
            sample = u * scale[:, None] + lower[:, None]

            # -- NN in BOTH trees from one states sweep ---------------------
            # Both queries use the SAMPLE (see the other-tree note below), so
            # the dot over the (dim, N, L) buffer — the dominant per-step HBM
            # read in deep waves — is computed once; the two trees' sentinel
            # arrays share one (2, N, L) buffer so both argmins are ONE op,
            # and per-lane tree identity is a select of the two results.
            in_a_sel = in_a[0]
            if "nn" in _DISABLE:
                near_idx = jnp.zeros((L,), jnp.int32)
                arg_a = arg_b = near_idx
            elif nn_bf16:
                # half-width sweep: bf16 states-mirror dot with f32
                # accumulation; norms stay f32. q2 is a per-lane constant so
                # it cannot change the argmin — dropped.
                dot = lax.dot_general(
                    sample.astype(jnp.bfloat16)[None],
                    states_bf,
                    dimension_numbers=(((1,), (0,)), ((2,), (2,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :].T  # (N, L) f32
                sq = s2ab - 2.0 * dot[None]  # (2, N, L) f32
                args2 = jnp.argmin(sq, axis=1).astype(jnp.int32)  # (2, L)
                arg_a, arg_b = args2[0], args2[1]
                near_idx = jnp.where(in_a_sel, arg_a, arg_b)
            else:
                dot = jnp.sum(states * sample[:, None, :], axis=0)  # (N, L)
                q2 = jnp.sum(sample * sample, axis=0)
                sq = s2ab - 2.0 * dot[None] + q2[None, None, :]  # (2, N, L)
                args2 = jnp.argmin(sq, axis=1).astype(jnp.int32)  # (2, L)
                arg_a, arg_b = args2[0], args2[1]
                near_idx = jnp.where(in_a_sel, arg_a, arg_b)
            # other-tree connect target (see deviation note below): computed
            # up front so BOTH configurations come from one gather
            if "nn" in _DISABLE or "nn2" in _DISABLE:
                ob_idx = jnp.ones((L,), jnp.int32)
            else:
                ob_idx = jnp.where(in_a_sel, arg_b, arg_a)
            if "gather" in _DISABLE:
                near_cfg = sample * 0.9
                near_rad = jnp.full((L,), INF)
            else:
                got = jnp.take_along_axis(
                    states,
                    jnp.broadcast_to(
                        jnp.stack([near_idx, ob_idx])[None], (dim, 2, L)
                    ),
                    axis=1,
                )
                near_cfg, ob_cfg = got[:, 0], got[:, 1]
                near_rad = jnp.take_along_axis(radii, near_idx[None, :], axis=0)[0]

            vec = sample - near_cfg
            # Distance from the actual vector, not the |s|^2-2s.q+|q|^2 NN
            # estimate: catastrophic cancellation in the latter would size the
            # edge-validation state count below the reference-resolution
            # contract at ceil boundaries (the fast form only ranks argmin).
            near_dist = jnp.linalg.norm(vec, axis=0)
            dd_reject = (
                jnp.bool_(settings.dynamic_domain) & (near_rad < near_dist) & extend
            )
            reach = near_dist < rng_range
            ext_vec = jnp.where(
                reach[None],
                vec,
                vec * (rng_range / jnp.maximum(near_dist, 1e-12))[None],
            )
            ext_dist = jnp.where(reach, near_dist, rng_range)
            new_cfg = near_cfg + ext_vec

            # -- NN in the other tree ---------------------------------------
            # Queried with the SAMPLE, not the speculative new node: both NN
            # queries then share one states sweep (above) instead of
            # serializing NN1 -> new_cfg -> NN2; the two winning
            # configurations come back in one gather. When the sample is
            # within `range` of the near node the query is identical (new_cfg
            # == sample); otherwise new_cfg lies on the near->sample segment
            # and the chosen connect target is almost always the same node.
            # Deviation from rrtc.hh:160-165 documented in the module
            # docstring (turbo already trades stream parity).
            if "gather" in _DISABLE:
                ob_cfg = new_cfg + 0.1
            ob_dist = jnp.linalg.norm(ob_cfg - new_cfg, axis=0)
            n_segs = jnp.maximum(jnp.ceil(ob_dist / rng_range), 1.0)

            # Connect increments: fresh for extend lanes, carried for
            # continuation lanes.
            inc = jnp.where(
                is_ext[None], (ob_cfg - new_cfg) / n_segs[None], c["c_inc"]
            )
            inc_len = jnp.where(is_ext, ob_dist / n_segs, c["c_inc_len"])
            segs_total = jnp.where(
                is_ext, n_segs.astype(jnp.int32), c["c_segs_left"]
            )
            base = jnp.where(is_ext[None], new_cfg, c["c_prior"])
            target = jnp.where(is_ext, ob_idx, c["c_target"])

            # -- one fused validation: extend edge + K connect segments -----
            # Block 0: the extend edge for EXTEND lanes; for continuation
            # lanes it is their next connect segment (so blocks 0..K give
            # them K+1 segments per step).
            kb = jnp.arange(1, K + 1, dtype=jnp.float32)[:, None, None]
            p0 = jnp.where(is_ext[None], near_cfg, base)
            v0 = jnp.where(is_ext[None], ext_vec, inc)
            d0 = jnp.where(is_ext, ext_dist, inc_len)
            seg_base = jnp.where(is_ext[None], base, base + inc)
            p_rest = seg_base[None] + inc[None] * (kb - 1.0)
            p_blocks = jnp.concatenate([p0[None], p_rest], axis=0)
            v_blocks = jnp.concatenate(
                [v0[None], jnp.broadcast_to(inc[None], (K, dim, L))], axis=0
            )
            d_blocks = jnp.concatenate(
                [d0[None], jnp.broadcast_to(inc_len[None], (K, L))], axis=0
            )
            if "val" in _DISABLE:
                valid = jnp.ones((1 + K, L), bool) & (d_blocks < BIG)
            else:
                valid = validate_blocks(p_blocks, v_blocks, d_blocks, envs, br, bp)

            # Leading-valid connect segment count per lane. Extend lanes'
            # segment list is valid[1:] (block 0 was the extend edge), padded
            # with False; continuation lanes' list is valid[0:] (K+1 segs).
            ext_ok = extend & valid[0] & ~dd_reject
            gate = jnp.where(is_ext, ext_ok, continuing)
            segv_ext = jnp.concatenate([valid[1:], jnp.zeros((1, L), bool)], axis=0)
            segv = jnp.where(is_ext[None], segv_ext, valid)  # (K+1, L)
            avail = jnp.where(is_ext, K, K + 1)  # segments offered this step
            lead = jnp.cumprod(segv.astype(jnp.int8), axis=0).astype(jnp.int32)
            m_raw = jnp.sum(lead, axis=0)  # leading-True count, 0..K+1
            m = jnp.where(gate, jnp.minimum(m_raw, segs_total), 0)

            connected = gate & (m >= segs_total)

            # -- dynamic-domain radius update (rrtc.hh:126-129, 229-240) ----
            grow = ext_ok & jnp.bool_(settings.dynamic_domain) & (near_rad != INF)
            shrink = (
                extend & ~valid[0] & ~dd_reject & jnp.bool_(settings.dynamic_domain)
            )
            shrunk = jnp.where(
                near_rad == INF,
                jnp.float32(settings.radius),
                jnp.maximum(near_rad * (1.0 - settings.alpha), settings.min_radius),
            )
            r_new = jnp.where(
                grow, near_rad * (1.0 + settings.alpha), jnp.where(shrink, shrunk, near_rad)
            )

            # Unconditional masked update — a data-dependent lax.cond here
            # costs a serialized host-sync phase on the axon relay, far more
            # than the (N, L) elementwise where it saves.
            if "radii" not in _DISABLE:
                iota_N = jnp.arange(radii.shape[0], dtype=jnp.int32)[:, None]
                oh_near = iota_N == near_idx[None, :]
                radii = jnp.where(
                    oh_near & (grow | shrink)[None, :], r_new[None, :], radii
                )

            # -- insertions: slot0 = extend node, slot1 = connect waypoint --
            # Fixed 2-slot allocation: ONE contiguous 2-row write per buffer
            # per step (vacant rows carry BIG / self-parent sentinels), so
            # every buffer sees a single update phase instead of two chained
            # dynamic_update_slices. Trades ~1.5x slot head-room (slots are
            # consumed per step, not per insertion) for serialized phase
            # latency, which dominates step cost on the axon relay.
            ins0 = ext_ok
            node0 = new_cfg
            # farthest validated connect waypoint (colinear prefix merged)
            way_cfg = base + inc * m.astype(jnp.float32)[None]
            ins1 = gate & (m >= 1) & ~connected
            node0_id = slot
            node1_id = slot + 1
            parent1 = jnp.where(is_ext, node0_id, c["c_prior_idx"])

            in_a_l = tree_a == 0
            if "ins" not in _DISABLE:
                rows = jnp.stack([node0, way_cfg], axis=1)  # (dim, 2, L)
                states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
                n0_sq = jnp.sum(node0 * node0, axis=0)
                n1_sq = jnp.sum(way_cfg * way_cfg, axis=0)
                ins2 = jnp.stack([ins0, ins1])  # (2slots, L)
                nsq2 = jnp.stack([n0_sq, n1_sq])  # (2slots, L)
                tsel = jnp.stack([in_a_l, ~in_a_l])  # (2trees, L)
                rows2 = jnp.where(
                    ins2[None] & tsel[:, None], nsq2[None], BIG
                )  # (2trees, 2slots, L): ONE write covers both trees
                s2ab = lax.dynamic_update_slice(
                    s2ab, rows2.astype(s2ab.dtype), (0, slot, 0)
                )
                if nn_bf16:
                    # mirror write: independent of the other updates, so it
                    # shares their phase (tiny bytes, no extra latency)
                    states_bf = lax.dynamic_update_slice(
                        states_bf, rows.astype(jnp.bfloat16), (0, slot, 0)
                    )
                # Inactive slots self-parent so a path walk can't escape them.
                parents = lax.dynamic_update_slice(
                    parents,
                    jnp.stack(
                        [
                            jnp.where(ins0, near_idx, jnp.broadcast_to(node0_id, (L,))),
                            jnp.where(ins1, parent1, jnp.broadcast_to(node1_id, (L,))),
                        ]
                    ),
                    (slot, 0),
                )
                radii = lax.dynamic_update_slice(
                    radii, jnp.full((2, L), INF), (slot, 0)
                )

            slot_next = slot + 2
            ta2 = jnp.stack([in_a_l, ~in_a_l]).astype(jnp.float32)
            sizes = sizes + ta2 * (
                ins0.astype(jnp.float32) + ins1.astype(jnp.float32)
            )

            # -- mode transitions ------------------------------------------
            # Extend lanes whose edge validated but connect unfinished keep
            # connecting next step; all-segs-done lanes finish; failures (or
            # rejected samples) sample anew.
            # `more` = every offered segment validated and segments remain;
            # a partial prefix means the connect hit an obstacle -> resample.
            more = gate & ~connected & (m_raw >= avail)
            mode = jnp.where(run, jnp.where(more, CONNECT, EXTEND), c["mode"]).astype(
                jnp.int8
            )
            c_prior = jnp.where(more[None], way_cfg, c["c_prior"])
            c_prior_idx = jnp.where(more, node1_id, c["c_prior_idx"])
            segs_left = jnp.where(more, segs_total - m, c["c_segs_left"])

            tail_a = jnp.where(
                connected, jnp.where(is_ext, node0_id, c["c_prior_idx"]), c["tail_a"]
            )
            tail_b = jnp.where(connected, target, c["tail_b"])

            return dict(
                step=c["step"] + 1,
                states=states,
                s2ab=s2ab,
                **({"states_bf": states_bf} if nn_bf16 else {}),
                parents=parents,
                radii=radii,
                slot=slot_next,
                sizes=sizes,
                tree_a=tree_a,
                sampler=sampler,
                iter=c["iter"] + extend.astype(jnp.int32),
                done=c["done"] | share(connected),
                solved=c["solved"] | connected,
                mode=mode,
                c_prior=c_prior,
                c_prior_idx=c_prior_idx,
                c_inc=jnp.where(more[None], inc, c["c_inc"]),
                c_inc_len=jnp.where(more, inc_len, c["c_inc_len"]),
                c_segs_left=segs_left,
                c_target=jnp.where(more, target, c["c_target"]),
                tail_a=tail_a,
                tail_b=tail_b,
            )

        def grow(c, cap):
            """Pad tree buffers to `cap` slots with vacant-sentinel rows (BIG
            norms, self-parents, INF radii): identical tree state, larger
            capacity — the solve trajectory is unchanged by staging."""
            n_old = c["s2ab"].shape[1]
            pad = cap - n_old
            c = dict(c)
            c["states"] = jnp.concatenate(
                [c["states"], jnp.zeros((dim, pad, L), jnp.float32)], axis=1
            )
            if nn_bf16:
                c["states_bf"] = jnp.concatenate(
                    [c["states_bf"], jnp.zeros((dim, pad, L), jnp.bfloat16)],
                    axis=1,
                )
            c["s2ab"] = jnp.concatenate(
                [c["s2ab"], jnp.full((2, pad, L), BIG, c["s2ab"].dtype)], axis=1
            )
            c["parents"] = jnp.concatenate(
                [
                    c["parents"],
                    jnp.broadcast_to(
                        jnp.arange(n_old, cap, dtype=jnp.int32)[:, None], (pad, L)
                    ),
                ],
                axis=0,
            )
            c["radii"] = jnp.concatenate(
                [c["radii"], jnp.full((pad, L), INF)], axis=0
            )
            return c

        def body_u(c):
            for _ in range(U):
                c = body(c)
            return c

        def run_segment(c):
            out = c
            for cap in stage_caps:
                if out["s2ab"].shape[1] < cap:
                    out = grow(out, cap)
                out = lax.while_loop(make_cond(cap), body_u, out)
            if U > 1 and not _FIXED_STEPS:
                # Residual single-step loop at the final capacity: the
                # unrolled loop exits at slot >= cap-(2U-1), stranding up to
                # U-1 body steps of budget when slot exhaustion (not
                # running()) terminates — a borderline problem could flip
                # solved<->unsolved between unroll settings (advisor round-4
                # finding). This restores the exact U=1 trajectory bound
                # (slot < cap-1) for any unroll.
                cap = stage_caps[-1]

                def cond_res(c2):
                    return jnp.any(running(c2)) & (c2["slot"] < cap - 1)

                out = lax.while_loop(cond_res, body, out)
            return out

        def recover(out):
            # tail_a is the junction node in tree_a; tail_b the connect
            # target in the other tree (the validated straight
            # junction->target edge is implicit). Both chains include their
            # endpoint.
            states_lm = out["states"].transpose(2, 1, 0)  # (L, N, dim)
            parents_lm = out["parents"].T  # (L, N)
            tree_a_end = out["tree_a"]

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
            chain_b, len_b = walk(out["tail_b"])
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
            path = jnp.take_along_axis(states_lm, seq[:, :, None], 1)
            return path, total

        # -- run: one segment, or R restart segments fused ------------------
        done0 = share(any_line) | dead
        if restarts <= 1:
            out = run_segment(init_carry(samplers, done0, any_line))
            path, total = recover(out)
            solved = out["solved"]
            iters = out["iter"]
            sizes = out["sizes"]
            sampler_end = out["sampler"]
        else:
            banks = [
                jax.tree.map(lambda x, r=r: x[r], samplers) for r in range(restarts)
            ]
            solved = any_line
            path = jnp.zeros((L, max_path, dim), jnp.float32)
            total = jnp.zeros((L,), jnp.int32)
            iters = jnp.zeros((L,), jnp.int32)
            sizes = jnp.stack(
                [jnp.ones((L,)), jnp.sum(goal_mask, axis=1).astype(jnp.float32)]
            )
            sampler_end = banks[-1]
            for r in range(restarts):
                out = run_segment(
                    init_carry(banks[r], done0 | share(solved), jnp.zeros((L,), bool))
                )
                path_r, total_r = recover(out)
                new = out["solved"] & ~solved
                path = jnp.where(new[:, None, None], path_r, path)
                total = jnp.where(new, total_r, total)
                iters = iters + out["iter"]
                sizes = jnp.where(new[None, :], out["sizes"], sizes)
                solved = solved | out["solved"]
                sampler_end = out["sampler"]

        line_goal = jnp.take_along_axis(goals, first_goal[:, None, None], 1)[:, 0]
        line_path = jnp.zeros((L, max_path, dim), jnp.float32)
        line_path = line_path.at[:, 0, :].set(starts).at[:, 1, :].set(line_goal)
        path = jnp.where(any_line[:, None, None], line_path, path)
        total = jnp.where(any_line, 2, total)

        deltas = jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=2)
        seg_mask = jnp.arange(1, max_path)[None, :] < total[:, None]
        cost = jnp.sum(jnp.where(seg_mask, deltas, 0.0), axis=1)

        return RRTCResult(
            path=path,
            path_length=jnp.where(solved, total, 0).astype(jnp.int32),
            cost=jnp.where(solved, cost, 0.0),
            iterations=iters,
            solved=solved,
            tree_sizes=sizes.T.astype(jnp.int32),
            sampler=sampler_end,
        )

    return solve_batch


def make_rrtc_simplify_batch(
    spec: RobotSpec,
    settings: RRTCSettings,
    simplify_settings=None,
    n_goals: int = 1,
    max_path: int = 256,
    connect_segs: int = 1,
    line_check: bool = True,
    chunk_states: int = 16,
    lite: bool = False,
    nn_bf16: bool = False,
):
    """One fused program: turbo solve THEN simplification, no intermediate
    host hop. The single-query latency path pays the ~29 ms relay call floor
    once for a usable (simplified) path instead of twice (reference users get
    plan+simplify as their end-to-end time too — scripts/README.md:13 reports
    'total' = plan + simplify).

    `lite=True` swaps the full SHORTCUT+BSPLINE pipeline for the shortcut-DP
    pass (planners/simplify.make_shortcut_dp_batch): the optimal waypoint-
    subsequence shortcut computed in a handful of device phases, built for
    this fused latency path — the full pipeline's per-candidate cursor loop
    costs hundreds of serialized relay phases and tripled the round-4 fused
    latency (benchmarks/latency_results.json L8_fused history).

    Returns `run(starts, goals, goal_mask, envs, samplers?, group_id?) ->
    (RRTCResult, SimplifyResult)`; unsolved lanes carry a trivial 2-point
    path through simplification (cost reported 0 via the solved mask)."""
    from ..utils.settings import SimplifySettings
    from .simplify import make_shortcut_dp_batch, make_simplify_batch

    if simplify_settings is None:
        simplify_settings = SimplifySettings()
    solve = make_rrtc_turbo_batch(
        spec, settings, n_goals, max_path, connect_segs,
        line_check=line_check, nn_bf16=nn_bf16,
    )
    if lite:
        # nodes=24 covers every observed MBM path (solve paths are ~6-14
        # waypoints; longer ones fall back safely), and 64-state validation
        # chunks quarter the serialized chunk count vs 16 (measured faster
        # on the relay: fewer, bigger phases).
        simplify = make_shortcut_dp_batch(
            spec, max_path=max_path, nodes=24,
            chunk_states=max(chunk_states, 64),
        )
    else:
        simplify = make_simplify_batch(
            spec, simplify_settings, max_path=max_path, chunk_states=chunk_states
        )

    def run(starts, goals, goal_mask, envs, samplers=None, group_id=None):
        res = solve(starts, goals, goal_mask, envs, samplers, None, None, group_id)
        plen = jnp.maximum(res.path_length, 2)
        sres = simplify(res.path, plen, envs)
        return res, sres

    return run
