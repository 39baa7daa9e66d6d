"""MotionBenchMaker evaluation — the TPU equivalent of the reference's
scripts/evaluate_mbm.py benchmark harness.

Where the reference loops 700 problems on one core, this harness packs every
problem into a lane of the batched turbo planner (planners/rrtc_turbo) and
advances them all per device step, with *geometric wave compaction*: a first
wave at a small iteration budget solves the easy bulk; survivors re-batch
into later waves whose budgets double and whose lane counts shrink, with
racing replicas (independent, base-rotated Halton streams per problem —
reference halton.hh:76-82 rotates bases itself) soaking up the freed lanes.
Budget doubling bounds re-done work at <2x a problem's solve cost, and the
loop of each wave ends the moment its slowest *winner* finishes (lanes whose
problem is solved idle but never extend the wall clock).

Per reference parity: every problem's replica-0 stream is the canonical
Halton stream (evaluate_mbm.py:95-96 resets the sampler per problem), RRTC
range comes from ROBOT_RRT_RANGES, and simplification runs the default
SHORTCUT+BSPLINE pipeline.

Usage:
    python benchmarks/evaluate_mbm.py --robot panda
"""

import argparse
import gzip
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA_DIR = Path(__file__).resolve().parent / "data"

# (iteration budget, tree slots, max racing replicas, max lanes, repeats)
# per wave. Slots ~ 2.6x budget (the fixed-allocation solver consumes 2
# slots per step; steps ~ 1.3x iterations). Step cost grows with slots x
# lanes, so late waves shrink lanes hard and use *repeats*: re-running a
# moderate budget with freshly rotated racing streams exploits the
# heavy-tailed restart distribution instead of paying for one enormous tree
# (whose NN sweeps grow quadratically in budget).
# With racing-group done sharing, a wave runs its FULL budget whenever any
# problem has no winner yet — so later waves favor smaller budgets + more
# decorrelated streams (wide and shallow), leaving only the last wave deep.
DEFAULT_WAVES = (
    (128, 384, 1, 1024, 1),
    (384, 1024, 2, 768, 1),
    (768, 2048, 5, 512, 1),
    (1280, 3456, 12, 256, 1),
    (1536, 4096, 24, 128, 2),
    (6144, 16384, 48, 96, 1),
)


def load_problems(robot: str, sets=None):
    with gzip.open(DATA_DIR / f"{robot}_problems.pkl.gz") as f:
        data = pickle.load(f)
    out = []
    for name, pset in data["problems"].items():
        if sets and name not in sets:
            continue
        for p in pset:
            out.append(p)
    return out


def racing_samplers(dim: int, L: int, replica):
    """Deterministic per-replica Halton streams: replica 0 is the canonical
    stream (reference parity); replica r jumps to stream index r * 49999 in
    closed form (samplers.halton.halton_state_at) — disjoint, decorrelated
    windows of the same low-discrepancy sequence (base-rotation-only
    variants proved highly correlated: consecutive rotations often fail the
    same problems)."""
    from vamp_tpu.samplers.halton import halton_state_at

    import jax

    replica = np.asarray(replica, np.int64)
    if replica.ndim == 2:  # (R, L): stacked banks for fused restart segments
        R = replica.shape[0]
        flat = halton_state_at(replica.reshape(-1) * 49999, dim)
        return jax.tree.map(
            lambda x: (
                x.reshape(dim, R, -1).transpose(1, 0, 2)
                if x.ndim == 2
                else x.reshape(R, -1)
            ),
            flat,
        )
    return halton_state_at(replica * 49999, dim)


def evaluate(
    robot: str = "panda",
    sets=None,
    waves=DEFAULT_WAVES,
    quiet: bool = False,
    timed: bool = True,
    turbo: bool = True,
    pointcloud: bool = False,
    samples_per_object: int = 2048,
    filter_radius: float = 0.02,
    pc_lanes: int = 32,
    limit: int = 0,
    connect_segs: int = 1,
    unroll: int = 2,
    nn_bf16: bool = False,
):
    """With `timed`, each wave runs twice — once to compile/warm up, once for
    the measured wall time (results come from the timed run; the solver is
    deterministic so both runs are identical)."""
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from vamp_tpu.planners.rrtc import make_rrtc_batch
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import RRTCSettings, SimplifySettings

    module = vamp.robot_module(robot)
    spec = module.spec
    dim = spec.dimension

    problems = load_problems(robot, sets)
    if limit:
        problems = problems[:limit]
    n_total = len(problems)

    # -- full multi-goal workload (reference evaluate_mbm.py:98 passes the
    # whole goal list; rrtc.hh:90-97 seeds the goal tree with every goal).
    # Goals pad to the suite max and mask off; cost semantics match the
    # reference: the reported cost is to whichever goal the connect reached
    # (in today's MBM pickles every problem has exactly one goal, so G_max=1
    # and the numbers are unchanged — but the harness no longer drops goals).
    starts = np.stack([np.asarray(p["start"], np.float32) for p in problems])
    G_max = max(len(p["goals"]) for p in problems)
    goals = np.zeros((n_total, G_max, dim), np.float32)
    gmask = np.zeros((n_total, G_max), bool)
    for k, p in enumerate(problems):
        for g, q in enumerate(p["goals"]):
            goals[k, g] = np.asarray(q, np.float32)
            gmask[k, g] = True

    if pointcloud:
        # CAPT mode (reference scripts/evaluate_mbm.py:54-59 + 77-85):
        # synthesize + filter a cloud per problem, build per-lane CAPTs.
        # A lane-batched CAPT is ~90 MB/lane (leaf affordance buffers), so
        # the suite can NEVER stack into one device pytree (704 lanes = 61 GB
        # — the round-3 full-suite worker kill). Everything device-side runs
        # in lane chunks of `pc_lanes`, and each wave re-pads the pending
        # problems' raw CAPTs to that wave's maxima (per-wave tight cloud
        # capacities).
        from vamp_tpu.env import Environment as _Env
        from vamp_tpu.ops.capt import pad_capt
        from vamp_tpu.pointcloud import problem_dict_to_pointcloud

        from dataclasses import replace as _dc_replace

        def _to_host(c):
            # raw CAPTs must live on HOST: build_capt returns device arrays,
            # and 700 resident trees exceed HBM outright at dense sampling
            # (e.g. samples_per_object=2048 -> max_aff 1661 -> ~40 GB; the
            # round-5 full-suite OOM). Only the per-chunk PADDED copies are
            # transferred, transiently, by envs_for.
            return _dc_replace(
                c,
                tests=np.asarray(c.tests),
                leaf_points=np.asarray(c.leaf_points),
                leaf_aabb=np.asarray(c.leaf_aabb),
                top_aabb=np.asarray(c.top_aabb),
                point_radius=np.asarray(c.point_radius),
            )

        raw_capts = []
        for p in problems:
            e, _orig, _filt, _ft, _bt = problem_dict_to_pointcloud(
                robot, p, samples_per_object, filter_radius, True
            )
            raw_capts.append(_to_host(e.pointclouds[0]))
        nlog2 = max(c.nlog2 for c in raw_capts)
        max_aff = max(c.leaf_points.shape[1] for c in raw_capts)
        if not quiet:
            pts = [int(2 ** c.nlog2) for c in raw_capts]
            print(
                f"pointcloud mode: tree depth {nlog2}, max_aff {max_aff}, "
                f"leaves min/max {min(pts)}/{max(pts)}, pc_lanes {pc_lanes}"
            )

        def packed_env(i, n2, aff):
            shell = _Env()
            shell.pointclouds = [pad_capt(raw_capts[i], n2, aff)]
            return shell.pack(quantum=1)

        def envs_for(ids, n2=None, aff=None):
            n2 = nlog2 if n2 is None else n2
            aff = max_aff if aff is None else aff
            return jax.tree.map(
                lambda *xs: jnp.stack(xs), *[packed_env(i, n2, aff) for i in ids]
            )
    else:
        from vamp_tpu.env import max_class_counts

        env_objs = [vamp.problem_dict_to_vamp(p) for p in problems]
        caps = max_class_counts(env_objs)  # incl. z-aligned fast-path classes
        envs_list = [e.pack(quantum=1, capacities=caps) for e in env_objs]
        envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)

        def envs_for(ids, n2=None, aff=None):
            return jax.tree.map(lambda x: x[np.asarray(ids)], envs_all)

    # -- problem validity (reference: data['valid'] filter), batched --------
    from vamp_tpu.ops.fkcc_bm import make_fkcc_planner

    fkccp = jax.jit(make_fkcc_planner(spec))
    CH = pc_lanes if pointcloud else n_total
    sv = np.zeros(n_total, bool)
    gv = np.zeros((n_total, G_max), bool)
    if pointcloud:
        # size-sorted chunks at per-chunk tree maxima (same rationale as the
        # wave loop: global-maxima padding dominated the round-4 wall time)
        v_order = sorted(
            range(n_total),
            key=lambda i: (raw_capts[i].nlog2, raw_capts[i].leaf_points.shape[1]),
        )
    else:
        v_order = list(range(n_total))
    for c0 in range(0, n_total, CH):
        ids = [int(i) for i in v_order[c0 : c0 + CH]]
        ids_p = ids + [ids[0]] * (CH - len(ids))  # pad: one compile shape
        if pointcloud:
            n2_c = max(raw_capts[i].nlog2 for i in ids)
            aff_c = -(-max(raw_capts[i].leaf_points.shape[1] for i in ids) // 64) * 64
            envs_c = envs_for(ids_p, n2_c, aff_c)
        else:
            envs_c = envs_for(ids_p)
        sv_c = np.asarray(
            fkccp(jnp.asarray(starts[ids_p].T)[:, None, :], envs_c, None, None)
        )[0]
        gv_c = np.asarray(
            fkccp(jnp.asarray(goals[ids_p].transpose(2, 1, 0)), envs_c, None, None)
        ).T  # (CH, G)
        sv[ids] = sv_c[: len(ids)]
        gv[ids] = gv_c[: len(ids)]
    in_limits = lambda q: np.all(
        (q >= spec.lower) & (q <= spec.upper), axis=-1
    )
    goal_ok = gv & in_limits(goals) & gmask  # (n, G)
    valid = sv & in_limits(starts) & goal_ok.any(axis=1)
    # gmask stays the RAW goal list: the reference seeds every goal into the
    # goal tree unconditionally (rrtc.hh:90-97) — a colliding goal can never
    # be connected (the connect edge validates its endpoint), it just sits.
    n_valid = int(valid.sum())

    make_solver = make_rrtc_turbo_batch if turbo else make_rrtc_batch

    # -- wave loop ----------------------------------------------------------
    pending = np.nonzero(valid)[0]
    solved = np.zeros(n_total, bool)
    costs = np.zeros(n_total, np.float32)
    iters = np.zeros(n_total, np.int64)
    paths = [None] * n_total
    path_caps = 256
    solve_timed = 0.0
    wave_stats = []

    from vamp_tpu.utils.profiling import annotate, trace as device_trace

    t0 = time.perf_counter()
    rotation = 0  # racing-stream rotation cursor (fresh streams per repeat)
    trace_cm = device_trace()  # no-op unless VAMP_TRACE_DIR is set
    trace_cm.__enter__()
    try:
        for wave, wspec in enumerate(waves):
            # wave spec: (budget, slots, K_max, L_max, repeats[, restarts])
            # `repeats` re-batches survivors between separate device calls;
            # `restarts` fuses fresh-tree attempts INSIDE one call (turbo
            # restart segments — no per-attempt relay floor or host hop).
            (max_iter, max_samp, K_max, L_max, repeats), R = wspec[:5], (
                wspec[5] if len(wspec) > 5 else 1
            )
            for rep in range(repeats):
                if len(pending) == 0:
                    break
                Pw = len(pending)
                # racing: survivors re-batch with K independent sample streams
                # each — lanes are nearly free on TPU next to sequential steps,
                # so wide-and-shallow beats narrow-and-deep for the tail.
                if pointcloud:
                    # lane-chunked: at ~90 MB of CAPT per lane, a call can hold
                    # at most pc_lanes lanes; a wave runs as ceil(P/ppc) calls
                    # (replica groups never split). Chunks are SIZE-SORTED and
                    # padded to their OWN maxima (aff quantized to 64 so only a
                    # handful of distinct shapes compile): padding every
                    # problem to the wave maxima tripled host padding + tunnel
                    # transfer + device descent cost, and was why the round-4
                    # full-suite run never completed.
                    Lc = min(pc_lanes, L_max)
                    K = max(1, min(K_max, Lc // min(Pw, Lc)))
                    ppc = max(1, Lc // K)
                    order = sorted(
                        pending,
                        key=lambda i: (
                            raw_capts[i].nlog2,
                            raw_capts[i].leaf_points.shape[1],
                        ),
                    )
                    chunks = [
                        np.asarray(order[o : o + ppc], np.int64)
                        for o in range(0, Pw, ppc)
                    ]
                else:
                    K = max(1, min(L_max // Pw, K_max))
                    chunks = [pending]
                    from vamp_tpu.env import max_class_counts

                    wcaps = max_class_counts([env_objs[i] for i in pending])
                    packed_w = {
                        int(i): env_objs[i].pack(quantum=1, capacities=wcaps)
                        for i in pending
                    }

                settings = RRTCSettings(
                    range=vamp.ROBOT_RRT_RANGES.get(robot, 2.0),
                    max_iterations=max_iter,
                    max_samples=max_samp,
                )
                # straight-line early-exit only in the very first wave: later
                # waves hold survivors that already failed it (turbo-only knob)
                # unroll=2: two planner steps per while_loop iteration (measured
                # +4% suite throughput; amortizes loop-cond + phase scheduling).
                kw = (
                    {"line_check": wave == 0 and rep == 0,
                     "connect_segs": connect_segs, "unroll": unroll,
                     "nn_bf16": nn_bf16, "restarts": R}
                    if turbo
                    else {}
                )
                solve = jax.jit(
                    make_solver(spec, settings, n_goals=G_max, max_path=path_caps, **kw)
                )
                wave_time = 0.0
                warmed_shapes = set()
                for sub in chunks:
                    P = len(sub)
                    if pointcloud:
                        L = -(-(ppc * K) // 8) * 8  # fixed shape across chunks
                    else:
                        L = min(L_max, -(-(P * K) // 64) * 64)
                    lane_prob = np.full(L, -1, np.int64)
                    lane_group = np.full(L, -1, np.int64)
                    for pos, i in enumerate(sub):
                        lane_prob[pos * K : (pos + 1) * K] = i
                        lane_group[pos * K : (pos + 1) * K] = pos
                    # padding lanes carry a problem from THIS chunk: global
                    # problem 0 may exceed the per-wave CAPT maxima (n2_w/aff_w
                    # are computed over pending problems only)
                    idx = np.where(lane_prob >= 0, lane_prob, sub[0])
                    lane_live = lane_prob >= 0
                    # padding lanes: singleton groups past the live ones
                    lane_group[~lane_live] = P + np.arange(int((~lane_live).sum()))
                    replica = np.arange(L) % K + rotation
                    if rep == 0 and rotation == 0:
                        replica = np.arange(L) % K  # replica 0 = canonical stream
                    if R > 1:
                        # R fused restart banks, each K fresh streams deeper
                        replica = np.stack([replica + s * K for s in range(R)])

                    if pointcloud:
                        # per-chunk tree shape (chunks are size-sorted)
                        n2_c = max(raw_capts[i].nlog2 for i in sub)
                        aff_c = max(
                            raw_capts[i].leaf_points.shape[1] for i in sub
                        )
                        aff_c = -(-aff_c // 64) * 64
                        envs_w = envs_for(idx.tolist(), n2_c, aff_c)
                        shape_key = (n2_c, aff_c, L)
                    else:
                        shape_key = ()
                        # tight per-wave capacities: the suite-wide caps pad the
                        # median problem's live shapes with dead slots that still
                        # cost full env-sweep work; survivors repack at exactly
                        # this wave's maxima
                        fill = int(sub[0])
                        envs_w = jax.tree.map(
                            lambda *xs: jnp.stack(xs),
                            *[packed_w[int(i) if lane_live[k] else fill]
                              for k, i in enumerate(idx)],
                        )
                    args = (
                        jnp.asarray(starts[idx]),
                        jnp.asarray(goals[idx]),  # (L, G_max, dim), full goal lists
                        jnp.asarray(gmask[idx] & lane_live[:, None]),
                        envs_w,
                        racing_samplers(dim, L, replica),
                    )
                    if turbo:
                        # racing-replica groups: a problem's first winner stops its
                        # siblings (planners/rrtc_turbo.py solve_batch group_id)
                        args = args + (None, None, jnp.asarray(lane_group, jnp.int32))
                    if timed and shape_key not in warmed_shapes:
                        # compile + warm; np.asarray forces a real device round
                        # trip (block_until_ready alone returns early on some
                        # backends); later chunks of the same shape share the
                        # executable
                        np.asarray(solve(*args).solved)
                        warmed_shapes.add(shape_key)
                    tw = time.perf_counter()
                    with annotate(f"wave{wave}.{rep}"):
                        res = solve(*args)
                        ok = np.asarray(res.solved)
                    wave_time += time.perf_counter() - tw
                    ok = ok & lane_live
                    res_paths = np.asarray(res.path)
                    res_lens = np.asarray(res.path_length)
                    res_cost = np.asarray(res.cost)
                    res_iter = np.asarray(res.iterations)
                    for pos, i in enumerate(sub):
                        lanes = np.arange(pos * K, (pos + 1) * K)
                        winners = lanes[ok[lanes]]
                        if len(winners) == 0:
                            continue
                        j = winners[0]  # smallest replica
                        solved[i] = True
                        costs[i] = float(res_cost[j])
                        iters[i] = int(res_iter[j])
                        paths[i] = res_paths[j][: res_lens[j]]
                solve_timed += wave_time
                pending = np.array([i for i in pending if not solved[i]], np.int64)
                wave_stats.append(
                    dict(wave=wave, rep=rep, budget=max_iter, K=K, restarts=R,
                         calls=len(chunks), time_s=wave_time,
                         solved=Pw - len(pending), of=Pw)
                )
                if not quiet:
                    rs = f" x{R} restarts" if R > 1 else ""
                    print(
                        f"wave {wave}.{rep}: budget {max_iter}, {len(chunks)} "
                        f"call(s) x{K} streams{rs}, solved "
                        f"{Pw - len(pending)}/{Pw} in {wave_time*1e3:.0f}ms, "
                        f"remaining {len(pending)}"
                    )
                rotation += K * R
            if len(pending) == 0:
                break
    finally:
        # tracing must stop even if a wave call faults (a tunnel worker
        # crash mid-suite otherwise leaves jax.profiler tracing active,
        # corrupting the trace and breaking the next trace() start).
        trace_cm.__exit__(None, None, None)
    solve_time = time.perf_counter() - t0

    # -- batched simplification on all solved paths (256-lane slices) -------
    # Non-fatal: the suite's primary result is the solve phase; a transient
    # tunnel/remote-compile failure here must not discard a half-hour of
    # completed device solves (round-5 full-suite pointcloud run died exactly
    # this way in its simplify compile).
    t1 = time.perf_counter()
    sidx = np.nonzero(solved)[0]
    simp_costs = costs.copy()
    simplify_error = None
    simplified = np.zeros(n_total, bool)
    try:
        if len(sidx):
            Ls = pc_lanes if pointcloud else 256  # CAPT memory bounds pc lanes
            if pointcloud:
                # size-sorted chunks at per-chunk tree maxima, like the waves
                sidx = np.asarray(sorted(
                    sidx,
                    key=lambda i: (
                        raw_capts[i].nlog2, raw_capts[i].leaf_points.shape[1]
                    ),
                ))
            simplify = jax.jit(
                make_simplify_batch(
                    spec, SimplifySettings(), max_path=path_caps, chunk_states=16
                )
            )
            warmed_s = set()
            for off in range(0, len(sidx), Ls):
                blk = sidx[off : off + Ls]
                pad = np.zeros(Ls, np.int64)
                pad[: len(blk)] = blk
                pbuf = np.zeros((Ls, path_caps, dim), np.float32)
                plen = np.zeros(Ls, np.int32)
                for j, i in enumerate(blk):
                    pbuf[j, : len(paths[i])] = paths[i]
                    plen[j] = len(paths[i])
                plen[len(blk):] = 2  # idle lanes: trivial 2-point paths
                if pointcloud:
                    n2_c = max(raw_capts[i].nlog2 for i in blk)
                    aff_c = -(-max(
                        raw_capts[i].leaf_points.shape[1] for i in blk
                    ) // 64) * 64
                    envs_s = envs_for(pad.tolist(), n2_c, aff_c)
                    skey = (n2_c, aff_c)
                else:
                    envs_s = envs_for(pad.tolist())
                    skey = ()
                if timed and skey not in warmed_s:
                    np.asarray(
                        simplify(jnp.asarray(pbuf), jnp.asarray(plen), envs_s).cost
                    )
                    warmed_s.add(skey)
                    if len(warmed_s) == 1:
                        t1 = time.perf_counter()  # restart clock post-compile
                sres = simplify(jnp.asarray(pbuf), jnp.asarray(plen), envs_s)
                sc = np.asarray(sres.cost)
                for j, i in enumerate(blk):
                    simp_costs[i] = sc[j]
                    simplified[i] = True
    except Exception as exc:  # noqa: BLE001 - record, keep solve results
        simplify_error = f"{type(exc).__name__}: {exc}"
        print(f"simplify phase failed (solve results kept): {simplify_error}")
    simplify_time = time.perf_counter() - t1

    stats = {
        "robot": robot,
        "total": n_total,
        "n_goals_max": G_max,
        **(
            {
                "pointcloud": True,
                "samples_per_object": samples_per_object,
                "filter_radius": filter_radius,
                "pc_lanes": pc_lanes,
            }
            if pointcloud
            else {}
        ),
        # Reference multi-goal semantics (evaluate_mbm.py:98, rrtc.hh:90-97):
        # every goal seeds the goal tree; reported cost is to whichever goal
        # the connect reached.
        "valid": n_valid,
        "solved": int(solved.sum()),
        "success_rate": float(solved.sum() / max(n_valid, 1)),
        "solve_wall_s": solve_time,
        "solve_timed_s": solve_timed,
        "simplify_wall_s": simplify_time,
        "solves_per_s": float(solved.sum() / (solve_timed if timed else solve_time)),
        "mean_iterations": float(iters[solved].mean()) if solved.any() else 0.0,
        "mean_initial_cost": float(costs[solved].mean()) if solved.any() else 0.0,
        "mean_simplified_cost": float(simp_costs[solved].mean()) if solved.any() else 0.0,
        "simplified_coverage": float(simplified[solved].mean()) if solved.any() else 0.0,
        **({"simplify_error": simplify_error} if simplify_error else {}),
        "waves": wave_stats,
    }
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--sets", nargs="*", default=None)
    ap.add_argument("--parity", action="store_true", help="use the stream-parity solver")
    ap.add_argument("--pointcloud", action="store_true", help="CAPT pointcloud mode")
    ap.add_argument("--samples_per_object", type=int, default=2048)
    ap.add_argument("--pc_lanes", type=int, default=32,
                    help="max lanes per device call in pointcloud mode")
    ap.add_argument("--nn_bf16", action="store_true")
    ap.add_argument("--out", default=None,
                    help="write the stats dict (incl. per-wave data) as JSON")
    args = ap.parse_args()
    stats = evaluate(
        args.robot, args.sets, turbo=not args.parity,
        pointcloud=args.pointcloud, samples_per_object=args.samples_per_object,
        pc_lanes=args.pc_lanes, nn_bf16=args.nn_bf16,
    )
    for k, v in stats.items():
        print(f"{k}: {v}")
    if args.out:
        import json

        Path(args.out).write_text(json.dumps(stats, indent=1, default=float))
        print("wrote", args.out)
