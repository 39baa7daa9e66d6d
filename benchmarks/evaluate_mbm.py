"""MotionBenchMaker evaluation — the TPU equivalent of the reference's
scripts/evaluate_mbm.py benchmark harness.

Where the reference loops 700 problems on one core, this harness packs every
problem into a lane of the batched planner and advances them all per device
step, with wave compaction: a first wave at a modest iteration budget solves
the bulk; survivors re-batch into smaller follow-up waves with bigger budgets
(straggler lanes no longer hold the whole batch hostage).

Per reference parity: every problem uses a fresh Halton stream
(evaluate_mbm.py:95-96 resets the sampler per problem), RRTC range comes from
ROBOT_RRT_RANGES, and simplification runs the default SHORTCUT+BSPLINE
pipeline.

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
    stream (reference parity); replica r rotates the prime-base assignment
    (the reference itself rotates bases, halton.hh:76-82) and adds a modest
    skip every 16 rotations. Base rotation is free; skips stay small so the
    sequential halton_skip_batch cost is negligible."""
    import jax.numpy as jnp
    from vamp_tpu.samplers.halton import (
        PRIMES,
        HaltonState,
        halton_skip_batch,
    )

    replica = np.asarray(replica, np.int64)
    rot = replica % 16
    b = PRIMES[(np.arange(dim)[:, None] + rot[None, :]) % len(PRIMES)]
    state = HaltonState(
        b=jnp.asarray(b, jnp.float32),
        n=jnp.zeros((dim, L), jnp.float32),
        d=jnp.ones((dim, L), jnp.float32),
        iterations=jnp.zeros((L,), jnp.int32),
    )
    skips = (replica // 16) * 977
    if skips.max() > 0:
        state = halton_skip_batch(state, jnp.asarray(skips, jnp.int32))
    return state


def evaluate(
    robot: str = "panda",
    sets=None,
    waves=((512, 1024, 1024), (1024, 2048, 1024), (4096, 8192, 1024)),
    quiet: bool = False,
    timed: bool = True,
):
    """With `timed`, each wave runs twice — once to compile/warm up, once for
    the measured wall time (results come from the timed run; the solver is
    deterministic so both runs are identical)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from vamp_tpu.planners.rrtc import make_rrtc_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.samplers.halton import halton_init_batch
    from vamp_tpu.utils.settings import RRTCSettings, SimplifySettings

    module = vamp.robot_module(robot)
    spec = module.spec
    dim = spec.dimension

    problems = load_problems(robot, sets)
    n_total = len(problems)

    # -- pack every problem env at a common capacity ------------------------
    caps = {"spheres": 0, "capsules": 0, "cuboids": 0}
    envs_list, starts, goals = [], [], []
    for p in problems:
        e = vamp.problem_dict_to_vamp(p)
        caps["spheres"] = max(caps["spheres"], -(-len(e.spheres) // 8) * 8)
        caps["capsules"] = max(caps["capsules"], -(-len(e.capsules) // 8) * 8)
        caps["cuboids"] = max(caps["cuboids"], -(-len(e.cuboids) // 8) * 8)
    for p in problems:
        e = vamp.problem_dict_to_vamp(p)
        envs_list.append(e.pack(capacities=caps))
        starts.append(np.asarray(p["start"], np.float32))
        goals.append(np.asarray(p["goals"][0], np.float32))
    envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    starts = np.stack(starts)
    goals = np.stack(goals)

    # -- problem validity (reference: data['valid'] filter), batched --------
    from vamp_tpu.ops.fkcc_bm import make_fkcc_planner

    fkccp = jax.jit(make_fkcc_planner(spec))
    sv = np.asarray(fkccp(jnp.asarray(starts.T)[:, None, :], envs_all, None, None))[0]
    gv = np.asarray(fkccp(jnp.asarray(goals.T)[:, None, :], envs_all, None, None))[0]
    in_limits = lambda q: np.all((q >= spec.lower) & (q <= spec.upper), axis=1)
    valid = sv & gv & in_limits(starts) & in_limits(goals)
    n_valid = int(valid.sum())

    # -- wave loop ----------------------------------------------------------
    pending = np.nonzero(valid)[0]
    solved = np.zeros(n_total, bool)
    costs = np.zeros(n_total, np.float32)
    iters = np.zeros(n_total, np.int64)
    paths = [None] * n_total
    path_caps = 256
    solve_timed = 0.0

    t0 = time.perf_counter()
    for wave, (max_iter, max_samp, L_target) in enumerate(waves):
        if len(pending) == 0:
            break
        P = len(pending)
        # racing: survivors re-batch with K independent sample streams each —
        # lanes are nearly free on TPU, sequential planner steps are not, so
        # wide-and-shallow beats narrow-and-deep for the straggler tail.
        K = max(1, min(L_target // P, 256))
        L = max(64, 1 << int(np.ceil(np.log2(P * K))))
        lane_prob = np.full(L, -1, np.int64)
        for pos, i in enumerate(pending):
            lane_prob[pos * K : (pos + 1) * K] = i
        idx = np.where(lane_prob >= 0, lane_prob, 0)
        lane_live = lane_prob >= 0
        replica = np.arange(L) % K

        settings = RRTCSettings(
            range=vamp.ROBOT_RRT_RANGES.get(robot, 2.0),
            max_iterations=max_iter,
            max_samples=max_samp,
        )
        solve = jax.jit(make_rrtc_batch(spec, settings, n_goals=1, max_path=path_caps))
        envs_w = jax.tree.map(lambda x: x[idx], envs_all)
        args = (
            jnp.asarray(starts[idx]),
            jnp.asarray(goals[idx])[:, None, :],
            jnp.asarray(lane_live)[:, None],
            envs_w,
            racing_samplers(dim, L, replica),
        )
        if timed:
            solve(*args).solved.block_until_ready()  # compile + warm
        tw = time.perf_counter()
        res = solve(*args)
        res.solved.block_until_ready()
        wave_time = time.perf_counter() - tw
        solve_timed = wave_time if wave == 0 else solve_timed + wave_time
        ok = np.asarray(res.solved) & lane_live
        res_paths = np.asarray(res.path)
        res_lens = np.asarray(res.path_length)
        res_cost = np.asarray(res.cost)
        res_iter = np.asarray(res.iterations)
        for pos, i in enumerate(pending):
            lanes = np.arange(pos * K, (pos + 1) * K)
            winners = lanes[ok[lanes]]
            if len(winners) == 0:
                continue
            j = winners[0]  # smallest replica: replica 0 = canonical stream
            solved[i] = True
            costs[i] = float(res_cost[j])
            iters[i] = int(res_iter[j])
            paths[i] = res_paths[j][: res_lens[j]]
        pending = np.array([i for i in pending if not solved[i]], np.int64)
        if not quiet:
            print(
                f"wave {wave}: budget {max_iter}, x{K} streams, solved "
                f"{P - len(pending)}/{P} in {wave_time*1e3:.0f}ms, remaining {len(pending)}"
            )
    solve_time = time.perf_counter() - t0

    # -- batched simplification on all solved paths (256-lane slices) -------
    t1 = time.perf_counter()
    sidx = np.nonzero(solved)[0]
    simp_costs = costs.copy()
    if len(sidx):
        Ls = 256
        simplify = jax.jit(
            make_simplify_batch(
                spec, SimplifySettings(), max_path=path_caps, chunk_states=16
            )
        )
        warmed = False
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
            envs_s = jax.tree.map(lambda x: x[pad], envs_all)
            if timed and not warmed:
                simplify(jnp.asarray(pbuf), jnp.asarray(plen), envs_s).cost.block_until_ready()
                warmed = True
                t1 = time.perf_counter()  # restart the clock post-compile
            sres = simplify(jnp.asarray(pbuf), jnp.asarray(plen), envs_s)
            sc = np.asarray(sres.cost)
            for j, i in enumerate(blk):
                simp_costs[i] = sc[j]
    simplify_time = time.perf_counter() - t1

    stats = {
        "robot": robot,
        "total": n_total,
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
    }
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--sets", nargs="*", default=None)
    args = ap.parse_args()
    stats = evaluate(args.robot, args.sets)
    for k, v in stats.items():
        print(f"{k}: {v}")
