"""FCIT* anytime cost-convergence on UR5/Fetch MBM (BASELINE config).

For a sample of MBM problems per robot, runs FCIT* in anytime mode
(optimize=True) on fixed Halton streams and records the validated
cost-after-each-sampling-round trace (FCITResult.cost_trace), plus the
RRTC+simplify cost on the same problems for context. Convergence claim
checked: traces are monotone non-increasing and the final cost beats the
simplified RRTC cost on most solved problems as samples accumulate.

    python benchmarks/fcit_convergence.py --robots ur5 fetch --n 16
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_robot(robot: str, n: int, rounds: int, batch: int, chunk: int = 8):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import load_problems, racing_samplers
    from vamp_tpu.planners.fcit import make_fcit_batch
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import (
        RoadmapSettings,
        RRTCSettings,
        SimplifySettings,
    )

    spec = vamp.robot_module(robot).spec
    dim = spec.dimension
    problems = load_problems(robot)
    rng = np.random.default_rng(1)
    picks = rng.choice(len(problems), size=min(n, len(problems)), replace=False)

    from vamp_tpu.env import max_class_counts

    chosen = [problems[i] for i in picks]
    caps = max_class_counts([vamp.problem_dict_to_vamp(p) for p in chosen])
    envs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps) for p in chosen],
    )
    L = len(chosen)
    starts = jnp.asarray(np.stack([p["start"] for p in chosen]).astype(np.float32))
    goals = jnp.asarray(np.stack([p["goals"][0] for p in chosen]).astype(np.float32))

    # FCIT* anytime, lane-chunked (the k-NN mode's (L, N, K) buffers and
    # (L, R, N) distance tiles size with L — large budgets want small L per
    # program; results are per-problem so chunking is exact)
    rset = RoadmapSettings(
        max_iterations=rounds,
        max_samples=1 + 1 + rounds * batch,
        batch_size=batch,
        optimize=True,
    )
    fc = jax.jit(make_fcit_batch(spec, rset, n_goals=1, max_path=64))
    simp = jax.jit(make_simplify_batch(spec, SimplifySettings(), 256, 16))
    trace = np.zeros((L, rounds), np.float32)
    fcost = np.zeros(L, np.float32)
    fscost = np.zeros(L, np.float32)
    fsolved = np.zeros(L, bool)
    for c0 in range(0, L, chunk):
        sl = slice(c0, min(c0 + chunk, L))
        n_sl = sl.stop - sl.start
        envs_c = jax.tree.map(lambda x: x[sl], envs)
        fr = fc(starts[sl], goals[sl, None, :], jnp.ones((n_sl, 1), bool),
                envs_c, racing_samplers(dim, n_sl, np.zeros(n_sl, np.int64)))
        trace[sl] = np.asarray(fr.cost_trace)[:, :rounds]
        fcost[sl] = np.asarray(fr.cost)
        fsolved[sl] = np.asarray(fr.solved)
        # The reference harness simplifies EVERY planner's result
        # (/root/reference/scripts/evaluate_mbm.py:101-104), so the fair
        # anytime comparison is planner+simplify vs planner+simplify.
        fpath = jnp.pad(fr.path, ((0, 0), (0, 256 - fr.path.shape[1]), (0, 0)))
        fsp = simp(fpath, jnp.maximum(fr.path_length, 2), envs_c)
        fscost[sl] = np.asarray(fsp.cost)

    # RRTC + simplify context
    rs = RRTCSettings(
        range=vamp.ROBOT_RRT_RANGES.get(robot, 2.0),
        max_iterations=4096, max_samples=6144,
    )
    solve = jax.jit(make_rrtc_turbo_batch(spec, rs, 1, 256))
    rr = solve(starts, goals[:, None, :], jnp.ones((L, 1), bool), envs,
               racing_samplers(dim, L, np.zeros(L, np.int64)))
    sp = simp(rr.path, rr.path_length, envs)
    rcost = np.asarray(sp.cost)
    rsolved = np.asarray(rr.solved)

    mono = all(
        np.all(np.diff(row[np.isfinite(row)]) <= 1e-4) for row in trace
    )
    both = fsolved & rsolved
    return dict(
        robot=robot,
        n=L,
        rounds=rounds,
        batch=batch,
        max_samples=int(rset.max_samples),
        fcit_solved=int(fsolved.sum()),
        rrtc_solved=int(rsolved.sum()),
        trace_monotone=bool(mono),
        mean_fcit_final=float(fcost[fsolved].mean()) if fsolved.any() else None,
        mean_fcit_simplified=float(fscost[fsolved].mean()) if fsolved.any() else None,
        mean_rrtc_simplified=float(rcost[rsolved].mean()) if rsolved.any() else None,
        # planner+simplify vs planner+simplify (reference harness semantics)
        fcit_beats_simplified_frac=(
            float((fscost[both] <= rcost[both] + 1e-3).mean()) if both.any() else None
        ),
        fcit_raw_beats_simplified_frac=(
            float((fcost[both] <= rcost[both] + 1e-3).mean()) if both.any() else None
        ),
        traces=[[float(v) if np.isfinite(v) else None for v in row] for row in trace],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", nargs="*", default=["ur5", "fetch"])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()
    # merge with any existing artifact so single-robot reruns don't drop
    # the other robots' traces
    path = Path("benchmarks/fcit_convergence_results.json")
    out = json.loads(path.read_text()) if path.exists() else {}
    for r in args.robots:
        res = run_robot(r, args.n, args.rounds, args.batch, args.chunk)
        out[r] = res
        print(
            f"{r}: fcit {res['fcit_solved']}/{res['n']} solved, monotone="
            f"{res['trace_monotone']}, mean final {res['mean_fcit_final']} "
            f"vs rrtc+simplify {res['mean_rrtc_simplified']} "
            f"(fcit<=simplified on {res['fcit_beats_simplified_frac']})"
        )
    Path("benchmarks/fcit_convergence_results.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
