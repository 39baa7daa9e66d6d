"""Pointcloud (CAPT) MBM subset run — correctness artifact.

The reference's evaluate_mbm pointcloud mode (reference
scripts/evaluate_mbm.py:54-85) synthesizes a cloud per problem, filters it,
builds a CAPT, and plans against it. This runs the same pipeline end-to-end
through the batched turbo solver on a problem subset and records solve rate
and path validity.

KNOWN BACKEND FAULT: on the axon TPU tunnel, CAPT-in-the-solver programs
with iteration budgets beyond a few dozen kill the TPU worker process
("TPU worker process crashed or restarted ... kernel fault") — reproducibly,
at 32 lanes / 512-point clouds, while a single fkcc+CAPT call and tiny-budget
solves work. Single calls validate fine, so this artifact runs the solver on
CPU (correctness only, no device timing) and the fault is recorded here and
in ROADMAP.md for the backend owners.

    python benchmarks/pointcloud_subset.py --n 24
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--samples_per_object", type=int, default=512)
    ap.add_argument("--budget", type=int, default=1024)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import load_problems, racing_samplers
    from vamp_tpu.ops.capt import pad_capt
    from vamp_tpu.pointcloud import problem_dict_to_pointcloud
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.utils.settings import RRTCSettings

    spec = vamp.robot_module("panda").spec
    problems = load_problems("panda")
    rng = np.random.default_rng(11)
    picks = rng.choice(len(problems), size=args.n, replace=False)
    chosen = [problems[i] for i in picks]

    t_build0 = time.perf_counter()
    raw = []
    for p in chosen:
        e, _orig, filt, _ft, _bt = problem_dict_to_pointcloud(
            "panda", p, args.samples_per_object, 0.02, True
        )
        raw.append(e)
    nlog2 = max(e.pointclouds[0].nlog2 for e in raw)
    max_aff = max(e.pointclouds[0].leaf_points.shape[1] for e in raw)
    envs_list = []
    for e in raw:
        e.pointclouds = [pad_capt(e.pointclouds[0], nlog2, max_aff)]
        envs_list.append(e.pack(quantum=1))
    envs = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    build_s = time.perf_counter() - t_build0

    L = len(chosen)
    starts = np.stack([np.asarray(p["start"], np.float32) for p in chosen])
    goals = np.stack([np.asarray(p["goals"][0], np.float32) for p in chosen])
    settings = RRTCSettings(
        range=1.0, max_iterations=args.budget, max_samples=int(2.7 * args.budget)
    )
    solve = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 256))
    res = solve(
        jnp.asarray(starts), jnp.asarray(goals)[:, None, :], jnp.ones((L, 1), bool),
        envs, racing_samplers(7, L, np.zeros(L, np.int64)),
    )
    ok = np.asarray(res.solved)
    lens = np.asarray(res.path_length)

    # validate every solved path against the same CAPT envs (per-edge)
    from vamp_tpu.ops.fkcc_bm import make_fkcc_planner
    from vamp_tpu.ops.validate import RAKE

    fkcc = jax.jit(make_fkcc_planner(spec))
    all_valid = True
    for i in np.nonzero(ok)[0]:
        p = np.asarray(res.path[i][: lens[i]])
        env1 = jax.tree.map(lambda x: x[i : i + 1], envs)
        for a, b in zip(p[:-1], p[1:]):
            d = float(np.linalg.norm(b - a))
            n = max(int(np.ceil(d * spec.resolution / RAKE)), 1)
            fr = np.arange(1, RAKE * n + 1, dtype=np.float32) / (RAKE * n)
            qs = (a[None] + fr[:, None] * (b - a)[None]).T[:, :, None]
            if not bool(np.asarray(fkcc(jnp.asarray(qs), env1, None, None)).all()):
                all_valid = False

    out = {
        "platform": "cpu (see module docstring: CAPT solver programs fault the tunnel TPU worker)",
        "n_problems": int(L),
        "samples_per_object": args.samples_per_object,
        "tree_depth": int(nlog2),
        "max_affordance": int(max_aff),
        "capt_build_s": round(build_s, 2),
        "budget": args.budget,
        "solved": int(ok.sum()),
        "success_rate": round(float(ok.mean()), 4),
        "all_solved_paths_valid_vs_capt": bool(all_valid),
    }
    Path(__file__).with_name("pointcloud_results.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
