"""Per-problem solve latency (BASELINE north-star metric).

The reference's headline number is 35 us *median single-problem latency* on
one CPU core (reference scripts/README.md:17). A TPU pays O(10 us) per kernel
dispatch and runs the planner as one jitted while_loop, so single-problem
(L=1) latency is dominated by fixed per-step cost — this benchmark reports it
honestly rather than hiding it behind batching:

  - L=1 latency: solve each sampled problem alone (the true interactive
    latency a single-query user sees), median/mean over the sample;
  - amortized latency: suite wall time / problems solved from the batched
    throughput harness (the number a batch user effectively pays
    per problem).

Usage: python benchmarks/latency.py [--n 32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--robot", default="panda")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import load_problems, racing_samplers
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.utils.settings import RRTCSettings

    spec = vamp.robot_module(args.robot).spec
    problems = load_problems(args.robot)
    rng = np.random.default_rng(0)
    picks = rng.choice(len(problems), size=args.n, replace=False)

    settings = RRTCSettings(range=1.0, max_iterations=512, max_samples=768)
    solve = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 256))

    caps = {"spheres": 0, "capsules": 10, "cuboids": 11}
    lat, solved = [], 0
    warm = False
    for pi in picks:
        p = problems[pi]
        env = vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps)
        start = jnp.asarray(np.asarray(p["start"], np.float32))[None]
        goal = jnp.asarray(np.asarray(p["goals"][0], np.float32))[None, None]
        sam = racing_samplers(spec.dimension, 1, np.zeros(1, np.int64))
        a = (start, goal, jnp.ones((1, 1), bool), env, sam)
        if not warm:
            np.asarray(solve(*a).solved)
            warm = True
        t0 = time.perf_counter()
        r = solve(*a)
        ok = bool(np.asarray(r.solved)[0])
        lat.append(time.perf_counter() - t0)
        solved += ok
    lat = np.asarray(lat) * 1e6
    print(
        f"L=1 latency over {args.n} MBM problems (budget 512): "
        f"median {np.median(lat):.0f} us, mean {lat.mean():.0f} us, "
        f"p95 {np.percentile(lat, 95):.0f} us, solved {solved}/{args.n}"
    )
    print("reference single-core median: 35 us (scripts/README.md:17)")


if __name__ == "__main__":
    main()
