"""Per-step cost attribution for the turbo solver.

Runs the batched RRT-Connect step loop for a FIXED number of steps (via
VAMP_TURBO_FIXED_STEPS) across lane counts / slot counts, optionally stubbing
out body pieces (VAMP_TURBO_DISABLE=nn,gather,val,ins,radii,halton) to
attribute step cost. Honest timing per the axon rules: np.asarray sync, and
the loop itself is one jit call (no per-step dispatch).

Usage:  python benchmarks/step_profile.py --steps 256 --lanes 64 128 704
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(steps: int, lanes, slots: int, disable: str, reps: int = 1):
    os.environ["VAMP_TURBO_FIXED_STEPS"] = str(steps)
    if disable:
        os.environ["VAMP_TURBO_DISABLE"] = disable
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import load_problems, racing_samplers
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.utils.settings import RRTCSettings

    module = vamp.robot_module("panda")
    spec = module.spec
    problems = load_problems("panda")
    from vamp_tpu.env import max_class_counts

    caps = max_class_counts([vamp.problem_dict_to_vamp(p) for p in problems])
    envs_list = [
        vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps)
        for p in problems
    ]
    envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    starts = np.stack([np.asarray(p["start"], np.float32) for p in problems])
    goals = np.stack([np.asarray(p["goals"][0], np.float32) for p in problems])

    settings = RRTCSettings(range=1.0, max_iterations=10**9, max_samples=slots)
    results = []
    for L in lanes:
        solve = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 64))
        idx = np.arange(L) % len(problems)
        args = (
            jnp.asarray(starts[idx]),
            jnp.asarray(goals[idx])[:, None, :],
            jnp.ones((L, 1), bool),
            jax.tree.map(lambda x: x[idx], envs_all),
            racing_samplers(spec.dimension, L, np.arange(L)),
        )
        np.asarray(solve(*args).iterations)  # compile+warm
        # timed calls take DIFFERENT sampler data per rep (same shapes):
        # identical args can be served from the relay's backend cache and
        # measure dispatch only (memory: axon-tpu-measurement-pitfalls).
        # min over reps suppresses relay timing noise (observed ~+-30us/step).
        dt = np.inf
        for rep in range(reps):
            args2 = args[:4] + (
                racing_samplers(spec.dimension, L, np.arange(L) + 7 + 13 * rep),
            )
            t0 = time.perf_counter()
            np.asarray(solve(*args2).iterations)
            dt = min(dt, time.perf_counter() - t0)
        per_step = dt / steps * 1e6
        results.append((L, slots, steps, dt, per_step))
        print(
            f"L={L:5d} slots={slots:5d} steps={steps:5d} "
            f"wall={dt*1e3:8.1f}ms  per_step={per_step:8.1f}us  "
            f"disable='{disable}'"
        )
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--lanes", type=int, nargs="*", default=[64, 128, 256, 704])
    ap.add_argument("--slots", type=int, default=2048)
    ap.add_argument("--disable", default="")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--json", default="", help="append one JSON line per row")
    args = ap.parse_args()
    rows = run(args.steps, args.lanes, args.slots, args.disable, args.reps)
    if args.json:
        import json

        with open(args.json, "a") as f:
            for (L, slots, steps, dt, per_step) in rows:
                f.write(json.dumps(dict(
                    L=L, slots=slots, steps=steps, wall_s=round(dt, 4),
                    per_step_us=round(per_step, 1), disable=args.disable,
                    fkcc_disable=os.environ.get("VAMP_FKCC_DISABLE", ""),
                )) + "\n")
