"""Per-problem solve latency (BASELINE north-star metric).

The reference's headline number is 35 us *median single-problem latency* on
one CPU core (reference scripts/README.md:17). This benchmark reports the
interactive-latency story honestly, with the measured floor of the execution
environment alongside:

  - relay floor: wall time of a warm jitted `x+1` round trip — the cost of
    ANY device call through the TPU tunnel (measured ~27 ms here). No
    planner result can return to the host faster than this; it bounds the
    achievable single-query latency regardless of planner speed.
  - L=1 latency: each problem solved alone (budget 512, canonical stream).
  - L=8 racing latency: one problem per call, 8 decorrelated streams in the
    call's lanes with group-done sharing — the single-query mode a latency-
    sensitive user should use (first winner ends the solve; lanes are nearly
    free next to fixed per-step cost).
  - amortized latency: suite wall / solves from the throughput harness
    (what a batch user pays per problem).

Writes benchmarks/latency_results.json.

Usage: python benchmarks/latency.py [--n 32]
"""

import argparse
import json
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
    from vamp_tpu.planners.rrtc_turbo import (
        make_rrtc_simplify_batch,
        make_rrtc_turbo_batch,
    )
    from vamp_tpu.utils.settings import RRTCSettings

    spec = vamp.robot_module(args.robot).spec
    problems = load_problems(args.robot)
    rng = np.random.default_rng(0)
    picks = rng.choice(len(problems), size=args.n, replace=False)

    # -- relay floor: warm x+1 round trip ----------------------------------
    # The tunnel has high-variance periods (measured floors 25-65 ms within
    # one session); the floor is re-measured around every mode and each
    # mode's local floor is recorded so numbers are interpretable, and a
    # mode whose floor is badly degraded is re-run once.
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(jnp.zeros((8,))))

    def measure_floor():
        floors = []
        for k in range(5):
            xk = jnp.full((8,), float(k))
            np.asarray(xk[:1])
            t0 = time.perf_counter()
            np.asarray(bump(xk))
            floors.append(time.perf_counter() - t0)
        return float(np.median(floors) * 1e6)

    floor_us = measure_floor()

    settings = RRTCSettings(range=1.0, max_iterations=512, max_samples=1408)
    from vamp_tpu.env import max_class_counts

    caps = max_class_counts(
        [vamp.problem_dict_to_vamp(problems[pi]) for pi in picks]
    )

    def run_mode(L, fused, lite=False):
        """fused=True: ONE program runs solve AND simplification (the
        round-4 latency mode — a single relay round trip returns a usable
        simplified path; reference 'total' semantics, scripts/README.md:13).
        lite=True swaps in the shortcut-DP simplify (round 5: the full
        pipeline's serialized cursor phases tripled fused latency).
        fused=False: solve only (continuity with earlier rounds)."""
        if fused:
            fn = jax.jit(
                make_rrtc_simplify_batch(spec, settings, None, 1, 256, lite=lite)
            )
        else:
            fn = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 256))
        lat, solved, warm = [], 0, False
        for pi in picks:
            p = problems[pi]
            # one problem per call: share ONE unbatched env across lanes
            # (scalar shape params — cheaper than per-lane slicing)
            env = vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps)
            start = jnp.broadcast_to(
                jnp.asarray(np.asarray(p["start"], np.float32))[None], (L, spec.dimension)
            )
            goal = jnp.broadcast_to(
                jnp.asarray(np.asarray(p["goals"][0], np.float32))[None, None],
                (L, 1, spec.dimension),
            )
            sam = racing_samplers(spec.dimension, L, np.arange(L))
            gid = jnp.zeros((L,), jnp.int32)
            if fused:
                a = (start, goal, jnp.ones((L, 1), bool), env, sam, gid)
            else:
                a = (start, goal, jnp.ones((L, 1), bool), env, sam, None, None, gid)
            if not warm:
                out = fn(*a)
                np.asarray((out[0] if fused else out).solved)
                warm = True
            t0 = time.perf_counter()
            out = fn(*a)
            r = out[0] if fused else out
            ok = bool(np.asarray(r.solved).any())
            if fused:  # simplified cost must also be on host for "usable"
                np.asarray(out[1].cost)
            lat.append(time.perf_counter() - t0)
            solved += ok
        lat = np.asarray(lat) * 1e6
        return lat, solved

    out = {"relay_floor_us": round(floor_us, 1), "reference_median_us": 35.0,
           "reference_total_median_us": 99.0}
    for L, fused, lite in (
        (1, False, False),
        (8, False, False),
        (32, False, False),
        (8, True, False),
        (8, True, True),
        (32, True, True),
    ):
        local_floor = measure_floor()
        lat, solved = run_mode(L, fused, lite)
        post_floor = measure_floor()
        if max(local_floor, post_floor) > 1.6 * floor_us:
            # degraded tunnel period: wait and re-run this mode once
            print(f"  (degraded relay: floors {local_floor/1e3:.1f}/"
                  f"{post_floor/1e3:.1f} ms vs {floor_us/1e3:.1f}; retrying)")
            time.sleep(60)
            local_floor = measure_floor()
            lat, solved = run_mode(L, fused, lite)
            post_floor = measure_floor()
        key = f"L{L}_fused_lite" if lite else (f"L{L}_fused" if fused else f"L{L}")
        out[key] = {
            "median_us": round(float(np.median(lat)), 1),
            "mean_us": round(float(lat.mean()), 1),
            "p95_us": round(float(np.percentile(lat, 95)), 1),
            "solved": int(solved),
            "n": int(args.n),
            "includes_simplify": bool(fused),
            "local_floor_us": round(min(local_floor, post_floor), 1),
            **({"simplify_pipeline": "shortcut_dp_lite"} if lite else {}),
        }
        print(
            f"{key}{' (plan+simplify)' if fused else ''} latency over "
            f"{args.n} MBM problems (budget 512): "
            f"median {np.median(lat)/1e3:.1f} ms, mean {lat.mean()/1e3:.1f} ms, "
            f"p95 {np.percentile(lat, 95)/1e3:.1f} ms, solved {solved}/{args.n}"
        )
    out["analysis"] = (
        "The relay call floor alone is ~{:.1f} ms: every jitted call through "
        "the axon tunnel pays it, so the 35 us-class reference latency is not "
        "reachable from the host in this environment for ANY device program; "
        "the planner's own contribution is (median - floor). Racing 8 "
        "decorrelated streams inside one call (group-done sharing) cuts the "
        "steps-to-first-win and is the recommended single-query mode.".format(
            floor_us / 1e3
        )
    )
    path = Path(__file__).resolve().parent / "latency_results.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"relay floor: {floor_us/1e3:.1f} ms; wrote {path}")


if __name__ == "__main__":
    main()
