"""Op-by-op ceiling analysis of the MBM throughput gap (round-5 VERDICT
item 1: if the 750 solves/s bar is missed, attribute the remaining gap to
the measured device cost model).

Decomposes suite wall time into the factors that separate this device from
the reference's 7,046 solves/s single-core bar:

  1. per-lane-step device cost at each wave's exact (L, N) shape, measured
     with the VAMP_TURBO_FIXED_STEPS profiling loop (fixed step count, warm
     executable, min over reps) — and its op attribution from
     step_profile_results.json;
  2. lane-step accounting: lane-steps executed per wave (lanes x steps) vs
     the useful lane-steps (the winning replica's steps per problem),
     yielding the multiplicative overheads of (a) done-lane idling + racing
     replicas inside a wave, (b) budget re-run across waves for survivors,
     (c) relay call floors;
  3. the resulting model ceiling: solves/s if every overhead in (2) were
     driven to 1 (perfect packing: each problem pays exactly its winning
     steps at the measured per-lane-step cost) — the number that bounds ANY
     wave schedule on this device without changing the per-step kernels.

Writes benchmarks/ceiling_analysis.json.

Usage: python benchmarks/ceiling_analysis.py
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

REFERENCE_SOLVES_PER_S = 699 / 0.0992  # BASELINE.md


def measure_step_cost(L, slots, steps=256, nn_bf16=True):
    """Per-step cost at shape (L lanes, `slots` tree capacity), measured in a
    subprocess with the FIXED_STEPS profiling loop (own process so the knob
    warning + single-stage program don't leak into this one)."""
    code = f"""
import os, sys, time
os.environ["VAMP_TURBO_FIXED_STEPS"] = "{steps}"
import warnings; warnings.filterwarnings("ignore")
sys.path.insert(0, {str(REPO)!r}); sys.path.insert(0, {str(REPO / 'benchmarks')!r})
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {str(REPO / '.jax_cache')!r})
import vamp_tpu as vamp
from evaluate_mbm import load_problems, racing_samplers
from vamp_tpu.env import max_class_counts
from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
from vamp_tpu.utils.settings import RRTCSettings

problems = load_problems("panda")
spec = vamp.robot_module("panda").spec
envs_o = [vamp.problem_dict_to_vamp(p) for p in problems[:{L}]]
caps = max_class_counts(envs_o)
envs = jax.tree.map(lambda *xs: jnp.stack(xs), *[e.pack(quantum=1, capacities=caps) for e in envs_o])
starts = jnp.asarray(np.stack([p["start"] for p in problems[:{L}]]).astype(np.float32))
goals = jnp.asarray(np.stack([p["goals"][0] for p in problems[:{L}]]).astype(np.float32))[:, None, :]
settings = RRTCSettings(range=1.0, max_iterations=10**9, max_samples={slots})
solve = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 64, line_check=False, nn_bf16={nn_bf16}))
args = (starts, goals, jnp.ones(({L}, 1), bool), envs,
        racing_samplers(spec.dimension, {L}, np.arange({L})))
np.asarray(solve(*args).iterations)  # compile + warm
best = np.inf
for _ in range(2):
    t0 = time.perf_counter()
    np.asarray(solve(*args).iterations)
    best = min(best, time.perf_counter() - t0)
print("PER_STEP_US", best / {steps} * 1e6)
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PER_STEP_US"):
            return float(line.split()[1])
    raise RuntimeError(f"step probe failed: {r.stderr[-2000:]}")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evaluate_mbm import DEFAULT_WAVES, evaluate

    # -- 1. the suite itself (same config as bench.py) ----------------------
    stats = evaluate("panda", quiet=False, timed=True, nn_bf16=True)
    solves_per_s = stats["solves_per_s"]
    waves = stats["waves"]

    # -- 2. per-step cost at each wave's shape ------------------------------
    # (L is the wave's lane count rounded as the harness rounds it)
    shapes = []
    for w, spec_w in enumerate(DEFAULT_WAVES):
        ws = [x for x in waves if x["wave"] == w]
        if not ws:
            break
        max_iter, max_samp, K_max, L_max, repeats = spec_w[:5]
        Pw = ws[0]["of"]
        K = ws[0]["K"]
        L = min(L_max, -(-(Pw * K) // 64) * 64)
        shapes.append(dict(wave=w, budget=max_iter, slots=max_samp, L=L, K=K,
                           reps=[dict(time_s=x["time_s"], solved=x["solved"],
                                      of=x["of"]) for x in ws]))
    for s in shapes:
        s["per_step_us"] = round(measure_step_cost(s["L"], s["slots"]), 1)
        s["steps_est"] = round(
            sum(r["time_s"] for r in s["reps"]) * 1e6 / s["per_step_us"] /
            max(len(s["reps"]), 1)
        )
        print(f"wave {s['wave']}: L={s['L']} slots={s['slots']} "
              f"{s['per_step_us']} us/step")

    # -- 3. lane-step accounting -------------------------------------------
    # executed lane-steps per wave = L x measured steps x reps
    executed = sum(s["L"] * s["steps_est"] * len(s["reps"]) for s in shapes)
    # useful lane-steps: each problem's winning wave charges it the wave's
    # mean steps (the winner stopped its group at its own step count; we
    # charge the full wave estimate — conservative in the solver's favor)
    useful = 0.0
    for s in shapes:
        solved_w = sum(r["solved"] for r in s["reps"])
        useful += solved_w * s["steps_est"]
    solve_timed = stats["solve_timed_s"]
    n_calls = sum(len(s["reps"]) for s in shapes)
    floor_s = 0.0271 * n_calls  # measured relay floor per device call

    # per-lane-step cost in the deepest wave (marginal lane cost)
    per_lane_step_us = {
        s["wave"]: round(s["per_step_us"] / s["L"], 3) for s in shapes
    }

    # model ceiling: every problem pays exactly its winning-wave steps at the
    # marginal per-lane-step cost of ITS wave, zero idle lanes, zero racing
    # waste, zero floors — the perfect-packing bound for these kernels
    ideal_s = 0.0
    for s in shapes:
        solved_w = sum(r["solved"] for r in s["reps"])
        ideal_s += solved_w * s["steps_est"] * (s["per_step_us"] / s["L"]) / 1e6
    ceiling_solves_per_s = stats["solved"] / ideal_s if ideal_s else None

    out = dict(
        what=(
            "Op-by-op attribution of the Panda MBM throughput gap to the "
            "measured device cost model (VERDICT round-4 item 1)."
        ),
        measured_solves_per_s=round(solves_per_s, 1),
        reference_solves_per_s=round(REFERENCE_SOLVES_PER_S, 0),
        gap_x=round(REFERENCE_SOLVES_PER_S / solves_per_s, 2),
        suite=dict(
            solved=stats["solved"],
            solve_timed_s=round(solve_timed, 3),
            n_device_calls=n_calls,
            call_floor_s=round(floor_s, 3),
            call_floor_frac=round(floor_s / solve_timed, 3),
        ),
        waves=[{k: v for k, v in s.items() if k != "reps"} for s in shapes],
        lane_step_accounting=dict(
            executed_lane_steps=int(executed),
            useful_lane_steps=int(useful),
            waste_factor=round(executed / max(useful, 1), 2),
            note=(
                "executed = sum over waves of lanes x steps x reps (every "
                "lane costs full step price whether running, done, or a "
                "losing racing replica); useful = each solved problem "
                "charged its winning wave's steps. The waste factor is the "
                "schedule's multiplicative overhead: racing replicas + "
                "done-lane idling + survivor re-runs across waves."
            ),
        ),
        per_lane_step_us=per_lane_step_us,
        model_ceiling=dict(
            perfect_packing_solves_per_s=(
                round(ceiling_solves_per_s, 0) if ceiling_solves_per_s else None
            ),
            note=(
                "Wall if every problem paid exactly its winning-wave steps "
                "at its wave's marginal per-lane-step cost, with zero idle "
                "lanes, zero racing waste, and zero relay floors. No wave "
                "schedule can beat this without changing the per-step "
                "kernels; real schedules pay the waste factor because lane "
                "counts are static inside a device call and problems' solve "
                "depths are unknown in advance."
            ),
        ),
        step_cost_attribution=(
            "See step_profile_results.json: at L=320/N=4096 the f32 step is "
            "~388us = env sweep 130 (VPU-flop-bound at the resolution-32 "
            "check contract: 64 states x 59 spheres x padded shape "
            "capacities per lane-step) + NN 69 (40 with the bf16 mirror) + "
            "tree gathers 50 + insertions 50 + self-collision 39 + halton "
            "10 + ~53 amortized call floor."
        ),
        reference_comparison=(
            "The reference solves the suite at 4.12us/iteration on one Zen4 "
            "core with branchy early-exit (sorted shape lists, lazy FK, "
            "first-hit return) that skips most of the check set; the TPU "
            "model cannot skip compute behind a mask, so every lane-step "
            "pays the full padded check set. Its advantage is breadth (1024 "
            "lanes/step at ~0.6-0.9us marginal per lane-step), which the "
            "wave schedule converts to throughput at the measured waste "
            "factor."
        ),
    )
    path = REPO / "benchmarks" / "ceiling_analysis.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in
                      ("measured_solves_per_s", "gap_x", "lane_step_accounting",
                       "model_ceiling")}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
