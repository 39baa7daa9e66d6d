"""Op-by-op ceiling analysis of the MBM throughput gap (round-4 VERDICT
item 1: the 750 solves/s bar was missed — attribute the remaining gap to
the measured device cost model).

Host-side synthesis over committed, device-measured artifacts (no device
run; every input number cites its artifact):

  - per-wave wall/solve data: the round-5 winning configuration's timed
    suite run (wave_tune_results.json baseline_r4+bf16 variant; per-wave
    splits from the same run recorded below verbatim);
  - per-step op attribution: step_profile_results.json (ablation at the
    deep-wave shape) + nn_bf16_micro (bf16 NN delta);
  - relay call floor: latency_results.json.

Writes benchmarks/ceiling_analysis.json.

Usage: python benchmarks/ceiling_analysis.py
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BDIR = REPO / "benchmarks"

REFERENCE_SOLVES_PER_S = 699 / 0.0992  # BASELINE.md
MEASURED_SOLVES_PER_S = 573.5  # wave_tune_results.json baseline_r4+bf16

# Per-wave data from the baseline_r4+bf16 timed suite run (the adopted bench
# config; printed per-wave by evaluate_mbm and recorded in the round-5
# session; totals match wave_tune_results.json solve_timed_s=1.219).
# lanes L as the harness computes them: min(L_max, ceil(P*K/64)*64).
WAVES = [
    dict(wave=0, budget=128, slots=384, P=699, K=1, L=704, wall_ms=113, solved=398),
    dict(wave=1, budget=384, slots=1024, P=301, K=2, L=640, wall_ms=208, solved=182),
    dict(wave=2, budget=768, slots=2048, P=119, K=4, L=512, wall_ms=314, solved=83),
    dict(wave=3, budget=1280, slots=3456, P=36, K=7, L=256, wall_ms=279, solved=27),
    dict(wave=4, budget=1536, slots=4096, P=9, K=14, L=128, wall_ms=183, solved=7),
    dict(wave=5, budget=1536, slots=4096, P=2, K=24, L=64, wall_ms=122, solved=2),
]
STEPS_PER_ITER = 1.3  # fixed 2-slot allocation: measured steps ~ 1.3x budget
CALL_FLOOR_S = 0.0249  # latency_results.json relay_floor_us (round 5)


def main():
    solved_total = sum(w["solved"] for w in WAVES)
    solve_timed = sum(w["wall_ms"] for w in WAVES) / 1e3

    # Steps per wave: budget-bound waves run ~1.3x budget steps; the last
    # wave ended early (all problems won) — use wall-implied steps there by
    # scaling from wave 4's per-step cost at the same shape.
    for w in WAVES:
        w["steps_est"] = round(w["budget"] * STEPS_PER_ITER)
    w5, w4 = WAVES[5], WAVES[4]
    w5["steps_est"] = round(
        w5["wall_ms"] / w4["wall_ms"] * w4["steps_est"] * (w4["L"] / w5["L"]) ** 0.5
    )
    for w in WAVES:
        w["per_step_us"] = round(w["wall_ms"] * 1e3 / w["steps_est"], 1)
        w["per_lane_step_us"] = round(w["per_step_us"] / w["L"], 3)

    executed_lane_steps = sum(w["L"] * w["steps_est"] for w in WAVES)
    # useful lane-steps: each solved problem charged its winning wave's full
    # step count (conservative in the solver's favor — winners typically
    # stop their racing group earlier than the wave wall).
    useful_lane_steps = sum(w["solved"] * w["steps_est"] for w in WAVES)
    waste = executed_lane_steps / useful_lane_steps

    # perfect-packing bound: every problem pays exactly its winning wave's
    # steps at that wave's marginal per-lane-step cost, zero idle lanes,
    # zero racing waste, zero floors
    ideal_s = sum(
        w["solved"] * w["steps_est"] * w["per_lane_step_us"] / 1e6 for w in WAVES
    )
    ceiling = solved_total / ideal_s

    n_calls = len(WAVES) + 1  # 6 wave calls + 1 line-check-wave warm split
    out = dict(
        what=(
            "Op-by-op attribution of the Panda MBM throughput gap to the "
            "measured device cost model (round-4 VERDICT item 1; the >=750 "
            "bar was missed at 573.5). Host-side synthesis; every input "
            "number cites a committed device-measured artifact."
        ),
        measured_solves_per_s=MEASURED_SOLVES_PER_S,
        reference_solves_per_s=round(REFERENCE_SOLVES_PER_S),
        gap_x=round(REFERENCE_SOLVES_PER_S / MEASURED_SOLVES_PER_S, 2),
        inputs=dict(
            waves="baseline_r4+bf16 timed run (wave_tune_results.json; per-wave walls recorded here verbatim)",
            step_attribution="step_profile_results.json (ablation, L=320/N=4096)",
            nn_bf16_delta="nn_bf16_micro run: 240.1 -> 219.5 us/step at N=4096 L=320",
            call_floor="latency_results.json relay_floor_us",
        ),
        waves=WAVES,
        suite=dict(
            solved=solved_total,
            solve_timed_s=round(solve_timed, 3),
            n_device_calls=n_calls,
            call_floor_s=round(CALL_FLOOR_S * n_calls, 3),
            call_floor_frac=round(CALL_FLOOR_S * n_calls / solve_timed, 3),
        ),
        step_cost_attribution=dict(
            note=(
                "At the deep-wave shape (L=320, N=4096; step_profile_results"
                ".json ablation, f32): step ~388 us = env sweep 130 + NN 69 "
                "(~48 with the bf16 mirror per nn_bf16_micro's -20.6) + tree "
                "gathers 50 + insertions 50 + self-collision 39 + halton 10 "
                "+ ~53 amortized call floor + residual. The env sweep is "
                "VPU-flop-bound at the resolution-32 check contract: every "
                "step validates (1+K)*T_edge = 64 states x 59 spheres x the "
                "wave's padded shape capacities per lane — the padding "
                "itself costs ~1.9x the mean problem's live shapes (suite "
                "shape stats: capsules mean 3.7/max 10, cuboids mean 8/max "
                "11; lanes are rectangular, masking cannot skip compute)."
            ),
            env_sweep_us=130,
            nn_bf16_us=48,
            tree_gathers_us=50,
            insertions_us=50,
            self_collision_us=39,
            halton_us=10,
        ),
        lane_step_accounting=dict(
            executed_lane_steps=int(executed_lane_steps),
            useful_lane_steps=int(useful_lane_steps),
            waste_factor=round(waste, 2),
            note=(
                "executed = sum over waves of L x steps (every lane costs "
                "full step price whether running, done, or a losing racing "
                "replica; a wave runs its full budget whenever any of its "
                "problems is unsolved); useful = each solved problem charged "
                "its winning wave's steps. The waste factor is the "
                "schedule's multiplicative overhead from racing replicas + "
                "done-lane idling + survivor re-runs. The round-5 schedule "
                "search (wave_tune_results.json) measured every attempted "
                "rebalancing of this waste (more streams, shallower or "
                "merged tails, fused restarts) SLOWER — the shipped "
                "schedule is a local optimum of this tradeoff."
            ),
        ),
        model_ceiling=dict(
            perfect_packing_solves_per_s=round(ceiling),
            note=(
                "Wall if every problem paid exactly its winning-wave steps "
                "at its wave's marginal per-lane-step cost, with zero idle "
                "lanes, zero racing waste, and zero relay floors. This "
                "bounds ANY wave schedule built on the current per-step "
                "kernels; it is not reachable because lane counts are "
                "static inside a device call and problems' solve depths are "
                "unknown in advance. Passing it requires cheaper steps, "
                "not better scheduling: the named candidates are a Pallas "
                "fused step kernel (collapse the ~3 serialized phase "
                "latencies per step; blocked today — Pallas executes but "
                "is no faster than XLA on this relay, README cost-model "
                "notes) and hardware where XLA fuses elementwise chains "
                "(the env sweep's padded-capacity waste halves)."
            ),
        ),
        reference_comparison=(
            "The reference solves the suite at ~4 us/iteration equivalent "
            "on one Zen4 core with branchy early-exit (sorted shape lists, "
            "lazy FK, first-hit return) that skips most of the check set; "
            "the TPU model cannot skip compute behind a mask, so every "
            "lane-step pays the full padded check set. Its advantage is "
            "breadth (hundreds of lanes per step at ~0.6-1.4 us marginal "
            "per lane-step), which the wave schedule converts to "
            "throughput at the measured waste factor."
        ),
    )
    path = BDIR / "ceiling_analysis.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in (
        "measured_solves_per_s", "gap_x", "lane_step_accounting", "model_ceiling"
    )}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
