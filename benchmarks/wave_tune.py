"""Round-5 wave-schedule tuning for the MBM harness.

Runs the full 700-problem Panda suite under candidate wave schedules and
prints solves/s for each (VERDICT round-4 lever (b): the 3-4 deep waves burn
~60% of wall on 17% of problems; rebalance budget x streams x repeats).

Usage: python benchmarks/wave_tune.py [name ...]   (default: all)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from evaluate_mbm import evaluate, DEFAULT_WAVES

# (iteration budget, tree slots, max racing replicas, max lanes, repeats)
SCHEDULES = {
    "baseline_r4": DEFAULT_WAVES,
    # more streams from wave 1 on, deeper lane pools (lanes are cheap next to
    # steps; done-sharing means extra streams only shorten the tail)
    "streams_up": (
        (128, 384, 1, 1024, 1),
        (384, 1024, 3, 1024, 1),
        (768, 2048, 8, 768, 1),
        (1280, 3456, 16, 320, 1),
        (1536, 4096, 32, 160, 2),
        (6144, 16384, 48, 96, 1),
    ),
    # wide-and-shallow tail: repeats at moderate budget instead of one deep
    # wave (restart distribution is heavy-tailed)
    "shallow_tail": (
        (128, 384, 1, 1024, 1),
        (384, 1024, 2, 768, 1),
        (768, 2048, 6, 512, 2),
        (1536, 4096, 32, 192, 2),
        (6144, 16384, 48, 96, 1),
    ),
    # single merged deep wave with a big stream pool (one call floor instead
    # of three)
    "merged_tail": (
        (128, 384, 1, 1024, 1),
        (384, 1024, 2, 768, 1),
        (768, 2048, 5, 512, 1),
        (1536, 4096, 32, 384, 1),
        (6144, 16384, 48, 96, 1),
    ),
    # round 5: wave 4's two repeats fused into ONE call of 2 restart
    # segments (fresh trees + stream banks inside the program — saves a
    # relay floor + host re-batch; rrtc_turbo restarts)
    "restart_tail": (
        (128, 384, 1, 1024, 1),
        (384, 1024, 2, 768, 1),
        (768, 2048, 5, 512, 1),
        (1280, 3456, 12, 256, 1),
        (1536, 4096, 24, 144, 1, 2),
        (6144, 16384, 48, 96, 1),
    ),
}


def parse_variant(name):
    """`sched[+bf16][+uN]` -> (waves, nn_bf16, unroll)."""
    parts = name.split("+")
    waves = SCHEDULES[parts[0]]
    bf16 = "bf16" in parts[1:]
    unroll = 2
    for p in parts[1:]:
        if p.startswith("u") and p[1:].isdigit():
            unroll = int(p[1:])
    return waves, bf16, unroll


def main(names):
    out = {}
    for name in names:
        waves, bf16, unroll = parse_variant(name)
        t0 = time.perf_counter()
        stats = evaluate(
            "panda", waves=waves, quiet=False, nn_bf16=bf16, unroll=unroll
        )
        out[name] = dict(
            solves_per_s=round(stats["solves_per_s"], 1),
            solved=stats["solved"],
            success=round(stats["success_rate"], 4),
            solve_timed_s=round(stats["solve_timed_s"], 3),
            mean_cost=round(stats["mean_simplified_cost"], 3),
            waves=stats["waves"],
            wall_s=round(time.perf_counter() - t0, 1),
        )
        print(f"== {name}: {out[name]['solves_per_s']} solves/s "
              f"({stats['solved']} solved, {stats['solve_timed_s']:.3f}s)")
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != 'waves'}
                      for k, v in out.items()}, indent=1))
    return out


if __name__ == "__main__":
    names = sys.argv[1:] or list(SCHEDULES)
    main(names)
