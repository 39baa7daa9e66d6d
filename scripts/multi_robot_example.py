"""Multi-robot demo: two Pandas at offset bases swap workspace sides.

Exercises all three multi-robot planners (SURVEY.md §2.9 — the capability the
reference fork designed but never implemented):
  composite    coupled 14-DoF planning, inter-robot CC fused into the kernel
  prioritized  decoupled, swept-volume obstacles
  cbs          conflict-based search over per-robot PRM roadmaps

Usage: python scripts/multi_robot_example.py [--method all] [--base_gap 1.25]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import vamp_tpu as vamp
from vamp_tpu.multi_robot import MultiRobotSystem, RobotFactory

HOME = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="all", choices=["all", "composite", "prioritized", "cbs"])
    ap.add_argument("--base_gap", type=float, default=1.25)
    args = ap.parse_args()

    system = MultiRobotSystem(
        [RobotFactory.create_panda(0.0, 0.0, 0.0), RobotFactory.create_panda(args.base_gap, 0.0, 0.0)]
    )
    goal_a = np.array([0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    goal_b = np.array([-0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    settings = vamp.RRTCSettings(range=2.0, max_iterations=100_000, max_samples=2048)

    methods = ["composite", "prioritized", "cbs"] if args.method == "all" else [args.method]
    for m in methods:
        res = system.plan(
            [HOME, HOME], [goal_a, goal_b], method=m,
            settings=settings if m != "cbs" else None, fallback=False,
        )
        ok = res.solved and all(
            not system.check_inter_robot_collisions([p[t] for p in res.paths])
            for t in range(len(res.paths[0]))
        )
        print(
            f"{m:12s} solved={res.solved} conflict_free={ok} "
            f"cost={res.cost:.3f} time={res.nanoseconds/1e6:.0f} ms"
        )


if __name__ == "__main__":
    main()
