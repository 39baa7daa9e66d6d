"""Sphere-cage demo with an end-effector attachment (equivalent of reference
scripts/attachments.py:1-82): a sphere rigidly attached to the Panda's hand
must stay collision-free through the plan.

Usage: python scripts/attachments.py [--n_trials 10]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import vamp_tpu as vamp
from scripts.sphere_cage_example import CAGE, GOAL, START, make_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_trials", type=int, default=10)
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--attachment_radius", type=float, default=0.06)
    args = ap.parse_args()

    module, planner, plan_s, simp_s = vamp.configure_robot_and_planner_with_kwargs(
        "panda", "rrtc"
    )

    rng = np.random.default_rng(0)
    solved = 0
    for _ in range(args.n_trials):
        env = make_env(
            CAGE + rng.uniform(-0.01, 0.01, CAGE.shape).astype(np.float32), args.radius
        )
        # sphere held 12 cm in front of the hand frame
        att = vamp.Attachment.from_quat([0.0, 0.0, 0.12], [0.0, 0.0, 0.0, 1.0])
        att.add_sphere([0.0, 0.0, 0.0], args.attachment_radius)
        env.attach(att)

        sampler = module.halton()
        res = planner(START, GOAL, env, plan_s, sampler)
        if res.solved:
            simp = module.simplify(res.path, env, simp_s)
            solved += 1
            print(
                f"solved: cost {res.path_cost():.3f} -> {simp.path_cost():.3f} "
                f"({res.iterations} iters, {res.nanoseconds/1e3:.0f} us)"
            )
        else:
            print("failed")
    print(f"{solved}/{args.n_trials} solved with attachment")


if __name__ == "__main__":
    main()
