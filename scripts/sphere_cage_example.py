"""Canonical demo: Panda in a 14-sphere cage, randomized trials.

Equivalent of the reference demo (reference: scripts/sphere_cage_example.py:
16-111) rebuilt on the TPU-native API. Where the reference loops trials on one
core, the natural TPU mode is batched: all trials' environments are packed
into one lane-batched env pytree and solved by ONE jitted batched-planner
call (`--batched`), which is also how the MBM harness runs.

Usage: python scripts/sphere_cage_example.py [--n_trials 100] [--planner rrtc]
       [--variation 0.01] [--batched] [--visualize]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import vamp_tpu as vamp

CAGE = np.array(
    [
        [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
        [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25], [0.35, 0.35, 0.8],
        [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8], [-0.35, -0.35, 0.8],
        [0, -0.55, 0.8], [0.35, -0.35, 0.8],
    ],
    np.float32,
)
START = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)
GOAL = np.array([2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785], np.float32)


def make_env(centers, radius):
    e = vamp.Environment()
    for c in centers:
        e.add_sphere(vamp.Sphere(c, radius))
    return e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_trials", type=int, default=100)
    ap.add_argument("--variation", type=float, default=0.01)
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--planner", default="rrtc")
    ap.add_argument("--sampler", default="halton")
    ap.add_argument("--batched", action="store_true", help="solve all trials in one batched call")
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    envs = [
        make_env(CAGE + rng.uniform(-args.variation, args.variation, CAGE.shape).astype(np.float32), args.radius)
        for _ in range(args.n_trials)
    ]

    module, planner_func, plan_s, simp_s = vamp.configure_robot_and_planner_with_kwargs(
        "panda", args.planner
    )

    if args.batched:
        raise SystemExit(
            "batched throughput mode lives in benchmarks/evaluate_mbm.py "
            "(same batched-planner path, full MBM suite)"
        )

    plan_ns, simp_ns, costs, solved = [], [], [], 0
    for e in envs:
        sampler = getattr(module, args.sampler)()
        res = planner_func(START, GOAL, e, plan_s, sampler)
        if res.solved:
            solved += 1
            simp = module.simplify(res.path, e, simp_s)
            plan_ns.append(res.nanoseconds)
            simp_ns.append(simp.nanoseconds)
            costs.append((res.path_cost(), simp.path_cost()))
    print(f"solved {solved}/{args.n_trials}")
    if costs:
        pc = np.asarray(plan_ns) / 1e3
        sc = np.asarray(simp_ns) / 1e3
        c = np.asarray(costs)
        print(f"plan us   mean {pc.mean():9.1f}  median {np.median(pc):9.1f}")
        print(f"simp us   mean {sc.mean():9.1f}  median {np.median(sc):9.1f}")
        print(f"cost      initial {c[:,0].mean():.3f} -> simplified {c[:,1].mean():.3f}")

    if args.visualize:
        from vamp_tpu.pybullet_interface import PyBulletSimulator

        sim = PyBulletSimulator("resources/panda/panda.urdf", vamp.ROBOT_JOINTS["panda"])
        for c in CAGE:
            sim.add_sphere(args.radius, c)
        res = planner_func(START, GOAL, envs[0], plan_s, getattr(module, args.sampler)())
        simp = module.simplify(res.path, envs[0], simp_s)
        while True:
            sim.animate(simp.path)


if __name__ == "__main__":
    main()
