"""Visualize one MBM problem + its solution in PyBullet — the equivalent of
the reference's scripts/visualize_mbm.py (reference file of the same name):
pick a problem by set/index, build its environment (primitives or
pointcloud+CAPT), plan with any planner, simplify, print the reference's
stats block, and animate the interpolated path; for invalid problems, show
the colliding spheres of the first invalid state.

Requires pybullet (not installed in CI images — everything up to the
visualization runs headless, so --no-display also works as a solver smoke
run):

    python scripts/visualize_mbm.py --robot panda --problem bookshelf_small \\
        --index 1 --planner rrtc [--pointcloud] [--no-display]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import vamp_tpu as vamp
from benchmarks.evaluate_mbm import DATA_DIR


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    ap.add_argument("--planner", default="rrtc", choices=["rrtc", "prm", "fcit", "aorrtc"])
    ap.add_argument("--problem", default="")
    ap.add_argument("--index", type=int, default=1)
    ap.add_argument("--sampler", default="halton")
    ap.add_argument("--skip_rng_iterations", type=int, default=0)
    ap.add_argument("--pointcloud", action="store_true")
    ap.add_argument("--samples_per_object", type=int, default=2048)
    ap.add_argument("--filter_radius", type=float, default=0.02)
    ap.add_argument("--display_object_names", action="store_true")
    ap.add_argument("--no-display", dest="display", action="store_false")
    args = ap.parse_args()

    import gzip
    import pickle

    with gzip.open(DATA_DIR / f"{args.robot}_problems.pkl.gz") as f:
        data = pickle.load(f)

    problem = args.problem or list(data["problems"].keys())[0]
    if problem not in data["problems"]:
        raise RuntimeError(
            f"No problem set named {problem}! Sets: {list(data['problems'])}"
        )
    try:
        problem_data = next(
            p for p in data["problems"][problem] if p.get("index", None) == args.index
        )
    except StopIteration:
        problem_data = data["problems"][problem][args.index]

    module, planner_func, plan_settings, simp_settings = (
        vamp.configure_robot_and_planner_with_kwargs(args.robot, args.planner)
    )

    filtered_pc = None
    if args.pointcloud:
        from vamp_tpu.pointcloud import problem_dict_to_pointcloud

        env, original_pc, filtered_pc, filter_time, build_time = (
            problem_dict_to_pointcloud(
                args.robot, problem_data, args.samples_per_object,
                args.filter_radius, True,
            )
        )
        print(
            f"Original pointcloud: {len(original_pc)}  filtered: "
            f"{len(filtered_pc)}  filter {filter_time*1e-6:.3f}ms  "
            f"CAPT build {build_time*1e-6:.3f}ms"
        )
    else:
        env = vamp.problem_dict_to_vamp(problem_data)

    start = np.asarray(problem_data["start"], np.float32)
    goals = np.asarray(problem_data["goals"], np.float32)
    valid = problem_data.get("valid", True)

    sampler = getattr(module, args.sampler)()
    sampler.skip(args.skip_rng_iterations)

    plan = None
    if valid:
        result = planner_func(start, goals, env, plan_settings, sampler)
        if result.solved:
            simp = module.simplify(result.path, env, simp_settings, sampler)
            stats = vamp.results_to_dict(result, simp)
            print(
                f"Planning: {int(result.nanoseconds/1000):8d}us  iters "
                f"{result.iterations}  cost {stats['initial_path_cost']:.3f} "
                f"-> {stats['simplified_path_cost']:.3f}"
            )
            plan = simp
            plan.interpolate_to_resolution(module.spec.resolution)
        else:
            print("Failed to solve! Displaying start and goals.")
    else:
        print("Problem marked invalid in the dataset.")

    if plan is None:
        plan = vamp.PlanningResult(
            path=np.vstack([start[None], goals]), cost=0.0, nanoseconds=0,
            iterations=0, size=[0, 0],
        )

    if not args.display:
        return

    from vamp_tpu import pybullet_interface as vpb
    from vamp_tpu.robots.descriptions import ROBOT_JOINTS

    # same convention as sphere_cage_example.py: URDFs live under resources/
    sim = vpb.PyBulletSimulator(
        f"resources/{args.robot}/{args.robot}.urdf", ROBOT_JOINTS[args.robot], True
    )
    sim.add_environment_from_problem_dict(
        problem_data, args.display_object_names
    )
    if filtered_pc is not None:
        sim.draw_pointcloud(filtered_pc)

    if not valid:
        for state in [start, *goals]:
            if not module.validate(state, env):
                print(f"Colliding spheres for first invalid state: {state}")
                validity = module.sphere_validate(state, env)
                spheres = module.fk(state)
                for si, names in enumerate(validity):
                    if names:
                        s = spheres[si]
                        sim.add_sphere(
                            s.radius, np.asarray(s.center), color=[1.0, 0.0, 0.0, 1.0]
                        )
                break

    sim.animate(plan.path)


if __name__ == "__main__":
    main()
