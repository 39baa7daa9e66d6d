"""PRM roadmap for a point-sphere robot flying over a heightfield maze
(equivalent of reference scripts/flying_sphere.py:1-59, with a procedurally
generated maze instead of the reference's PNG asset).

Usage: python scripts/flying_sphere.py [--iterations 2048] [--visualize]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import vamp_tpu as vamp


def make_maze(n: int = 128, seed: int = 0) -> np.ndarray:
    """Recursive-division maze as a 0/1 height image."""
    rng = np.random.default_rng(seed)
    grid = np.zeros((n, n), np.float32)
    grid[0, :] = grid[-1, :] = grid[:, 0] = grid[:, -1] = 1.0

    def divide(y0, y1, x0, x1, depth):
        if y1 - y0 < 16 or x1 - x0 < 16 or depth > 4:
            return
        wy = int(rng.integers(y0 + 6, y1 - 6))
        wx = int(rng.integers(x0 + 6, x1 - 6))
        grid[wy, x0:x1] = 1.0
        grid[y0:y1, wx] = 1.0
        # carve one gap in each of the four wall segments
        for (a, b, horiz) in ((x0, wx, True), (wx + 1, x1, True), (y0, wy, False), (wy + 1, y1, False)):
            if b - a < 3:
                continue
            g = int(rng.integers(a + 1, b - 1))
            if horiz:
                grid[wy, g - 1 : g + 2] = 0.0
            else:
                grid[g - 1 : g + 2, wx] = 0.0
        divide(y0, wy, x0, wx, depth + 1)
        divide(y0, wy, wx + 1, x1, depth + 1)
        divide(wy + 1, y1, x0, wx, depth + 1)
        divide(wy + 1, y1, wx + 1, x1, depth + 1)

    divide(1, n - 1, 1, n - 1, 0)
    return grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=float, default=20.0)
    ap.add_argument("--y", type=float, default=20.0)
    ap.add_argument("--z", type=float, default=1.0)
    ap.add_argument("--radius", type=float, default=0.1)
    ap.add_argument("--iterations", type=int, default=2048)
    ap.add_argument("--sampler", default="halton")
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    maze = make_maze(128)
    env = vamp.Environment()
    hf = vamp.HeightField(
        origin=np.array([0.0, 0.0, 0.0], np.float32),
        scale=np.array(
            [128.0 / (2 * args.x), 128.0 / (2 * args.y), args.z], np.float32
        ),
        data=maze,
    )
    env.add_heightfield(hf)

    vamp.sphere.set_lows([-args.x, -args.y, 0.0])
    vamp.sphere.set_highs([args.x, args.y, args.z * 2.0])
    vamp.sphere.set_radius(args.radius)

    start = [args.x * 0.9, args.y * 0.4, args.z * 1.6]
    goal = [-args.x * 0.9, -args.y * 0.45, args.z * 1.8]

    settings = vamp.RoadmapSettings(max_iterations=args.iterations, max_samples=args.iterations)
    sampler = getattr(vamp.sphere, args.sampler)()

    t0 = time.perf_counter()
    roadmap = vamp.sphere.roadmap(start, goal, env, settings, sampler)
    dt = time.perf_counter() - t0
    print(f"roadmap: {len(roadmap['vertices'])} vertices in {dt:.3f}s")

    res = vamp.sphere.prm(start, goal, env, settings, getattr(vamp.sphere, args.sampler)())
    print(f"prm solved: {res.solved}  cost: {res.path_cost():.2f}  iters: {res.iterations}")

    if args.visualize:
        from vamp_tpu.pybullet_interface import PyBulletSimulator

        sim = PyBulletSimulator("", [])
        sim.draw_roadmap(lambda v: v, roadmap)
        while True:
            time.sleep(1)


if __name__ == "__main__":
    main()
