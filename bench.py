"""Benchmark driver: batched RRT-Connect solves/s on one TPU chip.

Workload: the Panda sphere-cage demo (reference scripts/sphere_cage_example.py
benchmark loop) — B independent problems with jittered obstacle positions and
distinct Halton streams, solved by the vmapped jitted planner in one device
program.

Baseline: the reference C++ planner compiled -O2 -march=native on THIS host's
CPU solves the identical problem at BASELINE_SOLVES_PER_S single-core
(measured by tools/golden/golden_rrtc.cc's bench section; see
tests/golden/reference_rrtc.json "bench"). vs_baseline = ours / reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

# Reference single-core solves/s on this host (tests/golden/reference_rrtc.json
# "bench": 200 trials, mean 1475 us/solve).
BASELINE_SOLVES_PER_S = 677.8

CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25], [0.35, 0.35, 0.8],
    [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8], [-0.35, -0.35, 0.8],
    [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]

START = [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]
GOAL = [2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785]


def main(batch: int = 512, reps: int = 4, variation: float = 0.01):
    import jax
    import jax.numpy as jnp

    from vamp_tpu.env import Environment, Sphere
    from vamp_tpu.planners.rrtc import make_rrtc_batch
    from vamp_tpu.robots.descriptions import load_robot
    from vamp_tpu.samplers.halton import halton_init_batch, halton_skip_batch
    from vamp_tpu.utils.settings import RRTCSettings

    rng = np.random.RandomState(0)
    spec = load_robot("panda")

    # B jittered cage environments (mirrors sphere_cage_example.py benchmark)
    envs = []
    for _ in range(batch):
        e = Environment()
        for c in CAGE:
            jitter = rng.uniform(-variation, variation, 3)
            e.add_sphere(Sphere(np.asarray(c) + jitter, 0.2))
        envs.append(e.pack())
    envs = jax.tree.map(lambda *xs: jnp.stack(xs), *envs)

    settings = RRTCSettings(range=1.0, max_iterations=3000, max_samples=4096)
    solve_batch = jax.jit(make_rrtc_batch(spec, settings, n_goals=1, max_path=256))

    starts = jnp.broadcast_to(jnp.asarray(START, jnp.float32), (batch, 7))
    goals = jnp.broadcast_to(jnp.asarray(GOAL, jnp.float32), (batch, 1, 7))
    masks = jnp.ones((batch, 1), bool)

    skip_fn = jax.jit(halton_skip_batch)

    def samplers_for(rep):
        return skip_fn(
            halton_init_batch(7, batch),
            (jnp.arange(batch, dtype=jnp.int32) * 131 + rep * 7919) % 100_000,
        )

    # warmup / compile
    res = solve_batch(starts, goals, masks, envs, samplers_for(0))
    res.solved.block_until_ready()

    t0 = time.perf_counter()
    solved = 0
    for rep in range(reps):
        res = solve_batch(starts, goals, masks, envs, samplers_for(rep))
        res.solved.block_until_ready()
        solved += int(np.asarray(res.solved).sum())
    dt = time.perf_counter() - t0

    total = batch * reps
    solves_per_s = total / dt
    success = solved / total
    out = {
        "metric": "sphere_cage_panda_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": f"solves/s/chip (success={success:.3f}, batch={batch})",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    kwargs = {}
    for arg in sys.argv[1:]:
        k, _, v = arg.partition("=")
        kwargs[k.lstrip("-")] = int(v) if v.isdigit() else float(v)
    main(**kwargs)
