"""Multi-device scaling measurement (SURVEY §5.8, BASELINE ≥80% linearity).

Weak scaling of the sharded turbo solver over a (dp,) device mesh: every
device carries the same per-device problem batch (sphere-cage problems with
per-lane jittered starts and independent Halton streams), so ideal scaling
keeps wall time flat as devices double — solves/s grows linearly. The metric
reported per n_devices is solves/s and parallel efficiency vs 1 device.

Without multi-chip hardware, run on the virtual CPU mesh (the standard JAX
substitute — same program, same collectives, same shardings):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py

Virtual devices share one CPU's cores, so *time* cannot scale there — the
artifact checks shard-result correctness and records per-device throughput;
on real multi-chip hardware the identical program yields the true curve
(problems are independent: the only collective is the final best-cost
all-gather of L floats).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main(per_device: int = 8, budget: int = 1500):
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon
    import jax.numpy as jnp

    import vamp_tpu as vamp
    from vamp_tpu.parallel.mesh import make_mesh, make_sharded_batch_solver
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.robots.descriptions import load_robot
    from vamp_tpu.samplers.halton import halton_state_at
    from vamp_tpu.utils.settings import RRTCSettings

    cage = [
        [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
        [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
        [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
        [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
    ]
    e = vamp.Environment()
    for c in cage:
        e.add_sphere(vamp.Sphere(c, 0.2))
    env = e.pack()
    spec = load_robot("panda")

    start = np.asarray([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)
    goal = np.asarray([2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785], np.float32)

    settings = RRTCSettings(range=1.0, max_iterations=budget, max_samples=2 * budget)
    solve = make_rrtc_turbo_batch(spec, settings, n_goals=1, max_path=128)

    n_avail = len(jax.devices())
    results = {}
    for ndev in [n for n in (1, 2, 4, 8) if n <= n_avail]:
        mesh = make_mesh(ndev, sp=1)
        L = per_device * ndev
        rng = np.random.default_rng(0)
        starts = jnp.asarray(
            start[None] + 0.02 * rng.standard_normal((L, 7)).astype(np.float32)
        )
        goals = jnp.asarray(np.broadcast_to(goal, (L, 7)).copy())[:, None, :]
        masks = jnp.ones((L, 1), bool)
        envs = jax.tree.map(lambda x: jnp.broadcast_to(x, (L,) + x.shape), env)
        samplers = halton_state_at(np.arange(L) * 49999, 7)
        args = (starts, goals, masks, envs, samplers)
        from jax.sharding import PartitionSpec as P

        env_spec = jax.tree.map(lambda _: P("dp"), envs)  # lane axis leading
        sharded = jax.jit(
            make_sharded_batch_solver(
                solve, mesh, example_args=args, axes=("dp",),
                arg_specs=(None, None, None, env_spec, None),
            )
        )
        res, best = sharded(*args)
        n_solved = int(np.asarray(res.solved).sum())  # warm + correctness
        t0 = time.perf_counter()
        res, best = sharded(*args)
        n_solved = int(np.asarray(res.solved).sum())
        dt = time.perf_counter() - t0

        # -- contention control: the SAME total work as ndev independent
        # per-device dispatches (no shard_map, no collectives). On a shared
        # socket this isolates pure CPU contention; sharded/control - 1 is
        # the actual sharding-machinery overhead.
        solve_j = jax.jit(solve)
        devs = jax.devices()[:ndev]
        per = per_device
        shard_args = []
        for d in range(ndev):
            sl = slice(d * per, (d + 1) * per)
            a = (starts[sl], goals[sl], masks[sl],
                 jax.tree.map(lambda x: x[sl], envs),
                 jax.tree.map(lambda x: x[..., sl] if x.ndim and x.shape[-1] == L else x[sl],
                              samplers))
            shard_args.append(jax.tree.map(lambda x: jax.device_put(x, devs[d]), a))
        outs = [solve_j(*a) for a in shard_args]  # warm per device
        _ = [np.asarray(o.solved) for o in outs]
        t1 = time.perf_counter()
        outs = [solve_j(*a) for a in shard_args]  # async dispatch to all devices
        ctrl_solved = int(sum(np.asarray(o.solved).sum() for o in outs))
        ctrl_dt = time.perf_counter() - t1

        results[ndev] = dict(
            L=L, solved=n_solved, wall_s=dt, solves_per_s=n_solved / dt,
            best_cost=float(np.asarray(best)[0]),
            control_wall_s=ctrl_dt, control_solved=ctrl_solved,
            sharding_overhead=round(dt / ctrl_dt - 1.0, 4),
        )
        print(
            f"n_devices={ndev}: L={L} solved {n_solved}/{L} in {dt*1e3:.0f}ms "
            f"-> {n_solved/dt:.1f} solves/s; contention control {ctrl_dt*1e3:.0f}ms "
            f"-> sharding overhead {dt/ctrl_dt-1.0:+.1%}",
            flush=True,
        )

    base = results[min(results)]["solves_per_s"]
    for ndev, r in results.items():
        r["efficiency_vs_1dev"] = r["solves_per_s"] / (base * ndev / min(results))
    out = {
        "platform": jax.devices()[0].platform,
        "note": "virtual CPU devices share one socket; the control rows "
                "(independent per-device dispatches, no collectives) isolate "
                "sharding-machinery overhead (~zero) from compute contention "
                "(all of the efficiency decay); see README/ROADMAP",
        "weak_scaling": results,
    }
    Path("benchmarks/scaling_results.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: round(v["efficiency_vs_1dev"], 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
