"""Standalone cost attribution of the hierarchical checker vs dense, on the
edge-validation workload shape (dim, 64, L). Chained-input fori_loop, host
sync — cache-safe per the axon rules."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

import vamp_tpu as vamp
from benchmarks.evaluate_mbm import load_problems
from vamp_tpu.ops.fkcc_bm import _env_hits_bm, make_fkcc_planner, make_sphere_fk_bm
from vamp_tpu.ops import fkcc_hier as H

STEPS = 64
L = 704
T = 64


def bench(name, fn, q0):
    @jax.jit
    def run(q):
        def step(i, q):
            out = fn(q)  # (T, L) or (B, L) bool
            d = jnp.sum(out.astype(jnp.float32), axis=0) * 1e-5
            return q * 0.999 + d[None, None, :] * 0.01 + 1e-4

        return lax.fori_loop(0, STEPS, step, q)

    np.asarray(run(q0))
    t0 = time.perf_counter()
    np.asarray(run(q0))
    dt = (time.perf_counter() - t0) / STEPS * 1e6
    print(f"{name:40s} {dt:9.1f} us/call")


def main():
    module = vamp.robot_module("panda")
    spec = module.spec
    problems = load_problems("panda")
    from vamp_tpu.env import max_class_counts

    caps = max_class_counts([vamp.problem_dict_to_vamp(p) for p in problems])
    envs_list = [
        vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps)
        for p in problems
    ]
    env = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    idx = jnp.asarray(np.arange(L) % len(envs_list))
    env = jax.tree.map(lambda x: x[idx], env)

    rng = np.random.RandomState(0)
    home = np.array([0, -0.785, 0, -2.356, 0, 1.571, 0.785], np.float32)
    q0 = jnp.asarray(
        home[:, None, None]
        + rng.uniform(-0.8, 0.8, (spec.dimension, T, L)).astype(np.float32)
    )

    dense = make_fkcc_planner(spec)
    bench("dense fkcc (T,L)", lambda q: dense(q, env, None, None), q0)

    hier = H.make_fkcc_hier_blocks(spec, 2, T // 2)
    bench("hier blocks full", lambda q: hier(q, env, None, None), q0)

    # coarse pass only
    frames, centers, radii_c, cover = H.build_coarse_model(spec)
    C = len(radii_c)
    import dataclasses

    cspec = dataclasses.replace(
        spec,
        sphere_frame=frames,
        sphere_center=centers,
        sphere_radius=radii_c,
        sphere_link_names=tuple(f"c{int(f)}" for f in frames),
        self_pairs=np.zeros((0, 2), np.int32),
        self_pairs_attach=None,
    )
    fk_coarse = make_sphere_fk_bm(cspec)

    def coarse_only(q):
        xs, ys, zs = fk_coarse(q, None, None)
        rcol = jnp.asarray(radii_c).reshape((C, 1, 1))
        return _env_hits_bm(xs, ys, zs, rcol, env, batched_env=True)

    bench("coarse pass only", coarse_only, q0)

    # coarse + argsort compactions (no fine) — isolates the sort cost
    t_iota = jnp.arange(T, dtype=jnp.int32)[:, None]

    def coarse_sorts(q):
        xs, ys, zs = fk_coarse(q, None, None)
        rcol = jnp.asarray(radii_c).reshape((C, 1, 1))
        hit = _env_hits_bm(xs, ys, zs, rcol, env, batched_env=True)
        out = jnp.zeros((T, L), jnp.int32)
        for _ in range(4):
            key = jnp.where(hit, t_iota, T + t_iota)
            out = out + jnp.argsort(key, axis=0)
            hit = ~hit
        return out > 0

    bench("coarse + 4 argsorts", coarse_sorts, q0)

    # gather cost: coarse + 4 take_along_axis of q at fixed windows
    def coarse_gathers(q):
        xs, ys, zs = fk_coarse(q, None, None)
        rcol = jnp.asarray(radii_c).reshape((C, 1, 1))
        hit = _env_hits_bm(xs, ys, zs, rcol, env, batched_env=True)
        sel = jnp.argsort(jnp.where(hit, t_iota, T + t_iota), axis=0)[: T // 2]
        acc = jnp.zeros((T // 2, L))
        for _ in range(4):
            acc = acc + jnp.take_along_axis(q, sel[None], axis=1)[0]
        return acc > 0

    bench("coarse + 1 sort + 4 gathers", coarse_gathers, q0)


if __name__ == "__main__":
    main()
