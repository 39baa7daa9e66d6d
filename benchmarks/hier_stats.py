"""Measure coarse bounding-sphere flag rates on MBM-like validation states.

Informs the hierarchical fkcc design: how many (coarse sphere, state) pairs
actually need a fine check, and which coarse spheres are always-flagged
(table-adjacent links that defeat per-state gating).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import vamp_tpu as vamp
from benchmarks.evaluate_mbm import load_problems
from vamp_tpu.ops.fkcc_bm import _env_hits_bm, make_sphere_fk_bm, make_fkcc_planner
from vamp_tpu.ops.fkcc_hier import build_coarse_model
from vamp_tpu.samplers.halton import halton_init_batch, halton_next
import dataclasses


def main(robot="panda", states_per_problem=64):
    module = vamp.robot_module(robot)
    spec = module.spec
    problems = load_problems(robot)
    from vamp_tpu.env import max_class_counts

    caps = max_class_counts([vamp.problem_dict_to_vamp(p) for p in problems])
    envs_list = [
        vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps)
        for p in problems
    ]
    envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)

    frames, centers, radii_c, cover = build_coarse_model(spec)
    C = len(radii_c)
    print(f"coarse model: {C} bounding spheres over {spec.n_spheres} fine")
    for c in range(C):
        print(
            f"  c{c:2d} frame={frames[c]:2d} r={radii_c[c]:.3f} "
            f"covers {int(cover[c].sum())} fine spheres"
        )

    cspec = dataclasses.replace(
        spec,
        sphere_frame=frames,
        sphere_center=centers,
        sphere_radius=radii_c,
        sphere_link_names=tuple(f"coarse{int(f)}" for f in frames),
    )
    fk_coarse = jax.jit(make_sphere_fk_bm(cspec))
    fkcc = jax.jit(make_fkcc_planner(spec))

    # Build an MBM-like state distribution: interpolations between
    # start/goal and Halton samples (what tree growth validates).
    L = len(problems)
    T = states_per_problem
    rng = np.random.RandomState(0)
    starts = np.stack([np.asarray(p["start"], np.float32) for p in problems])
    goals = np.stack([np.asarray(p["goals"][0], np.float32) for p in problems])
    lower, rangev = np.asarray(spec.lower), np.asarray(spec.range)
    hs = halton_init_batch(spec.dimension, L)
    us = []
    for _ in range(8):
        u, hs = halton_next(hs)
        us.append(np.asarray(u))  # (dim, L)
    q = np.zeros((spec.dimension, T, L), np.float32)
    for t in range(T):
        u = us[t % 8].T * rangev + lower  # (L, dim)
        anchor = starts if t % 2 == 0 else goals
        frac = rng.rand(L).astype(np.float32)[:, None]
        q[:, t, :] = (anchor + frac * (u - anchor)).T

    qj = jnp.asarray(q)

    @jax.jit
    def coarse_hits(qj):
        xs, ys, zs = fk_coarse(qj, None, None)
        rcol = jnp.asarray(radii_c).reshape((C, 1, 1))
        return _env_hits_per_sphere(xs, ys, zs, rcol, envs_all)

    def _env_hits_per_sphere(xs, ys, zs, rcol, env):
        # per-coarse-sphere hit flags: call _env_hits_bm per sphere row
        outs = []
        for c in range(C):
            outs.append(
                _env_hits_bm(
                    xs[c : c + 1], ys[c : c + 1], zs[c : c + 1],
                    rcol[c : c + 1], env, batched_env=True,
                )
            )
        return jnp.stack(outs)  # (C, T, L)

    poss = np.asarray(coarse_hits(qj))  # (C, T, L)
    valid = np.asarray(fkcc(qj, envs_all, None, None))  # (T, L)

    per_c = poss.mean(axis=(1, 2))
    per_state = poss.sum(axis=0)  # flagged coarse spheres per state
    print("\nper-coarse-sphere env flag rate (MBM state mix):")
    for c in np.argsort(-per_c):
        print(f"  c{c:2d} frame={frames[c]:2d} rate={per_c[c]*100:6.2f}%")
    print(f"\nmean flagged coarse spheres/state: {per_state.mean():.2f} of {C}")
    print(f"states with 0 flags: {(per_state == 0).mean()*100:.1f}%")
    print(f"states with <=2 flags: {(per_state <= 2).mean()*100:.1f}%")
    print(f"state validity rate (fine): {valid.mean()*100:.1f}%")
    # distribution of per-(lane) mean flags (are some scenes uniformly bad?)
    lane_mean = per_state.mean(axis=0)
    print(
        f"per-problem flagged-spheres mean: p50={np.percentile(lane_mean,50):.2f} "
        f"p90={np.percentile(lane_mean,90):.2f} max={lane_mean.max():.2f}"
    )
    # how often does the coarse pass alone prove a state valid?
    print(f"coarse-clear (no flags) & fine-valid agreement: "
          f"{((per_state == 0) & valid).mean()*100:.1f}% of states")


if __name__ == "__main__":
    main()
