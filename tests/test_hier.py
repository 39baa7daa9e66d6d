"""Hierarchical fkcc (ops/fkcc_hier) parity against the dense checker.

The hier checker must be boolean-IDENTICAL to the dense checker's per-block
reduction when compaction capacity covers all flagged states, and only ever
MORE conservative (valid => dense-valid) under overflow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_tpu.env import Capsule, Cuboid, Environment, Sphere
from vamp_tpu.ops.fkcc_bm import make_fkcc_planner
from vamp_tpu.ops.fkcc_hier import make_fkcc_hier_blocks
from vamp_tpu.robots.descriptions import load_robot


def random_env(rng, n_sph=4, n_cap=3, n_cub=3):
    e = Environment()
    for _ in range(n_sph):
        e.add_sphere(Sphere(center=rng.uniform(-1, 1, 3), radius=rng.uniform(0.05, 0.3)))
    for _ in range(n_cap):
        e.add_capsule(
            Capsule.from_endpoints(
                rng.uniform(-1, 1, 3), rng.uniform(-1, 1, 3), rng.uniform(0.05, 0.2)
            )
        )
    for _ in range(n_cub):
        e.add_cuboid(
            Cuboid.from_euler(
                rng.uniform(-1, 1, 3), rng.uniform(-np.pi, np.pi, 3),
                rng.uniform(0.05, 0.4, 3),
            )
        )
    return e


def random_states(rng, spec, T, L):
    u = rng.rand(spec.dimension, T, L).astype(np.float32)
    return u * np.asarray(spec.range)[:, None, None] + np.asarray(spec.lower)[:, None, None]


def dense_blocks(spec, q, env, n_blocks, spb):
    ok = jax.jit(make_fkcc_planner(spec))(jnp.asarray(q), env, None, None)
    return np.asarray(jnp.all(ok.reshape(n_blocks, spb, -1), axis=1))


@pytest.mark.parametrize("robot", ["panda", "ur5"])
def test_hier_exact_single_env(robot):
    spec = load_robot(robot)
    rng = np.random.RandomState(3)
    n_blocks, spb, L = 2, 32, 24
    env = random_env(rng).pack()
    q = random_states(rng, spec, n_blocks * spb, L)
    hier = jax.jit(make_fkcc_hier_blocks(spec, n_blocks, spb, capacity_frac=1.0))
    got = np.asarray(hier(jnp.asarray(q), env, None, None))
    want = dense_blocks(spec, q, env, n_blocks, spb)
    assert got.shape == (n_blocks, L)
    np.testing.assert_array_equal(got, want)


def test_hier_exact_lane_batched_env():
    spec = load_robot("panda")
    rng = np.random.RandomState(7)
    n_blocks, spb, L = 2, 32, 16
    envs = [random_env(rng).pack(quantum=1) for _ in range(L)]
    env = jax.tree.map(lambda *xs: jnp.stack(xs), *envs)
    # short segments around a self-collision-free home pose => a meaningful
    # mix of valid and invalid blocks (independent full-range random states
    # would make every 32-state block trivially invalid)
    home = np.array([0, -0.785, 0, -2.356, 0, 1.571, 0.785], np.float32)
    a = home[:, None] + rng.uniform(-0.6, 0.6, (spec.dimension, L)).astype(np.float32)
    b = a + rng.uniform(-0.4, 0.4, a.shape).astype(np.float32)
    frac = (np.arange(1, spb + 1, dtype=np.float32) / spb)[None, :, None]
    seg = a[:, None, :] + (b - a)[:, None, :] * frac
    q = np.concatenate([seg, seg + 0.03], axis=1)
    hier = jax.jit(make_fkcc_hier_blocks(spec, n_blocks, spb, capacity_frac=1.0))
    got = np.asarray(hier(jnp.asarray(q), env, None, None))
    want = dense_blocks(spec, q, env, n_blocks, spb)
    np.testing.assert_array_equal(got, want)
    # sanity: the batch isn't trivially all-valid/all-invalid
    assert got.any() and not got.all()


def test_hier_edge_like_states_exact():
    """Edge-shaped workloads (interpolated segments) — the planner case."""
    spec = load_robot("panda")
    rng = np.random.RandomState(11)
    n_blocks, spb, L = 2, 32, 32
    env = random_env(rng, n_sph=6, n_cap=2, n_cub=4).pack()
    a = random_states(rng, spec, 1, L)[:, 0]  # (dim, L)
    b = a + rng.uniform(-0.5, 0.5, a.shape).astype(np.float32)
    frac = (np.arange(1, spb + 1, dtype=np.float32) / spb)[None, :, None]
    seg = a[:, None, :] + (b - a)[:, None, :] * frac
    q = np.concatenate([seg, seg + 0.05], axis=1)  # two blocks
    hier = jax.jit(make_fkcc_hier_blocks(spec, n_blocks, spb, capacity_frac=1.0))
    got = np.asarray(hier(jnp.asarray(q), env, None, None))
    want = dense_blocks(spec, q, env, n_blocks, spb)
    np.testing.assert_array_equal(got, want)


def test_hier_overflow_conservative():
    """Tiny capacity: hier may reject valid blocks, never accept invalid."""
    spec = load_robot("panda")
    rng = np.random.RandomState(5)
    n_blocks, spb, L = 2, 32, 24
    env = random_env(rng, n_sph=8, n_cap=4, n_cub=4).pack()
    q = random_states(rng, spec, n_blocks * spb, L)
    hier = jax.jit(make_fkcc_hier_blocks(spec, n_blocks, spb, capacity_frac=0.125))
    got = np.asarray(hier(jnp.asarray(q), env, None, None))
    want = dense_blocks(spec, q, env, n_blocks, spb)
    assert not np.any(got & ~want), "hier accepted a block dense rejects"


def test_hier_dense_fallback_heightfield():
    """Heightfield envs must take the dense path (hier gate is not sound
    for non-metric tests) and agree exactly."""
    from vamp_tpu.env import HeightField

    spec = load_robot("panda")
    rng = np.random.RandomState(9)
    e = random_env(rng, n_sph=2, n_cap=0, n_cub=0)
    e.add_heightfield(
        HeightField(
            origin=np.zeros(3, np.float32),
            scale=np.array([8.0, 8.0, 0.2], np.float32),
            data=rng.rand(16, 16).astype(np.float32),
        )
    )
    env = e.pack()
    n_blocks, spb, L = 2, 16, 8
    q = random_states(rng, spec, n_blocks * spb, L)
    hier = jax.jit(make_fkcc_hier_blocks(spec, n_blocks, spb))
    got = np.asarray(hier(jnp.asarray(q), env, None, None))
    want = dense_blocks(spec, q, env, n_blocks, spb)
    np.testing.assert_array_equal(got, want)
