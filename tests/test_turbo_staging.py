"""Staged slot-capacity growth must not change the turbo solve trajectory.

The staged program (N/8 -> N/4 -> N/2 -> N inside one jit) only pads buffers
with vacant-sentinel rows between stages; every step's NN argmin, validation,
and insertion sees the identical live tree. Solutions must therefore match
the single-stage program bit-for-bit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_tpu.env import Environment, Sphere
from vamp_tpu.planners import rrtc_turbo
from vamp_tpu.robots.descriptions import load_robot
from vamp_tpu.samplers.halton import halton_init_batch, halton_skip_batch
from vamp_tpu.utils.settings import RRTCSettings

CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
    [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
    [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]


def test_staged_equals_single_stage(monkeypatch):
    spec = load_robot("panda")
    e = Environment()
    for c in CAGE:
        e.add_sphere(Sphere(c, 0.2))
    env = e.pack()

    start = jnp.asarray([0, -0.785, 0, -2.356, 0, 1.571, 0.785], jnp.float32)
    goal = jnp.asarray([2.35, 1.0, 0, -0.8, 0, 2.5, 0.785], jnp.float32)
    L = 8
    args = (
        jnp.broadcast_to(start, (L, 7)),
        jnp.broadcast_to(goal, (L, 1, 7)),
        jnp.ones((L, 1), bool),
        env,
        halton_skip_batch(
            halton_init_batch(7, L), jnp.arange(L, dtype=jnp.int32) * 1013
        ),
    )
    settings = RRTCSettings(range=1.0, max_iterations=800, max_samples=2048)

    def run(stage_min):
        monkeypatch.setenv("VAMP_TURBO_STAGE_MIN", str(stage_min))
        solve = jax.jit(rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64))
        return solve(*args)

    staged = run(1024)       # 2048 >= 1024 -> stages [256, 512, 1024, 2048]
    single = run(10 ** 9)    # single stage at 2048

    assert bool(staged.solved.any()), "cage problem should solve at this budget"
    np.testing.assert_array_equal(np.asarray(staged.solved), np.asarray(single.solved))
    np.testing.assert_array_equal(
        np.asarray(staged.iterations), np.asarray(single.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(staged.path_length), np.asarray(single.path_length)
    )
    np.testing.assert_array_equal(np.asarray(staged.path), np.asarray(single.path))
    np.testing.assert_array_equal(np.asarray(staged.cost), np.asarray(single.cost))


def test_unroll_equals_single_step():
    """unroll=U only regroups body evaluations per while_loop iteration (the
    body masks non-running lanes itself); the solve trajectory must match
    unroll=1 bit-for-bit."""
    spec = load_robot("panda")
    e = Environment()
    for c in CAGE:
        e.add_sphere(Sphere(c, 0.2))
    env = e.pack()

    start = jnp.asarray([0, -0.785, 0, -2.356, 0, 1.571, 0.785], jnp.float32)
    goal = jnp.asarray([2.35, 1.0, 0, -0.8, 0, 2.5, 0.785], jnp.float32)
    L = 8
    args = (
        jnp.broadcast_to(start, (L, 7)),
        jnp.broadcast_to(goal, (L, 1, 7)),
        jnp.ones((L, 1), bool),
        env,
        halton_skip_batch(
            halton_init_batch(7, L), jnp.arange(L, dtype=jnp.int32) * 1013
        ),
    )
    settings = RRTCSettings(range=1.0, max_iterations=800, max_samples=2048)

    def run(u):
        solve = jax.jit(
            rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64, unroll=u)
        )
        return solve(*args)

    one = run(1)
    two = run(2)

    assert bool(one.solved.any()), "cage problem should solve at this budget"
    np.testing.assert_array_equal(np.asarray(one.solved), np.asarray(two.solved))
    np.testing.assert_array_equal(
        np.asarray(one.iterations), np.asarray(two.iterations)
    )
    np.testing.assert_array_equal(np.asarray(one.path), np.asarray(two.path))
    np.testing.assert_array_equal(np.asarray(one.cost), np.asarray(two.cost))
