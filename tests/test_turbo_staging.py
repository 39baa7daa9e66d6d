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


def test_unroll_equals_single_step_slot_bound():
    """When SLOT EXHAUSTION (not running()) terminates the loop, the unrolled
    program must still consume the full U=1 step budget: the residual
    single-step loop after the final stage restores the exact slot < cap-1
    bound (advisor round-4 finding — without it up to U-1 trailing steps are
    stranded and a borderline problem can flip solved<->unsolved between
    unroll settings)."""
    spec = load_robot("panda")
    e = Environment()
    for c in CAGE:
        e.add_sphere(Sphere(c, 0.2))
    # goal buried inside an obstacle: no connect edge ever validates, so
    # every lane runs to slot exhaustion
    e.add_sphere(Sphere([0.55, 0, 0.25], 0.35))
    env = e.pack()

    start = jnp.asarray([0, -0.785, 0, -2.356, 0, 1.571, 0.785], jnp.float32)
    goal = jnp.asarray([0.0, 0.9, 0.0, -0.9, 0.0, 1.8, 0.0], jnp.float32)
    L = 4
    args = (
        jnp.broadcast_to(start, (L, 7)),
        jnp.broadcast_to(goal, (L, 1, 7)),
        jnp.ones((L, 1), bool),
        env,
        halton_skip_batch(
            halton_init_batch(7, L), jnp.arange(L, dtype=jnp.int32) * 1013
        ),
    )
    # max_samples deliberately NOT a multiple of 2U, iterations >> what the
    # slots allow: the slot cap is the terminating condition on every lane
    settings = RRTCSettings(range=1.0, max_iterations=10_000, max_samples=257)

    def run(u):
        solve = jax.jit(
            rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64, unroll=u)
        )
        return solve(*args)

    one = run(1)
    two = run(2)
    np.testing.assert_array_equal(
        np.asarray(one.iterations), np.asarray(two.iterations)
    )
    np.testing.assert_array_equal(np.asarray(one.solved), np.asarray(two.solved))
    np.testing.assert_array_equal(
        np.asarray(one.tree_sizes), np.asarray(two.tree_sizes)
    )


def test_turbo_profiling_knob_warning():
    """A leaked VAMP_TURBO_DISABLE / VAMP_TURBO_FIXED_STEPS must warn loudly
    at import (same treatment as VAMP_FKCC_DISABLE, ops/fkcc_bm.py)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, VAMP_TURBO_FIXED_STEPS="7")
    env.pop("VAMP_TURBO_DISABLE", None)
    r = subprocess.run(
        [sys.executable, "-c", "import vamp_tpu.planners.rrtc_turbo"],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr
    assert "PROFILING mode" in r.stderr and "fixed_steps=7" in r.stderr


def test_nn_bf16_solves_with_valid_paths():
    """nn_bf16 halves the NN sweep read via a bf16 states mirror (f32 norms +
    f32 dot accumulation). It may pick a different near node among ~equally
    near ones, so trajectories are NOT bit-compared — what must hold: the
    cage still solves, and every returned path validates edge-by-edge at the
    reference check set in full f32."""
    from vamp_tpu.ops.fkcc import make_fkcc
    from vamp_tpu.ops.validate import make_validate_motions, states_needed

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

    f32 = jax.jit(rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64))(*args)
    bf = jax.jit(
        rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64, nn_bf16=True)
    )(*args)

    n_f32 = int(np.asarray(f32.solved).sum())
    n_bf = int(np.asarray(bf.solved).sum())
    assert n_bf >= max(1, n_f32 - 1), (n_bf, n_f32)

    fkcc = jax.jit(make_fkcc(spec))
    ns = states_needed(float(np.linalg.norm(spec.range)), spec.resolution)
    validate = jax.jit(make_validate_motions(fkcc, spec.resolution, ns))
    paths = np.asarray(bf.path)
    lens = np.asarray(bf.path_length)
    for lane in np.nonzero(np.asarray(bf.solved))[0]:
        p = paths[lane, : lens[lane]]
        vs = jnp.asarray(p[:-1])
        ve = jnp.asarray(p[1:]) - vs
        ok = validate(vs, ve, jnp.linalg.norm(ve, axis=1), env)
        assert bool(np.asarray(ok).all()), f"lane {lane} path fails validation"


def test_restart_segments_match_sequential_solves():
    """restarts=R fuses R independent attempts into one program: a lane
    solved by bank r must report exactly the path the R=1 program produces
    with bank r alone (first-winning-bank precedence), and unsolved lanes
    stay unsolved. Iterations accumulate only over segments that ran."""
    spec = load_robot("panda")
    e = Environment()
    for c in CAGE:
        e.add_sphere(Sphere(c, 0.2))
    env = e.pack()

    start = jnp.asarray([0, -0.785, 0, -2.356, 0, 1.571, 0.785], jnp.float32)
    goal = jnp.asarray([2.35, 1.0, 0, -0.8, 0, 2.5, 0.785], jnp.float32)
    L = 6
    # moderate budget so some streams solve and some fail
    settings = RRTCSettings(range=1.0, max_iterations=450, max_samples=1280)
    args_base = (
        jnp.broadcast_to(start, (L, 7)),
        jnp.broadcast_to(goal, (L, 1, 7)),
        jnp.ones((L, 1), bool),
        env,
    )

    def bank(offset):
        return halton_skip_batch(
            halton_init_batch(7, L),
            offset + jnp.arange(L, dtype=jnp.int32) * 977,
        )

    b0, b1 = bank(0), bank(40_000)
    solo = jax.jit(rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64))
    r0 = solo(*args_base, b0)
    r1 = solo(*args_base, b1)
    s0, s1 = np.asarray(r0.solved), np.asarray(r1.solved)
    assert s0.any() and (~s0).any(), f"need a mixed outcome for bank0: {s0}"

    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)
    fused = jax.jit(
        rrtc_turbo.make_rrtc_turbo_batch(spec, settings, 1, 64, restarts=2)
    )(*args_base, stacked)
    fs = np.asarray(fused.solved)
    np.testing.assert_array_equal(fs, s0 | s1)
    fpath = np.asarray(fused.path)
    fcost = np.asarray(fused.cost)
    fiter = np.asarray(fused.iterations)
    for lane in range(L):
        if s0[lane]:
            np.testing.assert_array_equal(fpath[lane], np.asarray(r0.path)[lane])
            assert fcost[lane] == float(np.asarray(r0.cost)[lane])
            assert fiter[lane] == int(np.asarray(r0.iterations)[lane])
        elif s1[lane]:
            np.testing.assert_array_equal(fpath[lane], np.asarray(r1.path)[lane])
            assert fcost[lane] == float(np.asarray(r1.cost)[lane])
