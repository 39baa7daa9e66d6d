"""FCIT* neighbor-capped tiled mode (budgets beyond the dense 8192 cap).

The k-NN mode replaces dense (N, N) matrices with per-node K-nearest lists
rebuilt in tiles — solutions must be valid and close to the dense mode's on
the same problem (the graph is sparser, so costs match approximately).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_tpu.env import Environment, Sphere
from vamp_tpu.planners import fcit
from vamp_tpu.robots.descriptions import load_robot
from vamp_tpu.samplers.halton import halton_init_batch
from vamp_tpu.utils.settings import RoadmapSettings


def _problem():
    spec = load_robot("sphere")
    e = Environment()
    e.add_sphere(Sphere([0.0, 0.0, 0.0], 0.35))
    env = e.pack()
    starts = jnp.asarray([[-0.8, -0.8, -0.8]], jnp.float32)
    goals = jnp.asarray([[[0.8, 0.8, 0.8]]], jnp.float32)
    masks = jnp.ones((1, 1), bool)
    return spec, env, starts, goals, masks


def test_knn_mode_solves_and_matches_dense(monkeypatch):
    spec, env, starts, goals, masks = _problem()
    smp = halton_init_batch(3, 1)

    dense_settings = RoadmapSettings(
        max_iterations=4, max_samples=2 + 4 * 128, batch_size=128, optimize=True
    )
    solve_dense = jax.jit(fcit.make_fcit_batch(spec, dense_settings, n_goals=1))
    rd = solve_dense(starts, goals, masks, env, smp)
    assert bool(rd.solved[0])

    # force the k-NN path at the same budget
    monkeypatch.setattr(fcit, "_DENSE_MAX", 64)
    solve_knn = jax.jit(fcit.make_fcit_batch(spec, dense_settings, n_goals=1))
    rk = solve_knn(starts, goals, masks, env, smp)
    assert bool(rk.solved[0])

    cd, ck = float(rd.cost[0]), float(rk.cost[0])
    assert ck < cd * 1.25 + 1e-3, (cd, ck)

    # the returned path is collision-free at reference resolution
    from vamp_tpu.ops.fkcc import make_fkcc
    from vamp_tpu.ops.validate import make_validate_motions, states_needed

    pl = int(rk.path_length[0])
    assert pl >= 2
    p = np.asarray(rk.path[0][:pl])
    np.testing.assert_allclose(p[0], np.asarray(starts[0]), atol=1e-6)
    np.testing.assert_allclose(p[-1], np.asarray(goals[0, 0]), atol=1e-6)
    fkcc = jax.jit(make_fkcc(spec))
    ns = states_needed(float(np.linalg.norm(spec.range)), spec.resolution)
    val = jax.jit(make_validate_motions(fkcc, spec.resolution, ns))
    vs = jnp.asarray(p[:-1])
    ve = jnp.asarray(p[1:]) - vs
    assert bool(val(vs, ve, jnp.linalg.norm(ve, axis=1), env).all())

    # anytime trace is monotone non-increasing where defined
    tr = np.asarray(rk.cost_trace[0])
    fin = tr[np.isfinite(tr)]
    assert np.all(np.diff(fin) <= 1e-5)
