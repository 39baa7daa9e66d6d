"""RRT-Connect determinism parity vs. the reference planner.

Fixtures from tools/golden/golden_rrtc.cc: the reference RRTC (rrtc.hh) run
on the Panda sphere-cage demo with range=1.0 and three Halton skip offsets.
Identical sample streams must grow identical trees: we require exact
iteration/size equality and near-exact paths/costs (f32 tolerance).
"""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vamp_tpu.env import Environment, Sphere
from vamp_tpu.planners.rrtc import make_rrtc
from vamp_tpu.robots.descriptions import load_robot
from vamp_tpu.samplers.halton import halton_init, halton_skip
from vamp_tpu.utils.settings import RRTCSettings

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "reference_rrtc.json").read_text()
)

SPHERE_CAGE = [
    [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
    [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25], [0.35, 0.35, 0.8],
    [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8], [-0.35, -0.35, 0.8],
    [0, -0.55, 0.8], [0.35, -0.35, 0.8],
]

START = [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785]
GOAL = [2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785]


@pytest.fixture(scope="module")
def solver():
    spec = load_robot("panda")
    settings = RRTCSettings(range=1.0, max_iterations=5000, max_samples=4096)
    return jax.jit(make_rrtc(spec, settings))


@pytest.fixture(scope="module")
def env():
    e = Environment()
    for c in SPHERE_CAGE:
        e.add_sphere(Sphere(c, 0.2))
    return e.pack()


def test_simplify_matches_reference(env):
    """Default-pipeline simplification (SHORTCUT+BSPLINE) must reproduce the
    reference's simplified paths exactly (simplify.hh, deterministic ops)."""
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import SimplifySettings

    spec = load_robot("panda")
    simplify = jax.jit(make_simplify_batch(spec, SimplifySettings(), max_path=256))
    runs = GOLDEN["runs"]
    L = len(runs)
    paths = np.zeros((L, 256, 7), np.float32)
    lens = np.zeros((L,), np.int32)
    for i, r in enumerate(runs):
        p = np.asarray(r["path"], np.float32)
        paths[i, : len(p)] = p
        lens[i] = len(p)
    res = simplify(jnp.asarray(paths), jnp.asarray(lens), env)
    for i, r in enumerate(runs):
        L2 = int(res.path_length[i])
        rp = np.asarray(r["simplified_path"], np.float32)
        assert L2 == len(rp)
        np.testing.assert_allclose(np.asarray(res.path[i])[:L2], rp, atol=1e-4)
        np.testing.assert_allclose(float(res.cost[i]), r["simplified_cost"], atol=1e-3)
        assert int(res.iterations[i]) == r["simplify_iters"]


@pytest.mark.parametrize("run", GOLDEN["runs"], ids=lambda r: f"skip{r['skip']}")
def test_rrtc_matches_reference(run, solver, env):
    sampler = halton_init(7)
    if run["skip"]:
        sampler = halton_skip(sampler, run["skip"])
    res = solver(
        jnp.asarray(START, jnp.float32),
        jnp.asarray([GOAL], jnp.float32),
        jnp.asarray([True]),
        env,
        sampler,
    )
    assert bool(res.solved) == run["solved"]
    assert int(res.iterations) == run["iterations"]
    assert np.asarray(res.tree_sizes).tolist() == run["sizes"]
    assert int(res.path_length) == len(run["path"])
    path = np.asarray(res.path)[: int(res.path_length)]
    np.testing.assert_allclose(path, np.asarray(run["path"], np.float32), atol=1e-4)
    np.testing.assert_allclose(float(res.cost), run["cost"], atol=1e-3)
