"""Multi-robot layer: composite FK/CC correctness, inter-robot collision,
composite + prioritized planning (SURVEY.md §2.9 — the capability the fork
planned in MR_DEV_PLAN.md but never implemented)."""

import numpy as np
import jax.numpy as jnp
import pytest

import vamp_tpu as vamp
from vamp_tpu.multi_robot import MultiRobotSystem, Robot, RobotFactory, _swept_sphere_cloud

pytestmark = pytest.mark.slow  # planner-heavy: ~8 min on the CPU mesh

from vamp_tpu.ops.fkcc import make_fkcc
from vamp_tpu.robots.composite import bake_base, make_composite_spec
from vamp_tpu.robots.descriptions import load_robot
from vamp_tpu.robots.spec import make_sphere_fk

PANDA_HOME = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)


def _fk_np(spec, q):
    import jax

    return np.asarray(jax.jit(make_sphere_fk(spec))(jnp.asarray(q, jnp.float32)))


# ---------------------------------------------------------------------------
# bake_base: compile-time base pose == runtime base pose
# ---------------------------------------------------------------------------


def test_bake_base_matches_runtime_base():
    spec = load_robot("panda")
    pos = np.array([2.0, 2.0, 0.0], np.float32)
    baked = bake_base(spec, pos)
    ref = _fk_np(spec, PANDA_HOME) + pos  # identity rotation: pure offset
    got = _fk_np(baked, PANDA_HOME)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # trait surface preserved
    assert baked.dimension == spec.dimension
    assert baked.n_spheres == spec.n_spheres
    assert baked.self_pairs.shape == spec.self_pairs.shape
    np.testing.assert_allclose(baked.lower, spec.lower)


def test_bake_base_with_rotation():
    spec = load_robot("ur5")
    yaw = np.pi / 2
    baked = bake_base(spec, [1.0, 0.0, 0.5], yaw)
    q = np.zeros(6, np.float32)
    base = _fk_np(spec, q)
    R = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32
    )
    ref = base @ R.T + np.array([1.0, 0.0, 0.5], np.float32)
    np.testing.assert_allclose(_fk_np(baked, q), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# composite spec: FK concatenation + inter-robot collision
# ---------------------------------------------------------------------------


def test_composite_fk_is_concatenation():
    spec = load_robot("panda")
    comp = make_composite_spec([spec, spec], [[0, 0, 0], [1.5, 0, 0]])
    assert comp.dimension == 14
    assert comp.spec.n_spheres == 2 * spec.n_spheres
    q = np.concatenate([PANDA_HOME, PANDA_HOME * 0.5]).astype(np.float32)
    got = _fk_np(comp.spec, q)
    a = _fk_np(spec, PANDA_HOME)
    b = _fk_np(spec, PANDA_HOME * 0.5) + np.array([1.5, 0, 0], np.float32)
    np.testing.assert_allclose(got[: spec.n_spheres], a, atol=1e-5)
    np.testing.assert_allclose(got[spec.n_spheres :], b, atol=1e-5)


def test_composite_inter_robot_collision_matches_bruteforce():
    """Composite fkcc flags exactly the configs where the two robots' sphere
    sets overlap (empty environment, identical robots at close bases)."""
    spec = load_robot("panda")
    comp = make_composite_spec([spec, spec], [[0, 0, 0], [0.8, 0, 0]])
    import jax

    fkcc = jax.jit(make_fkcc(comp.spec))
    empty = vamp.Environment().pack()

    rng = np.random.default_rng(0)
    u = rng.uniform(size=(64, 7)).astype(np.float32)
    qs_a = (spec.lower + u * (spec.upper - spec.lower)).astype(np.float32)
    qs_b = qs_a[::-1].copy()
    qs = np.concatenate([qs_a, qs_b], axis=1)
    valid = np.asarray(fkcc(jnp.asarray(qs), empty))

    radii = spec.sphere_radius
    single_fk = jax.jit(make_sphere_fk(spec))
    for row in range(0, 64, 7):
        ca = np.asarray(single_fk(jnp.asarray(qs_a[row])))
        cb = np.asarray(single_fk(jnp.asarray(qs_b[row]))) + np.array([0.8, 0, 0], np.float32)
        d = np.linalg.norm(ca[:, None] - cb[None, :], axis=-1)
        inter_hit = bool(np.any(d < radii[:, None] + radii[None, :]))
        # self-collision of each arm alone (same pairs the single-robot kernel checks)
        pairs = spec.self_pairs
        self_hit = False
        for c in (ca, cb):
            dd = np.linalg.norm(c[pairs[:, 0]] - c[pairs[:, 1]], axis=-1)
            self_hit = self_hit or bool(np.any(dd < radii[pairs[:, 0]] + radii[pairs[:, 1]]))
        assert bool(valid[row]) == (not (inter_hit or self_hit)), f"row {row}"


def test_check_inter_robot_collisions():
    sys2 = MultiRobotSystem([Robot("panda", (0, 0, 0)), Robot("panda", (0.4, 0, 0))])
    # both at home with bases 0.4 m apart: arms overlap
    assert sys2.check_inter_robot_collisions([PANDA_HOME, PANDA_HOME]) is True
    far = MultiRobotSystem([Robot("panda", (0, 0, 0)), Robot("panda", (5.0, 0, 0))])
    assert far.check_inter_robot_collisions([PANDA_HOME, PANDA_HOME]) is False


# ---------------------------------------------------------------------------
# sphere clouds (swept-volume obstacles)
# ---------------------------------------------------------------------------


def test_sphere_cloud_collision():
    spec = load_robot("panda")
    cloud = _swept_sphere_cloud(spec, PANDA_HOME[None])  # panda at home, as obstacles
    e = vamp.Environment()
    e.add_sphere_cloud(cloud[:, :3], cloud[:, 3])
    module = vamp.panda
    # the same config collides with its own sphere cloud
    assert module.validate(PANDA_HOME, e) is False
    # far-away cloud does not collide
    e2 = vamp.Environment()
    e2.add_sphere_cloud(cloud[:, :3] + np.array([10.0, 0, 0]), cloud[:, 3])
    assert module.validate(PANDA_HOME, e2) is True


# ---------------------------------------------------------------------------
# planning
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def two_panda_system():
    return MultiRobotSystem(
        [RobotFactory.create_panda(0.0, 0.0, 0.0), RobotFactory.create_panda(1.25, 0.0, 0.0)]
    )


def _check_result(system, res, starts, goals):
    assert res.solved
    assert len(res.paths) == 2
    T = len(res.paths[0])
    assert all(len(p) == T for p in res.paths)
    for p, s, g in zip(res.paths, starts, goals):
        np.testing.assert_allclose(p[0], s, atol=1e-4)
        np.testing.assert_allclose(p[-1], g, atol=1e-4)
    # no inter-robot collision at any shared timeline state
    for t in range(T):
        assert not system.check_inter_robot_collisions([p[t] for p in res.paths]), f"t={t}"


def test_composite_planning_two_pandas(two_panda_system):
    sys2 = two_panda_system
    # swap-ish task: both reach across toward each other's side
    start_a = PANDA_HOME
    goal_a = np.array([1.2, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    start_b = PANDA_HOME
    goal_b = np.array([-1.2, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    settings = vamp.RRTCSettings(range=2.0, max_iterations=100_000, max_samples=2048)
    res = sys2.plan([start_a, start_b], [goal_a, goal_b], settings=settings, method="composite")
    _check_result(sys2, res, [start_a, start_b], [goal_a, goal_b])
    assert res.method == "composite"


def test_prioritized_planning_two_pandas(two_panda_system):
    sys2 = two_panda_system
    start_a = PANDA_HOME
    goal_a = np.array([0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    start_b = PANDA_HOME
    goal_b = np.array([-0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    settings = vamp.RRTCSettings(range=2.0, max_iterations=100_000, max_samples=2048)
    res = sys2.plan(
        [start_a, start_b], [goal_a, goal_b], settings=settings, method="prioritized"
    )
    _check_result(sys2, res, [start_a, start_b], [goal_a, goal_b])
    # prioritized guarantees disjoint swept volumes -> valid at EVERY pairing
    # of times, not just synchronized ones; spot-check a few off-diagonal pairs
    T = len(res.paths[0])
    for ta in (0, T // 2, T - 1):
        for tb in (0, T // 2, T - 1):
            assert not sys2.check_inter_robot_collisions([res.paths[0][ta], res.paths[1][tb]])


def test_factory_surface():
    assert RobotFactory.get_available_variants() == [
        f"panda_{i}_{j}" for i in range(3) for j in range(3)
    ]
    r = RobotFactory.create_panda_grid(2, 2)
    assert r.get_base_position() == [2.0, 2.0, 0.0]
    assert r.get_name() == "panda"
    assert r.get_dimension() == 7
    assert RobotFactory.nearest_grid_position([1.9, 0.2, 0.3]) == (2.0, 0.0, 0.0)
    # a Robot is a full RobotModule: fk/eefk/validate work at the offset base
    spheres = r.fk(PANDA_HOME)
    assert all(abs(s.position[0] - 2.0) < 1.5 for s in spheres)


def test_cbs_planning_two_pandas(two_panda_system):
    sys2 = two_panda_system
    start_a = PANDA_HOME
    goal_a = np.array([0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    start_b = PANDA_HOME
    goal_b = np.array([-0.8, 0.3, 0.0, -1.2, 0.0, 1.571, 0.785], np.float32)
    res = sys2.plan(
        [start_a, start_b], [goal_a, goal_b], method="cbs", fallback=False
    )
    _check_result(sys2, res, [start_a, start_b], [goal_a, goal_b])
    assert res.method == "cbs"


def test_cbs_resolves_forced_conflict():
    """Two point-sphere robots swapping positions along one axis MUST conflict
    on the straight line; CBS has to produce synchronized avoiding paths."""
    from vamp_tpu.planners.cbs import cbs_plan
    from vamp_tpu.utils.settings import RoadmapSettings

    a = Robot("sphere")
    b = Robot("sphere")
    sys2 = MultiRobotSystem([a, b])
    start_a, goal_a = np.array([-1.0, 0, 1.0], np.float32), np.array([1.0, 0, 1.0], np.float32)
    start_b, goal_b = goal_a.copy(), start_a.copy()
    res = sys2.plan(
        [start_a, start_b],
        [goal_a, goal_b],
        method="cbs",
        fallback=False,
        settings=RoadmapSettings(max_iterations=256, max_samples=256),
    )
    assert res.solved
    _check_result(sys2, res, [start_a, start_b], [goal_a, goal_b])
