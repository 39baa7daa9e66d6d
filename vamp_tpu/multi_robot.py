"""Multi-robot planning: OO robot facade, composite and prioritized planners.

Delivers the capability the reference fork designed but never implemented
(reference: MR_DEV_PLAN.md:174-278 — MultiRobotEnvironment, PrioritizedPlanner,
CBSPlanner, bindings/multi_robot.cc are all absent from the C++ tree; see
SURVEY.md §2.9):

- `Robot` / `RobotFactory` — the OO surface of the fork's RobotInterface /
  RobotFactory (reference: robots/base_robot_interface.hh:36-293,
  robots/robot_factory.hh:23-188), except base pose is an arbitrary runtime
  value baked into the traced FK program (robots/composite.bake_base) instead
  of a 3x3 grid of template instantiations.
- `MultiRobotSystem.plan(method="composite")` — coupled planning in the
  composite configuration space (e.g. 2xPanda = 14-DoF) with inter-robot
  sphere-sphere collision fused into the same FK+CC kernel as environment
  collision. Complete (up to sampling), uses any single-robot planner.
- `MultiRobotSystem.plan(method="prioritized")` — decoupled planning in
  priority order; each robot treats the swept volumes of higher-priority
  robots' paths as a vectorized sphere-cloud obstacle (env.add_sphere_cloud).
  Fast and conservative: robots never cross even at different times. Falls
  back to composite when a priority ordering fails, if `fallback=True`.

CBS on per-robot roadmaps lives in planners/cbs.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace as dc_replace
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .api import PlanningResult, RobotModule, robot_module
from .env import Environment
from .ops.fkcc import make_fkcc
from .ops.fkcc_bm import make_sphere_fk_bm
from .robots.composite import CompositeSpec, bake_base, make_composite_spec
from .robots.descriptions import load_robot
from .robots.spec import RobotSpec
from .utils.settings import RRTCSettings, SimplifySettings


class Robot(RobotModule):
    """A robot instance at a fixed base pose (the fork's RobotInterface).

    All RobotModule planners/kernels work on it directly; the base pose is a
    constant in its traced FK (reference analogue: RobotWrapper<PandaBase<...>>,
    robots/robot_wrapper.hh:19-211, minus the template grid restriction).
    """

    def __init__(self, name: str, base_position=(0.0, 0.0, 0.0), base_orientation=None):
        base_spec = load_robot(name)
        spec = bake_base(base_spec, base_position, base_orientation)
        super().__init__(spec.name, spec)
        self.robot_name = name
        self.base_position = np.asarray(base_position, np.float32).reshape(3)
        self.base_orientation = base_orientation
        self.base_spec = base_spec

    def get_name(self) -> str:
        return self.robot_name

    def get_base_position(self) -> List[float]:
        return [float(v) for v in self.base_position]

    def get_dimension(self) -> int:
        return self.spec.dimension

    def get_n_spheres(self) -> int:
        return self.spec.n_spheres

    def get_resolution(self) -> int:
        return self.spec.resolution


# 3x3 grid the fork shipped (reference: robots/grid_positions.hh:5-9,
# robots/panda_grid.hh:10-36 — {0,1,2}m x {0,1,2}m). The fork's z is 0 in the
# grid variants but 0.05 in the factory (robot_factory.hh:42); we use z=0,
# matching the code that actually ran.
GRID_POSITIONS: Tuple[Tuple[float, float, float], ...] = tuple(
    (float(i), float(j), 0.0) for i in range(3) for j in range(3)
)


class RobotFactory:
    """Creation helpers mirroring the fork's RobotFactory
    (robots/robot_factory.hh:23-188), generalized to arbitrary poses."""

    @staticmethod
    def create(name: str, position=(0.0, 0.0, 0.0), orientation=None) -> Robot:
        return Robot(name, position, orientation)

    @staticmethod
    def create_panda(x: float = 0.0, y: float = 0.0, z: float = 0.0) -> Robot:
        return Robot("panda", (x, y, z))

    @staticmethod
    def create_panda_grid(i: int, j: int) -> Robot:
        if not (0 <= i <= 2 and 0 <= j <= 2):
            raise ValueError(f"grid index ({i},{j}) outside the 3x3 grid")
        return Robot("panda", (float(i), float(j), 0.0))

    @staticmethod
    def get_available_variants() -> List[str]:
        return [f"panda_{i}_{j}" for i in range(3) for j in range(3)]

    @staticmethod
    def nearest_grid_position(position) -> Tuple[float, float, float]:
        p = np.asarray(position, np.float64).reshape(3)
        grid = np.asarray(GRID_POSITIONS)
        return tuple(grid[int(np.argmin(np.sum((grid - p) ** 2, axis=1)))])


@dataclass
class MultiRobotPlanningResult:
    """Per-robot paths on a common normalized timeline (row t of every path is
    the team state at phase t/(T-1))."""

    solved: bool
    paths: List[np.ndarray]  # per robot, (T, dim_i)
    cost: float  # sum of per-robot path costs
    nanoseconds: int
    iterations: int
    method: str

    @property
    def costs(self) -> List[float]:
        return [
            float(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1))) if len(p) >= 2 else 0.0
            for p in self.paths
        ]


_FK_CACHE = {}


def _cached_fk(spec: RobotSpec):
    key = id(spec)
    fn = _FK_CACHE.get(key)
    if fn is None:
        fn = jax.jit(make_sphere_fk_bm(spec))
        _FK_CACHE[key] = (fn, spec)  # keep spec alive so id() stays unique
    else:
        fn = fn[0]
    return fn


def _swept_sphere_cloud(spec: RobotSpec, path: np.ndarray, max_states: int = 128) -> np.ndarray:
    """Sphere positions swept along `path`, as an (N, 4) xyzr cloud.

    States are placed uniformly in arc length at the robot's collision
    resolution (reference semantics: `resolution` checks per unit C-space
    distance, planning/validate.hh:41), capped at `max_states`.
    """
    path = np.asarray(path, np.float32)
    seg = np.linalg.norm(np.diff(path, axis=0), axis=1) if len(path) > 1 else np.zeros(0)
    total = float(seg.sum())
    if len(path) < 2 or total <= 0.0:
        states = path[:1]
    else:
        n = int(min(max(np.ceil(total * spec.resolution) + 1, 2), max_states))
        # arc-length parameterization
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        s = np.linspace(0.0, total, n)
        idx = np.clip(np.searchsorted(cum, s, side="right") - 1, 0, len(seg) - 1)
        frac = np.where(seg[idx] > 0, (s - cum[idx]) / np.maximum(seg[idx], 1e-12), 0.0)
        states = path[idx] + frac[:, None] * (path[idx + 1] - path[idx])  # (n, dim)
    n = len(states)

    fk = _cached_fk(spec)
    xs, ys, zs = fk(jnp.asarray(states.T))  # (S, n) each
    centers = np.stack([np.asarray(xs), np.asarray(ys), np.asarray(zs)], axis=-1).reshape(-1, 3)
    radii = np.repeat(spec.sphere_radius[:, None], n, axis=1).reshape(-1)
    return np.concatenate([centers, radii[:, None]], axis=1).astype(np.float32)


def _resample_path(path: np.ndarray, n: int) -> np.ndarray:
    """Resample a path to n states uniform in arc length (for synchronizing
    per-robot paths onto one timeline)."""
    path = np.asarray(path, np.float32)
    if len(path) == 1:
        return np.repeat(path, n, axis=0)
    seg = np.linalg.norm(np.diff(path, axis=0), axis=1)
    total = float(seg.sum())
    if total <= 0:
        return np.repeat(path[:1], n, axis=0)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    s = np.linspace(0.0, total, n)
    idx = np.clip(np.searchsorted(cum, s, side="right") - 1, 0, len(seg) - 1)
    frac = (s - cum[idx]) / np.maximum(seg[idx], 1e-12)
    return path[idx] + frac[:, None] * (path[idx + 1] - path[idx])


def _resample_timeline(path: np.ndarray, n: int) -> np.ndarray:
    """Resample uniformly in STEP INDEX (not arc length): CBS paths are
    synchronized per timestep, so index-space interpolation preserves the
    cross-robot synchronization (including waits)."""
    T = len(path)
    if T == 1:
        return np.repeat(path, n, axis=0)
    s = np.linspace(0.0, T - 1.0, n)
    i0 = np.clip(np.floor(s).astype(np.int64), 0, T - 2)
    frac = (s - i0)[:, None].astype(np.float32)
    return path[i0] * (1.0 - frac) + path[i0 + 1] * frac


class MultiRobotSystem:
    """A team of robots sharing one static environment (the fork's
    MultiRobotEnvironment, MR_DEV_PLAN.md:178-198)."""

    def __init__(self, robots: Sequence[Robot], environment: Optional[Environment] = None):
        if not robots:
            raise ValueError("need at least one robot")
        self.robots: List[Robot] = list(robots)
        self.environment = environment if environment is not None else Environment()
        self._composite: Optional[CompositeSpec] = None
        self._composite_module: Optional[RobotModule] = None
        self._inter_check = None

    # -- composite machinery -------------------------------------------------
    @property
    def composite(self) -> CompositeSpec:
        if self._composite is None:
            self._composite = make_composite_spec(
                [r.base_spec for r in self.robots],
                [r.base_position for r in self.robots],
                [r.base_orientation for r in self.robots],
            )
        return self._composite

    @property
    def composite_module(self) -> RobotModule:
        """RobotModule over the composite spec: every planner works on the
        coupled space directly (rrtc/prm/fcit/aorrtc/simplify)."""
        if self._composite_module is None:
            self._composite_module = RobotModule(self.composite.spec.name, self.composite.spec)
        return self._composite_module

    def join_configs(self, configs: Sequence) -> np.ndarray:
        return self.composite.join_configs(configs)

    def split_config(self, q) -> List[np.ndarray]:
        return self.composite.split_config(q)

    # -- collision queries ----------------------------------------------------
    def check_inter_robot_collisions(self, configs: Sequence) -> bool:
        """True iff some pair of robots collides with each other at `configs`
        (environment and self collisions NOT included — reference intent:
        MultiRobotEnvironment::check_inter_robot_collisions,
        MR_DEV_PLAN.md:188)."""
        if self._inter_check is None:
            comp = self.composite
            own = np.concatenate(
                [p.spec.self_pairs + p.sphere_offset for p in comp.parts if p.spec.self_pairs.size]
                or [np.zeros((0, 2), np.int32)]
            )
            own_set = {(int(a), int(b)) for a, b in own}
            inter = np.asarray(
                [p for p in comp.spec.self_pairs.tolist() if tuple(p) not in own_set], np.int32
            ).reshape(-1, 2)
            spec_inter = dc_replace(
                comp.spec, self_pairs=inter, self_pairs_attach=inter, name=comp.spec.name + "/inter"
            )
            empty = Environment().pack()
            fkcc = make_fkcc(spec_inter)
            self._inter_check = jax.jit(lambda q: fkcc(q, empty))
        q = self.join_configs(configs).astype(np.float32)
        return not bool(self._inter_check(jnp.asarray(q)[None])[0])

    def validate(self, configs: Sequence, env: Optional[Environment] = None) -> bool:
        """Full team validity: joint limits + environment + self + inter-robot."""
        module = self.composite_module
        return module.validate(self.join_configs(configs), env or self.environment)

    # -- planning -------------------------------------------------------------
    def plan(
        self,
        starts: Sequence,
        goals: Sequence,
        planner: str = "rrtc",
        method: str = "composite",
        settings=None,
        simplify: bool = True,
        simplify_settings: Optional[SimplifySettings] = None,
        priorities: Optional[Sequence[int]] = None,
        fallback: bool = True,
        timeline_states: int = 32,
    ) -> MultiRobotPlanningResult:
        """Plan all robots from `starts` to `goals` (per-robot configs).

        method="composite": coupled planning in the product space.
        method="prioritized": sequential planning with swept-volume obstacles;
        falls back to composite when some robot fails and `fallback` is set.
        method="cbs": Conflict-Based Search over per-robot PRM roadmaps
        (planners/cbs.py); resolves robot-robot conflicts optimally on the
        roadmaps; falls back to composite when budgets exhaust.
        """
        if method == "composite":
            return self._plan_composite(
                starts, goals, planner, settings, simplify, simplify_settings, timeline_states
            )
        if method in ("prioritized", "cbs"):
            if method == "prioritized":
                res = self._plan_prioritized(
                    starts, goals, planner, settings, simplify, simplify_settings, priorities,
                    timeline_states,
                )
            else:
                res = self._plan_cbs(starts, goals, settings, timeline_states)
            if not res.solved and fallback:
                comp = self._plan_composite(
                    starts, goals, planner, settings, simplify, simplify_settings, timeline_states
                )
                comp.nanoseconds += res.nanoseconds
                return comp
            return res
        raise ValueError(f"unknown method {method!r} (composite | prioritized | cbs)")

    def _plan_cbs(self, starts, goals, settings, timeline_states) -> MultiRobotPlanningResult:
        from .planners.cbs import cbs_plan
        from .utils.settings import RoadmapSettings

        rs = settings if isinstance(settings, RoadmapSettings) else None
        t0 = time.perf_counter_ns()
        out = cbs_plan(self.robots, starts, goals, self.environment, roadmap_settings=rs)
        ns = time.perf_counter_ns() - t0
        if out is None:
            return MultiRobotPlanningResult(False, [], float("inf"), ns, 0, "cbs")
        paths, cost, expansions = out
        # CBS paths are per-timestep synchronized already; resample only to
        # densify the shared timeline.
        T = max(timeline_states, max(len(p) for p in paths))
        paths = [_resample_timeline(np.asarray(p, np.float32), T) for p in paths]
        return MultiRobotPlanningResult(True, paths, float(cost), ns, expansions, "cbs")

    def _plan_composite(
        self, starts, goals, planner, settings, simplify, simplify_settings, timeline_states
    ) -> MultiRobotPlanningResult:
        module = self.composite_module
        start = self.join_configs(starts)
        goal = self.join_configs(goals)
        if settings is None:
            settings = RRTCSettings(range=2.0, max_iterations=100_000, max_samples=4096)
        t0 = time.perf_counter_ns()
        plan_fn = getattr(module, planner)
        result: PlanningResult = plan_fn(start, goal, self.environment, settings)
        iters = result.iterations
        path = result.path
        if result.solved and simplify:
            simp = module.simplify(
                path, self.environment, simplify_settings or SimplifySettings()
            )
            path = simp.path
        ns = time.perf_counter_ns() - t0
        if not result.solved:
            return MultiRobotPlanningResult(False, [], float("inf"), ns, iters, "composite")
        timeline = _resample_path(np.asarray(path), max(timeline_states, len(path)))
        paths = self.composite.split_path(timeline)
        cost = float(sum(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1)) for p in paths))
        return MultiRobotPlanningResult(True, paths, cost, ns, iters, "composite")

    def _plan_prioritized(
        self, starts, goals, planner, settings, simplify, simplify_settings, priorities,
        timeline_states,
    ) -> MultiRobotPlanningResult:
        n = len(self.robots)
        order = list(priorities) if priorities is not None else list(range(n))
        if sorted(order) != list(range(n)):
            raise ValueError("priorities must be a permutation of robot indices")
        if settings is None:
            settings = RRTCSettings(range=2.0, max_iterations=100_000, max_samples=4096)

        t0 = time.perf_counter_ns()
        iters = 0
        paths: List[Optional[np.ndarray]] = [None] * n
        # All robots' START and GOAL spheres are obstacles for everyone else:
        # lower-priority robots idle at their starts until they move and park
        # at their goals after — the standard decoupled-planning assumption.
        static_clouds = []
        for i, r in enumerate(self.robots):
            for cfg in (starts[i], goals[i]):
                static_clouds.append((i, _swept_sphere_cloud(r.spec, np.asarray(cfg, np.float32)[None], 2)))

        for rank, i in enumerate(order):
            robot = self.robots[i]
            env_i = Environment()
            env_i.spheres = list(self.environment.spheres)
            env_i.capsules = list(self.environment.capsules)
            env_i.cuboids = list(self.environment.cuboids)
            env_i.heightfields = list(self.environment.heightfields)
            env_i.pointclouds = list(self.environment.pointclouds)
            env_i.clouds = list(self.environment.clouds)
            for j in order[:rank]:
                env_i.clouds.append(_swept_sphere_cloud(self.robots[j].spec, paths[j]))
            for (j, cloud) in static_clouds:
                if j != i and paths[j] is None:
                    env_i.clouds.append(cloud)

            plan_fn = getattr(robot, planner)
            result: PlanningResult = plan_fn(starts[i], goals[i], env_i, settings)
            iters += result.iterations
            if not result.solved:
                ns = time.perf_counter_ns() - t0
                return MultiRobotPlanningResult(False, [], float("inf"), ns, iters, "prioritized")
            path = result.path
            if simplify:
                simp = robot.simplify(path, env_i, simplify_settings or SimplifySettings())
                path = simp.path
            paths[i] = np.asarray(path, np.float32)

        timeline_paths = [_resample_path(p, timeline_states) for p in paths]
        ns = time.perf_counter_ns() - t0
        cost = float(
            sum(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1)) for p in timeline_paths)
        )
        return MultiRobotPlanningResult(True, timeline_paths, cost, ns, iters, "prioritized")
