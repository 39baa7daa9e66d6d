"""Reference-compatible Python surface.

Mirrors the reference's `vamp` package API (src/vamp/__init__.py,
bindings/common.hh init_robot) so harness code ports directly:

    import vamp_tpu as vamp
    module, planner, plan_settings, simp_settings = \
        vamp.configure_robot_and_planner_with_kwargs("panda", "rrtc")
    sampler = module.halton()
    result = planner(a, b, env, plan_settings, sampler)
    simple = module.simplify(result.path, env, simp_settings, sampler)

Single-problem calls route through the batched jitted solvers (L=1); the
`*_batch` variants expose the TPU-native throughput path. Compiled solvers
cache on (robot, settings, problem shape) keys.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from .env import Attachment, Capsule, Cuboid, Cylinder, Environment, HeightField, Sphere
from .ops.fkcc_bm import make_fkcc, make_sphere_fk_bm
from .robots.descriptions import (
    DEFAULT_ITERATIONS,
    POINT_RADIUS,
    ROBOT_JOINTS,
    ROBOT_NAMES,
    ROBOT_RRT_RANGES,
    load_robot,
)
from .robots.spec import RobotSpec, make_eefk
from .samplers.halton import (
    HaltonState,
    halton_init,
    halton_next,
    halton_skip,
)
from .utils.settings import (
    AORRTCSettings,
    BSplineSettings,
    PerturbSettings,
    ReduceSettings,
    RoadmapSettings,
    RRTCSettings,
    ShortcutSettings,
    SimplifySettings,
)


@dataclass
class PlanningResult:
    """Host-side result mirroring reference PlanningResult
    (planning/plan.hh:171-179; solved = len(path) >= 2 per bindings)."""

    path: np.ndarray  # (n, dim)
    cost: float
    nanoseconds: int
    iterations: int
    size: List[int]

    @property
    def solved(self) -> bool:
        return len(self.path) >= 2

    def path_cost(self) -> float:
        if len(self.path) < 2:
            return 0.0
        return float(np.linalg.norm(np.diff(self.path, axis=0), axis=1).sum())

    # -- reference Path utility surface (planning/plan.hh:10-169) -----------

    def subdivide(self) -> None:
        """Insert the midpoint of every segment (plan.hh:33-48)."""
        p = np.asarray(self.path, np.float32)
        if len(p) < 2:
            return
        mids = 0.5 * (p[:-1] + p[1:])
        out = np.empty((2 * len(p) - 1, p.shape[1]), np.float32)
        out[0::2] = p
        out[1::2] = mids
        self.path = out

    def interpolate_to_resolution(self, resolution: int) -> None:
        """Re-sample every segment at `resolution` states per unit C-space
        distance (plan.hh:112-150)."""
        p = np.asarray(self.path, np.float32)
        if len(p) < 2:
            return
        out = []
        for a, b in zip(p[:-1], p[1:]):
            seg = float(np.linalg.norm(b - a))
            out.append(a)
            if seg < 1.0 / resolution:
                continue
            n = int(seg * resolution)
            for k in range(1, n):
                out.append(a + (k / n) * (b - a))
        out.append(p[-1])
        self.path = np.stack(out)

    def interpolate_to_n_states(self, n: int) -> None:
        """Re-sample to ~n states, distributing per segment length
        (plan.hh:50-110; faithful to the reference's rounding, including its
        size_t underflow making `max_n_states > 0` true for n + i < n_p)."""
        p = np.asarray(self.path, np.float32)
        n_p = len(p)
        if n_p < 2 or n < n_p:
            return
        seg = np.linalg.norm(np.diff(p, axis=0), axis=1).astype(float)
        remaining = float(seg.sum())
        if remaining < np.finfo(np.float32).eps:
            return
        out = []
        n1 = n_p - 1
        for i in range(n1):
            a, b = p[i], p[i + 1]
            out.append(a)
            max_n_states = n + i - n_p  # size_t arithmetic in the reference
            if max_n_states != 0:
                eff_max = max_n_states if max_n_states > 0 else 1 << 62
                if i + 1 == n1:
                    ns = eff_max + 2 if max_n_states > 0 else 2
                else:
                    ns = int(np.floor(0.5 + n * seg[i] / remaining)) + 1
                ns = min(ns - 2, eff_max) if ns > 2 else 0
                v = b - a
                for k in range(1, ns + 1):
                    out.append(a + (k / ns) * v)
                n -= ns + 1
                remaining -= seg[i]
            else:
                n -= 1
        out.append(p[-1])
        self.path = np.stack(out)


class HaltonSampler:
    """Stateful wrapper mirroring the reference RNG binding (reset/skip/next)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.state = halton_init(dim)

    def reset(self):
        self.state = halton_init(self.dim)

    def skip(self, n: int):
        if n:
            self.state = jax.jit(halton_skip, static_argnums=1)(self.state, int(n))

    def next(self) -> np.ndarray:
        x, self.state = jax.jit(halton_next)(self.state)
        return np.asarray(x)



_WARMED: dict = {}  # id(fn) -> weakref (id alone can alias after GC)


def _is_warmed(fn) -> bool:
    ref = _WARMED.get(id(fn))
    return ref is not None and ref() is fn


def _mark_warmed(fn) -> None:
    import weakref

    try:
        _WARMED[id(fn)] = weakref.ref(fn)
    except TypeError:  # non-weakrefable callable: pin it (rare, small)
        _WARMED[id(fn)] = (lambda obj: (lambda: obj))(fn)


_CALL_FLOOR_NS: list = []  # one-element cache of the measured relay floor


def _call_floor_ns() -> int:
    """Median wall time of a warm trivial jitted round trip — the fixed cost
    of ANY device call in this environment (~29 ms through the axon relay;
    benchmarks/latency_results.json). Measured once per process, lazily."""
    if not _CALL_FLOOR_NS:
        bump = jax.jit(lambda x: x + 1.0)
        jax.block_until_ready(bump(jnp.zeros((8,))))
        samples = []
        for k in range(3):
            x = jnp.full((8,), float(k))
            jax.block_until_ready(x)
            t0 = time.perf_counter_ns()
            jax.block_until_ready(bump(x))
            samples.append(time.perf_counter_ns() - t0)
        _CALL_FLOOR_NS.append(int(np.median(samples)))
    return _CALL_FLOOR_NS[0]


def _timed(fn, *args):
    """Run `fn(*args)` with jit compilation excluded from the reported time.

    The reference times inside the solve (rrtc.hh steady_clock, reported via
    plan.hh:171-179); this backend has no device-side clock, so the closest
    honest analogue is host wall time MINUS the measured per-call relay
    floor: the returned ns excludes the fixed host->device dispatch cost
    that would never appear in an in-solve measurement, clamped at 0.

    Compilation is also excluded: the first call per executable pays XLA
    compilation, which would otherwise dominate. Warm once per executable
    (result discarded — the solvers are functional and deterministic), then
    time the real call to completion. Warm state is keyed by (id, weakref
    identity): a recycled id after GC of a retired executable cannot skip
    warm-up for a different function.
    """
    floor = _call_floor_ns()
    if not _is_warmed(fn):
        jax.block_until_ready(fn(*args))
        _mark_warmed(fn)
    t0 = time.perf_counter_ns()
    out = jax.block_until_ready(fn(*args))
    return out, max(time.perf_counter_ns() - t0 - floor, 0)


def _as_batch_sampler(sampler: Optional[HaltonSampler], dim: int) -> Optional[HaltonState]:
    if sampler is None:
        return None
    s = sampler.state
    return HaltonState(
        b=s.b[:, None], n=s.n[:, None], d=s.d[:, None], iterations=s.iterations[None]
    )


class XORShiftSampler:
    """Stateful xorshift128+ RNG wrapper (reference binding `xorshift`,
    bindings/common.hh:579-584; x86-only there, portable here)."""

    def __init__(self, dim: int, seed: int = 2, seed2: int = 3):
        from .samplers.xorshift import xorshift_init, xorshift_next

        self.dim = dim
        self._seeds = (seed, seed2)
        self._init = xorshift_init
        self._next = jax.jit(lambda s: xorshift_next(s, dim))
        self.state = xorshift_init(seed, seed2)

    def reset(self):
        self.state = self._init(*self._seeds)

    def skip(self, n: int):
        for _ in range(int(n)):
            _, self.state = self._next(self.state)

    def next(self) -> np.ndarray:
        out, self.state = self._next(self.state)
        return np.asarray(out)


class ProlateHyperspheroid:
    """Host-side PHS (reference planning/phs.hh:35-142 via the binding class):
    informed-sampling ellipsoid with foci at start/goal and a settable
    transverse diameter."""

    def __init__(self, start, goal):
        self.start = np.asarray(start, np.float32)
        self.goal = np.asarray(goal, np.float32)
        self.min_transverse = float(np.linalg.norm(self.goal - self.start))
        self.transverse = self.min_transverse

    def set_transverse_diameter(self, d: float):
        self.transverse = max(float(d), self.min_transverse)


class PHSSampler:
    """Informed sampler: uniform in the PHS, descaled to the unit cube and
    clamped (reference planning/phs.hh:144-189). `next()` returns unit-cube
    samples like every other RNG binding."""

    def __init__(self, spec: RobotSpec, phs: ProlateHyperspheroid, seed: int = 0):
        from .samplers.phs import phs_init, phs_transform, uniform_in_ball

        self.spec = spec
        self.phs = phs
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        s = jnp.asarray(phs.start)[None]
        g = jnp.asarray(phs.goal)[None]
        state = phs_init(s, g)

        def draw(u_dir, u_rad, transverse):
            ball = uniform_in_ball(u_dir, u_rad)
            return phs_transform(state, ball, transverse)

        self._draw = jax.jit(draw)

    def reset(self):
        self._rng = np.random.default_rng(self._seed)

    def skip(self, n: int):
        """Advance the stream without producing samples. The host RNG is the
        only state, so skipping is one bulk draw — not n dispatches
        (reference benchmarking convention calls skip(50_000) per problem)."""
        n = int(n)
        if n:
            self._rng.uniform(size=(n, self.spec.dimension + 1))

    def next(self) -> np.ndarray:
        dim = self.spec.dimension
        u = self._rng.uniform(size=(1, dim + 1)).astype(np.float32)
        u_dir = jnp.asarray(u[0, :dim][:, None])
        u_rad = jnp.asarray(u[0, dim:])
        q = np.asarray(self._draw(u_dir, u_rad, jnp.asarray([self.phs.transverse])))[:, 0]
        u = (q - self.spec.lower) / self.spec.range
        return np.clip(u, 0.0, 1.0)


def png_to_heightfield(filename, center, scaling) -> HeightField:
    """Load a grayscale PNG as a heightfield (reference
    src/vamp/__init__.py:65-77: luminance/255, flipped on y)."""
    from PIL import Image

    image = Image.open(filename).convert("L")
    array = np.flip(np.asarray(image).astype(np.float32) / 255.0, axis=0)
    return HeightField(
        origin=np.asarray(center, np.float32),
        scale=np.asarray(scaling, np.float32),
        data=array,
    )


class RobotModule:
    """Per-robot API object (the analogue of `vamp.panda` etc.)."""

    def __init__(self, name: str, spec: Optional[RobotSpec] = None):
        self.name = name
        self.spec = spec if spec is not None else load_robot(name)
        self._fkcc = jax.jit(make_fkcc(self.spec))
        self._eefk = jax.jit(make_eefk(self.spec))
        fk_bm = make_sphere_fk_bm(self.spec)
        self._fk = jax.jit(lambda q: fk_bm(q[:, None]))

    # -- introspection (reference init_robot surface) -----------------------
    def dimension(self) -> int:
        return self.spec.dimension

    def resolution(self) -> int:
        return self.spec.resolution

    def n_spheres(self) -> int:
        return self.spec.n_spheres

    def space_measure(self) -> float:
        return self.spec.space_measure()

    # -- kernels ------------------------------------------------------------
    def fk(self, config) -> List[Sphere]:
        q = jnp.asarray(np.asarray(config, np.float32))
        xs, ys, zs = self._fk(q)
        out = []
        for i in range(self.spec.n_spheres):
            out.append(
                Sphere(
                    [float(xs[i, 0]), float(ys[i, 0]), float(zs[i, 0])],
                    float(self.spec.sphere_radius[i]),
                )
            )
        return out

    def eefk(self, config) -> np.ndarray:
        return np.asarray(self._eefk(jnp.asarray(np.asarray(config, np.float32))))

    def validate(self, config, env: Environment) -> bool:
        """Joint limits + collision (reference Helper::validate_configuration,
        bindings/common.hh:172-189)."""
        q = np.asarray(config, np.float32)
        u = (q - self.spec.lower) / self.spec.range
        if np.any(u < 0.0) or np.any(u > 1.0):
            return False
        packed = _packed(env)
        return bool(self._fkcc(jnp.asarray(q)[None], packed)[0])

    def distance(self, a, b) -> float:
        return float(np.linalg.norm(np.asarray(a, np.float32) - np.asarray(b, np.float32)))

    def validate_path(self, path, env: Environment) -> bool:
        """Validate every consecutive motion of a path at the robot's
        resolution (reference Path::validate, plan.hh:152-166)."""
        p = np.asarray(path, np.float32)
        if len(p) < 2:
            return False
        packed = _packed(env)
        return all(
            self._line_valid(p[i], p[i + 1], packed) for i in range(len(p) - 1)
        )

    # -- samplers ------------------------------------------------------------
    def halton(self) -> HaltonSampler:
        return HaltonSampler(self.spec.dimension)

    def xorshift(self, seed: int = 2, seed2: int = 3) -> XORShiftSampler:
        return XORShiftSampler(self.spec.dimension, seed, seed2)

    def phs_sampler(self, phs: ProlateHyperspheroid, seed: int = 0) -> PHSSampler:
        return PHSSampler(self.spec, phs, seed)

    # -- debug / utility surface ----------------------------------------------
    def sphere_validate(self, config, env: Environment) -> List[List[str]]:
        """Per-robot-sphere list of colliding environment object names
        (reference `sphere_validity`, bindings/common.hh:154-170 →
        sphere_environment_get_collisions, collision/validity.hh:153-249).
        Host-side debug path — not for the planning hot loop.

        Extension over the reference (which reports env objects only): when
        the environment carries an attachment, entries for the posed
        attachment spheres are appended after the robot spheres, and robot
        spheres touching an attachment sphere gain an "attachment_<k>" name
        (the collision set fkcc_attach actually checks, fkcc_bm.py:463+)."""
        spheres = self.fk(config)
        out: List[List[str]] = []
        for si, s in enumerate(spheres):
            p = np.asarray(s.center, np.float32)
            r = float(self.spec.sphere_radius[si])
            names = self._collision_names(p, r, env)
            out.append(names)
        att = env.attachment
        if att is not None and len(att.radii):
            ee = np.asarray(self.eefk(config), np.float32)
            x, y, z, qx, qy, qz, qw = [float(v) for v in ee]
            R_ee = np.array(
                [
                    [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                    [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                    [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
                ],
                np.float32,
            )
            t_ee = np.array([x, y, z], np.float32)
            for k, (c, ar) in enumerate(zip(att.centers, att.radii)):
                pw = R_ee @ (att.rot @ np.asarray(c, np.float32) + att.pos) + t_ee
                names = self._collision_names(pw, float(ar), env)
                # attachment vs robot spheres (the fkcc_attach pair set)
                check = set(self.spec.attach_check_frames)
                for si, s in enumerate(spheres):
                    if int(self.spec.sphere_frame[si]) not in check:
                        continue
                    d2 = float(np.sum((np.asarray(s.center, np.float32) - pw) ** 2))
                    if d2 < (float(self.spec.sphere_radius[si]) + float(ar)) ** 2:
                        names.append(f"robot_sphere_{si}")
                        out[si].append(f"attachment_{k}")
                out.append(names)
        return out

    def _collision_names(self, p: np.ndarray, r: float, env: Environment) -> List[str]:
        """Environment object names colliding with one sphere
        (sphere_environment_get_collisions, validity.hh:153-249)."""
        names: List[str] = []
        for j, o in enumerate(env.spheres):
            c = np.asarray(o.center, np.float32)
            if np.sum((p - c) ** 2) < (r + o.radius) ** 2:
                names.append(o.name or f"sphere_{j}")
        for j, o in enumerate(env.capsules):
            x1 = np.asarray(o.x1, np.float32)
            xv = np.asarray(o.xv, np.float32)
            t = np.clip(np.dot(p - x1, xv) / max(float(np.dot(xv, xv)), 1e-12), 0.0, 1.0)
            if np.sum((p - (x1 + t * xv)) ** 2) < (r + o.radius) ** 2:
                names.append(o.name or f"capsule_{j}")
        for j, o in enumerate(env.cuboids):
            d = p - np.asarray(o.center, np.float32)
            proj = np.asarray(o.axes, np.float32) @ d
            a = np.maximum(np.abs(proj) - np.asarray(o.half_extents, np.float32), 0.0)
            if float(np.sum(a * a)) < r * r:
                names.append(o.name or f"cuboid_{j}")
        for j, o in enumerate(env.heightfields):
            yd, xd = o.data.shape
            ix = int(np.clip(np.floor(o.scale[0] * (o.origin[0] - p[0]) + xd // 2), 0, xd - 1))
            iy = int(np.clip(np.floor(o.scale[1] * (o.origin[1] - p[1]) + yd // 2), 0, yd - 1))
            if p[2] - r < o.scale[2] * o.data[iy, ix] + o.origin[2]:
                names.append(o.name or f"heightfield_{j}")
        for j, cloud in enumerate(env.clouds):
            d2 = np.sum((cloud[:, :3] - p) ** 2, axis=1)
            if bool(np.any(d2 < (cloud[:, 3] + r) ** 2)):
                names.append(f"cloud_{j}")
        if env.pointclouds:
            from .ops.capt import capt_collides

            for j, capt in enumerate(env.pointclouds):
                hit = capt_collides(
                    capt, jnp.asarray(p)[None, None], jnp.asarray([[r]], jnp.float32)
                )
                if bool(np.asarray(hit)[0]):
                    names.append(f"pointcloud_{j}")
        return names

    def filter_self_from_pointcloud(self, pc, configuration, env=None, point_radius=POINT_RADIUS):
        """Remove points lying on the robot (+ attachment) itself (reference
        binding `filter_self_from_pointcloud`, bindings/common.hh:36-87)."""
        from .pointcloud import filter_robot_from_pointcloud

        return filter_robot_from_pointcloud(self.spec, pc, configuration, env, point_radius)

    # -- planners ------------------------------------------------------------
    def rrtc(self, start, goal, env, settings: RRTCSettings, sampler=None) -> PlanningResult:
        goals = np.asarray(goal, np.float32)
        if goals.ndim == 1:
            goals = goals[None]
        return self._rrtc_multi(start, goals, env, settings, sampler)

    rrtc_single = rrtc

    def _rrtc_multi(self, start, goals, env, settings, sampler) -> PlanningResult:
        from .planners.rrtc import make_rrtc_batch

        packed = _packed(env)
        G = len(goals)
        solve = _cached_rrtc(self.spec, settings, G, _env_key(packed))
        res, ns = _timed(
            solve,
            jnp.asarray(np.asarray(start, np.float32))[None],
            jnp.asarray(goals)[None],
            jnp.ones((1, G), bool),
            packed,
            _as_batch_sampler(sampler, self.spec.dimension),
        )
        n = int(res.path_length[0])
        if sampler is not None:
            sampler.state = HaltonState(
                b=res.sampler.b[:, 0],
                n=res.sampler.n[:, 0],
                d=res.sampler.d[:, 0],
                iterations=res.sampler.iterations[0],
            )
        return PlanningResult(
            path=np.asarray(res.path[0])[:n],
            cost=float(res.cost[0]),
            nanoseconds=ns,
            iterations=int(res.iterations[0]),
            size=np.asarray(res.tree_sizes[0]).tolist(),
        )

    def prm(self, start, goal, env, settings: RoadmapSettings, sampler=None) -> PlanningResult:
        from .planners.prm import make_prm_grow, prm_solve_batch

        packed = _packed(env)
        goals = np.asarray(goal, np.float32)
        if goals.ndim == 1:
            goals = goals[None]
        G = len(goals)
        start_np = np.asarray(start, np.float32)
        t0 = time.perf_counter_ns()
        # straight-line early exit (prm.hh:57-69)
        for g in goals:
            if self._line_valid(start_np, g, packed):
                return PlanningResult(
                    path=np.stack([start_np, g]),
                    cost=float(np.linalg.norm(g - start_np)),
                    nanoseconds=time.perf_counter_ns() - t0,
                    iterations=0,
                    size=[1, 1],
                )
        grow = _cached_prm(self.spec, settings, G, _env_key(packed), True)
        out = prm_solve_batch(
            grow,
            jnp.asarray(start_np)[None],
            jnp.asarray(goals)[None],
            jnp.ones((1, G), bool),
            packed,
            _as_batch_sampler(sampler, self.spec.dimension),
        )[0]
        ns = time.perf_counter_ns() - t0
        return PlanningResult(
            path=out.path,
            cost=out.cost,
            nanoseconds=ns,
            iterations=out.iterations,
            size=[out.roadmap_size, 0],
        )

    def aorrtc(self, start, goal, env, settings: AORRTCSettings, sampler=None) -> PlanningResult:
        """Anytime-optimal RRTC (reference Helper::aorrtc)."""
        from .planners.aorrtc import make_aorrtc_batch

        packed = _packed(env)
        goals_np = np.asarray(goal, np.float32)
        if goals_np.ndim == 1:
            goals_np = goals_np[None]  # (G, dim)
        G = len(goals_np)
        key = ("aorrtc", self.name, id(self.spec), settings, G, _env_key(packed))
        fn = _JIT_CACHE.get(key)
        if fn is None:
            fn = make_aorrtc_batch(self.spec, settings)
            _JIT_CACHE[key] = fn
        sam = _as_batch_sampler(sampler, self.spec.dimension)
        # Multi-goal end-to-end: initial RRTC seeded with all goals, AOX
        # rounds use plain sampling when G > 1 (reference aorrtc.hh:478,
        # 494-499, 528-535). Previously goals beyond the first were dropped.
        (paths, lens, costs, solved, iters), ns = _timed(
            fn,
            jnp.asarray(np.asarray(start, np.float32))[None],
            jnp.asarray(goals_np)[None],
            packed,
            sam,
        )
        n = int(lens[0]) if bool(solved[0]) else 0
        return PlanningResult(
            path=np.asarray(paths[0])[:n],
            cost=float(costs[0]),
            nanoseconds=ns,
            iterations=int(iters[0]),
            size=[0, 0],
        )

    aorrtc_multi_goal = aorrtc

    def fcit(self, start, goal, env, settings: RoadmapSettings, sampler=None) -> PlanningResult:
        """FCIT* (reference Helper::fcit)."""
        from .planners.fcit import make_fcit_batch

        packed = _packed(env)
        goals = np.asarray(goal, np.float32)
        if goals.ndim == 1:
            goals = goals[None]
        G = len(goals)
        key = ("fcit", self.name, id(self.spec), settings, G, _env_key(packed))
        fn = _JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(make_fcit_batch(self.spec, settings, n_goals=G))
            _JIT_CACHE[key] = fn
        res, ns = _timed(
            fn,
            jnp.asarray(np.asarray(start, np.float32))[None],
            jnp.asarray(goals)[None],
            jnp.ones((1, G), bool),
            packed,
            _as_batch_sampler(sampler, self.spec.dimension),
        )
        n = int(res.path_length[0]) if bool(res.solved[0]) else 0
        return PlanningResult(
            path=np.asarray(res.path[0])[:n],
            cost=float(res.cost[0]),
            nanoseconds=ns,
            iterations=int(res.iterations[0]),
            size=[int(res.graph_size[0]), 0],
        )

    fcit_multi_goal = fcit

    def roadmap(self, start, goal, env, settings: RoadmapSettings, sampler=None):
        """Full roadmap construction (reference PRM::build_roadmap)."""
        from .planners.prm import make_prm_grow

        packed = _packed(env)
        start_np = np.asarray(start, np.float32)
        goal_np = np.asarray(goal, np.float32)
        grow = _cached_prm(self.spec, settings, 1, _env_key(packed), False)
        rm = grow(
            jnp.asarray(start_np)[None],
            jnp.asarray(goal_np)[None, None],
            jnp.ones((1, 1), bool),
            packed,
            None,
        )
        active = np.asarray(rm.node_active)[:, 0]
        states = np.asarray(rm.states)[:, :, 0].T  # (N, dim)
        nbrs = np.asarray(rm.nbr_idx)[:, :, 0]  # (N, K)
        vertices = states[active]
        remap = -np.ones(len(active), np.int64)
        remap[active] = np.arange(active.sum())
        edges = []
        for i in np.nonzero(active)[0]:
            edges.append([int(remap[j]) for j in nbrs[i] if j >= 0 and active[j]])
        return {
            "vertices": vertices,
            "edges": edges,
            "iterations": int(np.asarray(rm.iterations)[0]),
        }

    def simplify(self, path, env, settings: SimplifySettings, sampler=None) -> PlanningResult:
        from .planners.simplify import make_simplify_batch

        packed = _packed(env)
        p = np.asarray(path, np.float32)
        P = 256
        buf = np.zeros((1, P, self.spec.dimension), np.float32)
        n = min(len(p), P)
        buf[0, :n] = p[:n]
        simp = _cached_simplify(self.spec, settings, _env_key(packed), P)
        res, ns = _timed(simp, jnp.asarray(buf), jnp.asarray([n], np.int32), packed)
        m = int(res.path_length[0])
        return PlanningResult(
            path=np.asarray(res.path[0])[:m],
            cost=float(res.cost[0]),
            nanoseconds=ns,
            iterations=int(res.iterations[0]),
            size=[0, 0],
        )

    # -- internals -----------------------------------------------------------
    def _line_valid(self, a, b, packed) -> bool:
        from .ops.validate import make_validate_motions, states_needed

        key = ("line", self.name, id(self.spec), _env_key(packed))
        fn = _JIT_CACHE.get(key)
        if fn is None:
            diam = float(np.linalg.norm(self.spec.range))
            fn = jax.jit(
                make_validate_motions(
                    make_fkcc(self.spec), self.spec.resolution,
                    states_needed(diam, self.spec.resolution),
                )
            )
            _JIT_CACHE[key] = fn
        vec = jnp.asarray(b - a)[None]
        return bool(
            fn(jnp.asarray(a)[None], vec, jnp.linalg.norm(vec, axis=1), packed)[0]
        )


_JIT_CACHE: Dict[Any, Any] = {}


def _packed(env: Union[Environment, "PackedEnvironment"]):
    from .env import PackedEnvironment

    if isinstance(env, Environment):
        return env.pack()
    return env


def _env_key(packed) -> tuple:
    return tuple(
        (name, tuple(leaf.shape))
        for name, leaf in sorted(packed.__dict__.items())
        if hasattr(leaf, "shape")
    )


def _cached_rrtc(spec, settings, n_goals, env_key):
    key = ("rrtc", spec.name, id(spec), settings, n_goals, env_key)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        from .planners.rrtc import make_rrtc_batch

        fn = jax.jit(make_rrtc_batch(spec, settings, n_goals))
        _JIT_CACHE[key] = fn
    return fn


def _cached_prm(spec, settings, n_goals, env_key, stop_on_connect):
    key = ("prm", spec.name, id(spec), settings, n_goals, env_key, stop_on_connect)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        from .planners.prm import make_prm_grow

        fn = jax.jit(make_prm_grow(spec, settings, n_goals, stop_on_connect))
        _JIT_CACHE[key] = fn
    return fn


def _cached_simplify(spec, settings, env_key, max_path):
    key = ("simplify", spec.name, id(spec), settings, env_key, max_path)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        from .planners.simplify import make_simplify_batch

        fn = jax.jit(make_simplify_batch(spec, settings, max_path))
        _JIT_CACHE[key] = fn
    return fn


class SphereRobotModule(RobotModule):
    """Point-sphere robot with runtime-settable bounds/radius (reference:
    robots/sphere/fk.hh set_lows/set_highs/set_radius)."""

    def __init__(self):
        from .robots.descriptions import make_sphere_robot

        self._lows = (-10.0, -10.0, 0.0)
        self._highs = (10.0, 10.0, 5.0)
        self._radius = 0.2
        super().__init__("sphere", make_sphere_robot())

    def _rebuild(self):
        from .robots.descriptions import make_sphere_robot

        RobotModule.__init__(
            self, "sphere", make_sphere_robot(self._lows, self._highs, self._radius)
        )

    def set_lows(self, lows):
        self._lows = tuple(float(x) for x in lows)
        self._rebuild()

    def set_highs(self, highs):
        self._highs = tuple(float(x) for x in highs)
        self._rebuild()

    def set_radius(self, radius):
        self._radius = float(radius)
        self._rebuild()


@lru_cache(maxsize=None)
def robot_module(name: str) -> RobotModule:
    if name == "sphere":
        return SphereRobotModule()
    return RobotModule(name)


def configure_robot_and_planner_with_kwargs(robot_name: str, planner_name: str, **kwargs):
    """Reference: src/vamp/__init__.py:80-132. Returns (module, planner_func,
    plan_settings, simp_settings). Settings are immutable dataclasses here, so
    kwargs fold in via replace()."""
    module = robot_module(robot_name)
    try:
        planner_func = getattr(module, planner_name)
    except AttributeError:
        raise ValueError(f"Robot {robot_name} does not support planner {planner_name}!")

    if planner_name == "rrtc":
        plan_settings = RRTCSettings(
            range=ROBOT_RRT_RANGES.get(robot_name, 2.0),
            # capacities are array sizes on TPU; a practical default replaces
            # the reference's DEFAULT_ITERATIONS=1e6 budget
            max_iterations=100_000,
            max_samples=4096,
        )
    elif planner_name in ("prm", "roadmap"):
        plan_settings = RoadmapSettings(max_iterations=4096, max_samples=4096)
    elif planner_name == "fcit":
        plan_settings = RoadmapSettings(
            max_iterations=8, max_samples=600, batch_size=64
        )
    elif planner_name == "aorrtc":
        plan_settings = AORRTCSettings(
            max_iterations=2000,
            max_samples=2048,
            rrtc=RRTCSettings(range=ROBOT_RRT_RANGES.get(robot_name, 2.0)),
        )
    else:
        raise NotImplementedError(
            f"Automatic setup for planner {planner_name} is not implemented yet!"
        )

    plan_kwargs = {k: v for k, v in kwargs.items() if hasattr(plan_settings, k)}
    if plan_kwargs:
        plan_settings = replace(plan_settings, **plan_kwargs)

    simp_settings = SimplifySettings()
    simp_updates: Dict[str, Any] = {}
    for k, v in kwargs.items():
        if k.startswith("simplification_"):
            sk = k.replace("simplification_", "")
            if hasattr(simp_settings, sk):
                if sk == "operations":
                    v = tuple(r.lower() for r in v)
                simp_updates[sk] = v
    for sub in ("reduce", "shortcut", "bspline", "perturb"):
        sub_updates = {}
        for k, v in kwargs.items():
            if k.startswith(f"{sub}_"):
                sk = k.replace(f"{sub}_", "")
                if hasattr(getattr(simp_settings, sub), sk):
                    sub_updates[sk] = v
        if sub_updates:
            simp_updates[sub] = replace(getattr(simp_settings, sub), **sub_updates)
    if simp_updates:
        simp_settings = replace(simp_settings, **simp_updates)

    return module, planner_func, plan_settings, simp_settings


def problem_dict_to_vamp(problem: Dict, ignore_names: Sequence[str] = ()) -> Environment:
    """MBM problem dict -> Environment (reference src/vamp/__init__.py:135-181,
    including the "box" problem's cylinder->cuboid overapproximation hack)."""
    env = Environment()
    for obj in problem.get("sphere", []):
        if obj["name"] not in ignore_names:
            env.add_sphere(Sphere(obj["position"], obj["radius"], name=obj["name"]))

    if problem.get("problem") == "box":
        for obj in problem.get("cylinder", []):
            if obj["name"] in ignore_names:
                continue
            env.add_cuboid(
                Cuboid.from_euler(
                    obj["position"],
                    obj["orientation_euler_xyz"],
                    [obj["radius"], obj["radius"], obj["length"] / 2],
                    name=obj["name"],
                )
            )
    else:
        for obj in problem.get("cylinder", []):
            if obj["name"] in ignore_names:
                continue
            env.add_capsule(
                Capsule.from_center(
                    obj["position"],
                    obj["orientation_euler_xyz"],
                    obj["radius"],
                    obj["length"],
                    name=obj["name"],
                )
            )

    for obj in problem.get("box", []):
        if obj["name"] not in ignore_names:
            env.add_cuboid(
                Cuboid.from_euler(
                    obj["position"], obj["orientation_euler_xyz"], obj["half_extents"],
                    name=obj["name"],
                )
            )
    return env


def results_to_dict(planning_result: PlanningResult, simplification_result=None) -> Dict:
    """Reference src/vamp/__init__.py:184-221 (pandas row)."""
    import pandas as pd

    data = {
        "planning_time": pd.Timedelta(planning_result.nanoseconds, unit="ns"),
        "planning_iterations": planning_result.iterations,
        "solved": planning_result.solved,
        "planning_graph_size": sum(planning_result.size),
        "initial_path_vertices": len(planning_result.path),
        "initial_path_cost": planning_result.cost,
    }
    if simplification_result is not None:
        data.update(
            {
                "simplification_time": pd.Timedelta(
                    simplification_result.nanoseconds, unit="ns"
                ),
                "simplified_path_vertices": len(simplification_result.path),
                "simplified_path_cost": simplification_result.cost,
            }
        )
    else:
        data.update(
            {
                "simplification_time": pd.Timedelta(0, unit="ns"),
                "simplified_path_vertices": data["initial_path_vertices"],
                "simplified_path_cost": data["initial_path_cost"],
            }
        )
    data["total_time"] = data["planning_time"] + data["simplification_time"]
    return data
