"""Pointcloud utilities: primitive surface sampling, filtering, CAPT setup.

Mirrors the reference's src/vamp/pointcloud.py (geometrout-derived surface
samplers, identical distributions and the same np.random.seed(0) convention
in problem_to_pointcloud) and the filter_pointcloud contract
(collision/filter.hh: range/workcell culling + min-distance dedup). The
reference dedups with a Morton-code sort; here a voxel-grid first-point-wins
dedup gives the same guarantee (no two kept points within min_dist of the
same cell) with plain numpy — the Morton trick is a CPU cache optimization,
not a behavioral contract.
"""

from __future__ import annotations

import time
from typing import Dict, List, Union

import numpy as np

from .robots.descriptions import POINT_RADIUS, ROBOT_MAX_RADII, load_robot

ROBOT_RADII_RANGES = {
    "baxter": (0.012, 0.08),
    "fetch": (0.012, 0.055),
    "panda": (0.012, 0.06),
    "sphere": (0.2, 0.2),
    "ur5": (0.015, 0.08),
}

ROBOT_FIRST_JOINT_LOCATIONS = {
    "fetch": [0.0, 0.0, 0.4],
    "ur5": [0.0, 0.0, 0.91],
    "panda": [0.0, 0.0, 0.0],
}


def _quat_to_matrix(p, q):
    x, y, z, w = q
    T = np.eye(4)
    T[:3, :3] = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    T[:3, 3] = p
    return T


def _transform(points, T):
    return points @ T[:3, :3].T + T[:3, 3]


def sphere_sample_surface(center, radius, num_points, noise=0.0):
    points = np.random.uniform(-1.0, 1.0, (num_points, 3))
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    points = radius * points + np.asarray(center)
    if noise > 0.0:
        points = points + np.random.uniform(-noise, noise, points.shape)
    return points


def cylinder_sample_surface(pose_matrix, radius, height, num_points, noise=0.0):
    angles = np.random.uniform(-np.pi, np.pi, num_points)
    circle = np.stack((np.cos(angles), np.sin(angles)), axis=1)
    area = height * 2 * np.pi * radius + 2 * np.pi * radius**2
    probs = np.array(
        [np.pi * radius**2 / area, height * 2 * np.pi * radius / area, np.pi * radius**2 / area]
    )
    which = np.searchsorted(np.cumsum(probs), np.random.random(num_points), side="right")
    circle[which == 0] *= np.random.uniform(0, radius, ((which == 0).sum(), 1))
    circle[which == 1] *= radius
    circle[which == 2] *= np.random.uniform(0, radius, ((which == 2).sum(), 1))
    z = np.ones((num_points, 1))
    z[which == 0] = -height / 2
    z[which == 1] = np.random.uniform(-height / 2, height / 2, ((which == 1).sum(), 1))
    z[which == 2] = height / 2
    pts = _transform(np.concatenate((circle, z), axis=1), pose_matrix)
    return pts + (2 * noise * np.random.random_sample(pts.shape) - noise)


def cuboid_sample_surface(pose_matrix, dims, num_points, noise=0.0):
    pts = np.random.uniform(-1.0, 1.0, (num_points, 3)) * np.asarray(dims) / 2
    probs = np.array(
        [
            dims[1] * dims[2], dims[1] * dims[2],
            dims[0] * dims[2], dims[0] * dims[2],
            dims[0] * dims[1], dims[0] * dims[1],
        ],
        dtype=float,
    )
    probs /= probs.sum()
    sides = np.searchsorted(np.cumsum(probs), np.random.random(num_points), side="right")
    for s, (axis, sign) in enumerate([(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]):
        pts[sides == s, axis] = sign * dims[axis] / 2
    pts = _transform(pts, pose_matrix)
    return pts + (2 * noise * np.random.random_sample(pts.shape) - noise)


def box_to_pc(box, n):
    tf = _quat_to_matrix(box["position"], box["orientation_quat_xyzw"])
    return cuboid_sample_surface(tf, np.array(box["half_extents"]) * 2, n)


def cylinder_to_pc(cylinder, n):
    tf = _quat_to_matrix(cylinder["position"], cylinder["orientation_quat_xyzw"])
    return cylinder_sample_surface(tf, cylinder["radius"], cylinder["length"], n)


def problem_to_pointcloud(problem, n):
    np.random.seed(0)  # reference convention (pointcloud.py:123)
    return np.vstack(
        [cylinder_to_pc(c, n) for c in problem["cylinder"]]
        + [box_to_pc(b, n) for b in problem["box"]]
    )


def filter_pointcloud(
    pc,
    min_dist: float,
    max_range: float,
    origin=(0.0, 0.0, 0.0),
    workcell_min=None,
    workcell_max=None,
    cull: bool = True,
):
    """Cull + dedup (reference collision/filter.hh:278). Returns
    (filtered points (M,3), elapsed ns)."""
    t0 = time.perf_counter_ns()
    pts = np.asarray(pc, np.float32).reshape(-1, 3)
    from .native import native_filter_pointcloud

    if workcell_min is not None and workcell_max is not None:
        nat = native_filter_pointcloud(
            pts, min_dist, max_range, origin, workcell_min, workcell_max, cull
        )
        if nat is not None:
            return nat, time.perf_counter_ns() - t0
    if cull:
        origin = np.asarray(origin, np.float32)
        keep = np.linalg.norm(pts - origin, axis=1) <= max_range
        if workcell_min is not None:
            keep &= np.all(pts >= np.asarray(workcell_min, np.float32), axis=1)
        if workcell_max is not None:
            keep &= np.all(pts <= np.asarray(workcell_max, np.float32), axis=1)
        pts = pts[keep]
    if min_dist > 0 and len(pts):
        cells = np.floor(pts / min_dist).astype(np.int64)
        # first-point-wins per voxel (stable order, like the Morton dedup)
        _, first = np.unique(
            cells[:, 0] * 73856093 ^ cells[:, 1] * 19349663 ^ cells[:, 2] * 83492791,
            return_index=True,
        )
        pts = pts[np.sort(first)]
    return pts, time.perf_counter_ns() - t0


def filter_robot_from_pointcloud(robot: str, pc, configuration, env=None, point_radius=POINT_RADIUS):
    """Remove points colliding with the robot at `configuration` (and with
    `env` if given) — reference bindings/common.hh:36-87."""
    import jax.numpy as jnp

    from .ops.fkcc_bm import make_sphere_fk_bm

    spec = robot if not isinstance(robot, str) else load_robot(robot)
    fk = make_sphere_fk_bm(spec)
    q = jnp.asarray(np.asarray(configuration, np.float32))[:, None]
    xs, ys, zs = (np.asarray(v)[:, 0] for v in fk(q))
    centers = np.stack([xs, ys, zs], axis=1)  # (S, 3)
    pts = np.asarray(pc, np.float32).reshape(-1, 3)
    d = np.linalg.norm(pts[:, None, :] - centers[None, :, :], axis=2)
    hit = np.any(d < (spec.sphere_radius[None, :] + point_radius), axis=1)
    if env is not None:
        # env collision for each point as a tiny sphere
        from .ops import collision as C

        packed = env.pack() if hasattr(env, "pack") else env
        import jax

        c = jnp.asarray(pts)[:, None, :]
        r = jnp.full((len(pts), 1), point_radius, jnp.float32)
        hit |= np.asarray(jax.jit(C.spheres_in_environment)(c, r, packed))
    return pts[~hit]


def problem_dict_to_pointcloud(
    robot: str,
    problem: Dict,
    samples_per_object: int,
    filter_radius: float,
    filter_cull: bool,
):
    """Reference src/vamp/pointcloud.py:129-167: synthesize a cloud from the
    problem primitives, filter it, and build a CAPT environment."""
    from .env import Environment

    original = problem_to_pointcloud(problem, samples_per_object)
    origin = ROBOT_FIRST_JOINT_LOCATIONS.get(robot, [0.0, 0.0, 0.0])
    cull_radius = ROBOT_MAX_RADII.get(robot, 1.4)
    bbox_lo = np.asarray(origin) - cull_radius
    bbox_hi = np.asarray(origin) + cull_radius
    filtered, filter_time = filter_pointcloud(
        original, filter_radius, cull_radius, origin, bbox_lo, bbox_hi, filter_cull
    )
    r_min, r_max = ROBOT_RADII_RANGES[robot]
    env = Environment()
    build_time = env.add_pointcloud(filtered, r_min, r_max, POINT_RADIUS)
    return env, original, filtered, filter_time, build_time
