"""Narrow-phase collision kernels: robot spheres vs. environment shapes.

Signed squared-distance conventions match the reference exactly (collision in
a pair iff the returned value is < 0):
- sphere/sphere:      |a-b|^2 - (ra+rb)^2     (reference: collision/sphere_sphere.hh:10-23)
- sphere/capsule:     clamp-projected sq-dist (reference: collision/sphere_capsule.hh:9-23)
- sphere/cuboid:      clamped-axis sq-dist    (reference: collision/sphere_cuboid.hh:9-25)
- sphere/heightfield: z - r - h(x, y)  (signed linear, reference: collision/sphere_heightfield.hh:9-30)

Where the reference iterates shape lists with sorted early-exit
(collision/validity.hh:47-150), these kernels evaluate every (sphere, shape)
pair dense over a batch axis and mask-reduce — the TPU-native replacement for
branchy pruning. All inputs are float32; shapes are padded SoA arrays from
`vamp_tpu.env.PackedEnvironment` with masks for the valid slots.

Broadcasting convention: `centers` is (..., S, 3), `radii` is (S,) or
(..., S); every kernel returns a (...,) boolean `any collision`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..env import PackedEnvironment


def spheres_vs_spheres(centers, radii, env: PackedEnvironment):
    """(..., S, 3), (S,) -> (...,) bool."""
    if not env.sphere_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)
    e = env.sphere_xyzr  # (N, 4)
    d = centers[..., :, None, :] - e[None, :, :3]  # (..., S, N, 3)
    sq = jnp.sum(d * d, axis=-1)
    rs = radii[..., :, None] + e[None, :, 3]
    hit = (sq - rs * rs < 0) & env.sphere_mask[None, :]
    return jnp.any(hit, axis=(-1, -2))


def spheres_vs_capsules(centers, radii, env: PackedEnvironment):
    if not env.capsule_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)
    p1, v = env.capsule_p1, env.capsule_v  # (N,3)
    d = centers[..., :, None, :] - p1[None, :, :]  # (..., S, N, 3)
    dot = jnp.sum(d * v[None, :, :], axis=-1)
    cdf = jnp.clip(dot * env.capsule_rdv[None, :], 0.0, 1.0)  # (..., S, N)
    closest = p1[None, :, :] + v[None, :, :] * cdf[..., None]
    dd = centers[..., :, None, :] - closest
    sq = jnp.sum(dd * dd, axis=-1)
    rs = radii[..., :, None] + env.capsule_r[None, :]
    hit = (sq - rs * rs < 0) & env.capsule_mask[None, :]
    return jnp.any(hit, axis=(-1, -2))


def spheres_vs_zcapsules(centers, radii, env: PackedEnvironment):
    """Z-aligned capsule fast path (reference sphere_capsule.hh:26-44; routed
    at pack() like environment.cc:117-143): the closest-point clamp happens
    on z alone."""
    if not env.zcap_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)
    d = centers[..., :, None, :2] - env.zcap_p1[None, :, :2]  # (..., S, N, 2)
    sz = centers[..., :, None, 2] - env.zcap_p1[None, :, 2]
    ez = sz - jnp.clip(sz, 0.0, env.zcap_h[None, :])
    sq = jnp.sum(d * d, axis=-1) + ez * ez
    rs = radii[..., :, None] + env.zcap_r[None, :]
    hit = (sq - rs * rs < 0) & env.zcap_mask[None, :]
    return jnp.any(hit, axis=(-1, -2))


def spheres_vs_zcuboids(centers, radii, env: PackedEnvironment):
    """Z-aligned cuboid fast path (reference sphere_cuboid.hh z-case): the
    third box axis is +-z, in-plane rotation given by zcub_axis (c, s)."""
    if not env.zcub_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)
    d = centers[..., :, None, :] - env.zcub_center[None, :, :]  # (..., S, N, 3)
    c, s = env.zcub_axis[None, :, 0], env.zcub_axis[None, :, 1]
    px = d[..., 0] * c + d[..., 1] * s
    py = d[..., 1] * c - d[..., 0] * s
    e0 = jnp.maximum(jnp.abs(px) - env.zcub_half[None, :, 0], 0.0)
    e1 = jnp.maximum(jnp.abs(py) - env.zcub_half[None, :, 1], 0.0)
    e2 = jnp.maximum(jnp.abs(d[..., 2]) - env.zcub_half[None, :, 2], 0.0)
    sq = e0 * e0 + e1 * e1 + e2 * e2
    hit = (sq - radii[..., :, None] ** 2 < 0) & env.zcub_mask[None, :]
    return jnp.any(hit, axis=(-1, -2))


def spheres_vs_cuboids(centers, radii, env: PackedEnvironment):
    if not env.cuboid_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)
    d = centers[..., :, None, :] - env.cuboid_center[None, :, :]  # (..., S, N, 3)
    # project onto the box axes: (..., S, N, 3 axes)
    proj = jnp.einsum("...snk,nak->...sna", d, env.cuboid_axes)
    a = jnp.maximum(jnp.abs(proj) - env.cuboid_half[None, :, :], 0.0)
    sq = jnp.sum(a * a, axis=-1)
    hit = (sq - radii[..., :, None] ** 2 < 0) & env.cuboid_mask[None, :]
    return jnp.any(hit, axis=(-1, -2))


def spheres_vs_heightfields(centers, radii, env: PackedEnvironment):
    """Height-image lookup: sphere collides if its bottom dips below the
    sampled height texel. Index clamping fixes the reference's off-by-one OOB
    at the upper edge (collision/sphere_heightfield.hh:20-21 clamps to xd, not
    xd-1) — documented deviation, padded texels are -inf-like."""
    if not env.hf_mask.shape[0]:
        return jnp.zeros(centers.shape[:-2], bool)

    def one_field(data, origin, scale, mask):
        yd, xd = data.shape
        xo = origin[0] - centers[..., 0]
        yo = origin[1] - centers[..., 1]
        xs = jnp.clip(jnp.floor(scale[0] * xo + xd // 2), 0, xd - 1).astype(jnp.int32)
        ys = jnp.clip(jnp.floor(scale[1] * yo + yd // 2), 0, yd - 1).astype(jnp.int32)
        zh = data[ys, xs]  # (..., S)
        zhs = scale[2] * zh + origin[2]
        hit = (centers[..., 2] - radii - zhs < 0) & mask
        return jnp.any(hit, axis=-1)

    hits = jax.vmap(one_field, in_axes=(0, 0, 0, 0), out_axes=-1)(
        env.hf_data, env.hf_origin, env.hf_scale, env.hf_mask
    )
    return jnp.any(hits, axis=-1)


def spheres_vs_cloud(centers, radii, env: PackedEnvironment):
    """Vectorized many-sphere obstacle cloud (swept robot volumes etc.):
    chunked so the (..., S, chunk) temp stays bounded for large clouds."""
    M = env.cloud_mask.shape[0]
    if not M:
        return jnp.zeros(centers.shape[:-2], bool)
    out = jnp.zeros(centers.shape[:-2], bool)
    for m0 in range(0, M, 512):
        c = env.cloud_xyzr[m0 : m0 + 512]  # (C, 4)
        d = centers[..., :, None, :] - c[None, :, :3]  # (..., S, C, 3)
        sq = jnp.sum(d * d, axis=-1)
        rs = radii[..., :, None] + c[None, :, 3]
        hit = (sq - rs * rs < 0) & env.cloud_mask[m0 : m0 + 512][None, :]
        out = out | jnp.any(hit, axis=(-1, -2))
    return out


def spheres_vs_pointclouds(centers, radii, env: PackedEnvironment):
    from .capt import capt_collides  # local import to avoid cycle

    capts = getattr(env, "capts", None)
    if not capts:
        return jnp.zeros(centers.shape[:-2], bool)
    out = jnp.zeros(centers.shape[:-2], bool)
    for capt in capts:
        out = out | capt_collides(capt, centers, radii)
    return out


def spheres_in_environment(centers, radii, env: PackedEnvironment):
    """Any robot sphere vs. any environment shape (the fused analogue of
    reference sphere_environment_in_collision, collision/validity.hh:47-150).
    centers: (..., S, 3); radii: (S,) or broadcastable. Returns (...,) bool."""
    radii = jnp.broadcast_to(radii, centers.shape[:-1])
    hit = spheres_vs_spheres(centers, radii, env)
    hit = hit | spheres_vs_capsules(centers, radii, env)
    hit = hit | spheres_vs_zcapsules(centers, radii, env)
    hit = hit | spheres_vs_cuboids(centers, radii, env)
    hit = hit | spheres_vs_zcuboids(centers, radii, env)
    hit = hit | spheres_vs_heightfields(centers, radii, env)
    hit = hit | spheres_vs_cloud(centers, radii, env)
    hit = hit | spheres_vs_pointclouds(centers, radii, env)
    return hit


def self_collision(centers, radii, pairs):
    """Enabled fine sphere-pair self collision.

    The reference bakes these pair checks into the generated fkcc with
    bounding-sphere gating (e.g. panda/fk.hh:1997+); the gate is a pure
    optimization, so checking all enabled fine pairs is boolean-identical.
    centers: (..., S, 3); pairs: (P, 2) int32. Returns (...,) bool.
    """
    if pairs.shape[0] == 0:
        return jnp.zeros(centers.shape[:-2], bool)
    a = centers[..., pairs[:, 0], :]
    b = centers[..., pairs[:, 1], :]
    d = a - b
    sq = jnp.sum(d * d, axis=-1)
    rs = radii[..., pairs[:, 0]] + radii[..., pairs[:, 1]]
    return jnp.any(sq - rs * rs < 0, axis=-1)
