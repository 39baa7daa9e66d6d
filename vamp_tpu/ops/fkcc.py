"""Fused forward-kinematics + collision-check kernels (the hot path).

The reference's hottest kernel is `interleaved_sphere_fk<rake>` — generated
straight-line FK interleaved with per-link collision tests and early exit
(reference: robots/panda/fk.hh:1336-1404, ~85% of planner time per SURVEY §3.1).
On TPU there is no early exit; the equivalent design is one fused XLA program
that computes all sphere poses for a *batch* of configurations and mask-reduces
collision across (sphere × shape × pair) axes. The batch axis replaces the
8-wide SIMD rake; XLA fuses FK arithmetic and narrow-phase checks into a
handful of kernels.

`make_fkcc(spec)` returns `fkcc(qs, env, base_rot, base_pos) -> valid (B,)`
with qs (B, dim): True where the configuration is collision-free (environment,
self-collision, and attachment checks — matching reference fkcc/fkcc_attach
semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env import PackedEnvironment
from ..robots.spec import RobotSpec, make_sphere_fk, make_ee_transform
from . import collision


def make_batched_sphere_fk(spec: RobotSpec):
    """`(B, dim) -> (B, S, 3)` world sphere centers (vmapped traced FK)."""
    fk = make_sphere_fk(spec)
    return jax.vmap(lambda q, br, bp: fk(q, br, bp), in_axes=(0, None, None))


def make_fkcc(spec: RobotSpec):
    fk = make_sphere_fk(spec)
    ee_tf = make_ee_transform(spec)
    radii = jnp.asarray(spec.sphere_radius)
    pairs = jnp.asarray(spec.self_pairs) if spec.self_pairs.size else np.zeros((0, 2), np.int32)
    pa = spec.self_pairs_attach if spec.self_pairs_attach is not None else spec.self_pairs
    pairs_attach = jnp.asarray(pa) if pa.size else np.zeros((0, 2), np.int32)

    # Sphere indices owned by frames the attachment must self-check against
    # (reference fkcc_attach checks attachment vs. a baked subset of links,
    # e.g. panda/fk.hh "attachment vs. panda_link0/1/2/5").
    attach_vs = [
        i
        for i, f in enumerate(spec.sphere_frame.tolist())
        if f in set(spec.attach_check_frames)
    ]
    attach_vs = np.asarray(attach_vs, np.int32)

    def single(q: jnp.ndarray, env: PackedEnvironment, base_rot, base_pos) -> jnp.ndarray:
        centers = fk(q, base_rot, base_pos)  # (S, 3)
        r = radii
        hit = collision.spheres_in_environment(centers, r, env)
        # The attachment variant checks a different (reference-baked) pair set.
        hit = hit | collision.self_collision(
            centers, r, pairs_attach if env.has_attachments else pairs
        )

        if env.has_attachments:
            R, t = ee_tf(q, base_rot, base_pos)
            aR = R @ env.attach_rot
            at = t + R @ env.attach_pos
            posed = env.attach_centers @ aR.T + at  # (NA, 3)
            ar = jnp.where(env.attach_mask, env.attach_radii, 0.0)
            # attachment vs environment (padded slots are far away; mask radii=0)
            ahit = collision.spheres_in_environment(posed, ar, env)
            # attachment vs selected robot spheres
            if attach_vs.size:
                rc = centers[attach_vs]  # (K, 3)
                rr = r[attach_vs]
                d = posed[:, None, :] - rc[None, :, :]
                sq = jnp.sum(d * d, axis=-1)
                rs = ar[:, None] + rr[None, :]
                ahit = ahit | jnp.any((sq - rs * rs < 0) & env.attach_mask[:, None])
            hit = hit | ahit
        return jnp.logical_not(hit)

    batched = jax.vmap(single, in_axes=(0, None, None, None))
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    def fkcc(qs: jnp.ndarray, env: PackedEnvironment, base_rot=None, base_pos=None):
        br = eye if base_rot is None else base_rot
        bp = zero if base_pos is None else base_pos
        return batched(qs, env, br, bp)

    return fkcc
