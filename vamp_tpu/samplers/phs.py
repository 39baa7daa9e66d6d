"""Prolate hyperspheroid (informed) sampling — batched, batch-minor.

Reference: planning/phs.hh. The PHS is the ellipsoid of configurations whose
path length through them (|f1 - x| + |x - f2|) is below the current best
cost; informed anytime planners sample inside it.

Differences from the reference, by design:
- rotation: the reference solves a Wahba problem with an SVD (phs.hh:107-128)
  to get SOME orthonormal frame whose first axis is the transverse axis; the
  sampling distribution only depends on that first axis (the conjugate radii
  are equal), so we use a Householder reflection mapping e1 -> axis — exact
  same sample distribution, closed-form and jit-friendly;
- the radius uniform: the reference draws it from the RNG's embedded mt19937
  (phs.hh:169-171); we draw one extra Halton sample and use its first
  component, keeping the stream fully deterministic in our stack.

Direction sampling matches the reference's vectorized logit trick
(phs.hh:154-165): u ~ U(0,1)^d; n = log(u/(1-u)) * sqrt(pi/8); n/|n| is
uniform on the sphere.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

SQRT_PI_8 = float(np.sqrt(np.pi / 8.0))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PHS:
    center: jnp.ndarray  # (dim, L)
    axis: jnp.ndarray  # (dim, L) unit transverse axis (f2 - f1)/|.|
    min_td: jnp.ndarray  # (L,) foci distance (min transverse diameter)


def phs_init(starts, goals) -> PHS:
    """starts/goals: (L, dim) foci. Batch-minor PHS parameters."""
    f1 = starts.T
    f2 = goals.T
    d = f2 - f1
    dist = jnp.linalg.norm(d, axis=0)
    axis = d / jnp.maximum(dist, 1e-9)[None]
    return PHS(center=0.5 * (f1 + f2), axis=axis, min_td=dist)


def phs_transform(phs: PHS, ball: jnp.ndarray, transverse: jnp.ndarray) -> jnp.ndarray:
    """Map unit-ball points (dim, L) into the PHS with per-lane transverse
    diameter (L,). Equivalent to phs.hh transform: R @ diag(radii) @ x + c,
    with R any orthonormal frame whose first column is the transverse axis —
    here a Householder reflection H(e1 -> axis)."""
    dim = ball.shape[0]
    td = jnp.maximum(transverse, phs.min_td * (1.0 + 1e-6))
    conj = jnp.sqrt(jnp.maximum(td * td - phs.min_td * phs.min_td, 0.0))
    radii = jnp.concatenate(
        [0.5 * td[None], jnp.broadcast_to(0.5 * conj[None], (dim - 1, ball.shape[1]))]
    )  # (dim, L)
    y = ball * radii
    # Householder H = I - 2 w w^T / (w.w), w = e1 - axis; H e1 = axis.
    e1 = jnp.zeros_like(phs.axis).at[0].set(1.0)
    w = e1 - phs.axis  # (dim, L)
    ww = jnp.sum(w * w, axis=0)  # (L,)
    degenerate = ww < 1e-12  # axis == e1
    coef = jnp.where(degenerate, 0.0, 2.0 * jnp.sum(w * y, axis=0) / jnp.maximum(ww, 1e-12))
    x = y - w * coef[None]
    return x + phs.center


def uniform_in_ball(u_dir: jnp.ndarray, u_rad: jnp.ndarray) -> jnp.ndarray:
    """u_dir (dim, L) uniforms -> direction via logit trick; u_rad (L,) ->
    radius ~ u^(1/d). Returns (dim, L) points uniform in the unit ball."""
    dim = u_dir.shape[0]
    u = jnp.clip(u_dir, 1e-7, 1.0 - 1e-7)
    n = jnp.log(u / (1.0 - u)) * SQRT_PI_8
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=0), 1e-12)[None]
    r = jnp.power(jnp.clip(u_rad, 1e-12, 1.0), 1.0 / dim)
    return n * r[None]


def phs_measure(dim: int, d_foci, d_transverse):
    """Lebesgue measure of the PHS (phs.hh:19-31)."""
    import math

    conj = jnp.sqrt(jnp.maximum(d_transverse**2 - d_foci**2, 0.0))
    lmeas = d_transverse / 2.0 * (conj / 2.0) ** (dim - 1)
    unit_ball = float(np.pi ** (dim / 2.0) / math.gamma(dim / 2.0 + 1.0))
    return lmeas * unit_ball
