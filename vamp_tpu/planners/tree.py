"""Fixed-capacity tree storage helpers for device-side planners.

The reference uses an external kd-tree (nigh) over a flat aligned state slab
(planning/nn.hh, rrtc.hh:48-54). On TPU the idiomatic replacement is a masked
argmin over the slab itself: trees are small (<= max_samples), FK dominates,
and a dense (N, dim) distance sweep is one fused VPU kernel with no pointer
chasing (SURVEY §2.6).
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


def masked_nearest(states, mask, q):
    """Nearest state to q among mask-true rows.

    states: (N, d); mask: (N,) bool; q: (d,).
    Returns (index i32, distance f32). Distance is BIG if mask is empty.
    """
    d = states - q[None, :]
    sq = jnp.sum(d * d, axis=1)
    sq = jnp.where(mask, sq, BIG)
    idx = jnp.argmin(sq)
    return idx.astype(jnp.int32), jnp.sqrt(sq[idx])
