"""Batched motion (edge) validation — the framework's central primitive.

Reference semantics (planning/validate.hh:24-75): a motion from `start` along
`vector` of length `dist` is valid iff the configurations at fractions
j/(rake*n), j = 1..rake*n are all collision-free, where rake = 8 and
n = max(ceil(dist * resolution / rake), 1), resolution = 32 checks per unit
C-space distance. The reference sweeps those positions 8 SIMD lanes at a time
with early exit.

TPU redesign: the *same* checked set, evaluated as one fused kernel over a
static (edges, states) grid. `n_states` is the static tile (>= 8n for every
edge in the workload); surplus lanes clamp onto the motion endpoint, so the
checked set is exactly the reference's (duplicates are free in a masked
reduce). Edges validate in parallel across the batch axis — the rake is now
(edges x states) wide instead of 8.

This axis is also the unit of scale-out: shard the state axis over devices and
AND-reduce (see vamp_tpu/parallel) for very long motions, or shard edges for
throughput.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

RAKE = 8  # reference SIMD width; kept for exact check-count parity


def states_needed(max_dist: float, resolution: int) -> int:
    """Static state-tile size covering motions up to max_dist."""
    n_max = max(int(np.ceil(max_dist * resolution / RAKE)), 1)
    return RAKE * n_max


def interpolate_edges(starts, vectors, dists, resolution: int, n_states: int):
    """Configurations at the reference's check fractions.

    starts, vectors: (E, d); dists: (E,). Returns (E, n_states, d).
    """
    n = jnp.maximum(jnp.ceil(dists * (resolution / RAKE)), 1.0)  # (E,)
    total = RAKE * n  # 8n checks per edge
    j = jnp.arange(1, n_states + 1, dtype=jnp.float32)  # (T,)
    frac = jnp.minimum(j[None, :], total[:, None]) / total[:, None]  # (E, T)
    return starts[:, None, :] + vectors[:, None, :] * frac[:, :, None]


def make_validate_motions(fkcc: Callable, resolution: int, n_states: int):
    """Build `validate(starts, vectors, dists, env, ...) -> (E,) bool`.

    fkcc: (B, d) configs, env -> (B,) valid (from ops.fkcc.make_fkcc).
    """

    def validate(starts, vectors, dists, env, base_rot=None, base_pos=None):
        E, d = starts.shape
        configs = interpolate_edges(starts, vectors, dists, resolution, n_states)
        valid = fkcc(configs.reshape(E * n_states, d), env, base_rot, base_pos)
        return jnp.all(valid.reshape(E, n_states), axis=1)

    return validate


def make_validate_motion_pair(fkcc: Callable, resolution: int, n_states: int):
    """`validate(start, goal, env) -> bool` for single start/goal configs
    (reference validate_motion, validate.hh:67-75)."""
    validate = make_validate_motions(fkcc, resolution, n_states)

    def validate_pair(start, goal, env, base_rot=None, base_pos=None):
        vector = goal - start
        dist = jnp.linalg.norm(vector)
        return validate(
            start[None], vector[None], dist[None], env, base_rot, base_pos
        )[0]

    return validate_pair
