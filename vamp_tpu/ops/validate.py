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


def make_validate_edges_chunked(
    fkcc_planner: Callable, resolution: int, chunk_states: int, max_chunks: int
):
    """Batched exact-resolution edge validation for arbitrary edge lengths.

    `fkcc_planner` is a batch-minor checker (ops.fkcc_bm.make_fkcc_planner).
    Validates E edges per lane at the reference's check set (j/(8n)) by
    sweeping `chunk_states`-state tiles in a while_loop with collective early
    exit — so short edges cost one fused kernel and long edges only what they
    need. Inactive edges report True.

    Returns `validate(starts (L,E,dim), vecs (L,E,dim), dists (L,E), envs,
    base_rot, base_pos, active (L,E)) -> (L,E) bool`.
    """

    def validate(starts, vecs, dists, envs, br, bp, active):
        L, E = dists.shape
        n = jnp.maximum(jnp.ceil(dists * (resolution / RAKE)), 1.0)
        total = RAKE * n  # (L, E)
        s_bm = starts.transpose(2, 1, 0)[:, None, :, :]  # (dim, 1, E, L)
        v_bm = vecs.transpose(2, 1, 0)[:, None, :, :]
        tot_bm = total.T[None, :, :]  # (1, E, L)

        def chunk_ok(c):
            j = c * chunk_states + jnp.arange(1, chunk_states + 1, dtype=jnp.float32)
            frac = jnp.minimum(j[:, None, None], tot_bm) / tot_bm  # (T, E, L)
            q = s_bm + v_bm * frac[None]
            ok = fkcc_planner(q, envs, br, bp)  # (T, E, L)
            return jnp.all(ok, axis=0).T  # (L, E)

        def cond(carry):
            c, valid, pending = carry
            return jnp.any(pending & valid) & (c < max_chunks)

        def body(carry):
            c, valid, pending = carry
            ok = chunk_ok(c)
            valid = valid & (ok | ~pending)
            pending = pending & ((c + 1) * chunk_states < total)
            return c + 1, valid, pending

        _, valid, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.ones((L, E), bool), active)
        )
        return valid | ~active

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
