"""CAPT: Collision-Affording Point Tree for pointcloud collision queries.

Redesign of the reference's CAPT (collision/capt.hh, paper arXiv:2406.02807)
for TPU: the build stays on the host (implicit balanced kd-tree over points
padded to a power of two, per-leaf bounded "affordance buffers"); the query
becomes a vectorized gather-descend over a (batch, sphere) grid — fixed-depth
index arithmetic `idx = 2*idx + 1 + (c >= test)` followed by a fixed-size
gather + mask-reduce, which is exactly the memory-access shape TPUs like.

Host build is implemented in numpy with an optional C++ fast path
(vamp_tpu/native). Placeholder query API present from the start so the
environment kernels can compose; full implementation lands with the
pointcloud milestone.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CAPT:
    """Device arrays for a built point tree (see build_capt)."""

    test_values: jnp.ndarray  # (n_internal,) split coordinates, heap order
    test_axes: jnp.ndarray  # (n_internal,) int32 split axes
    leaf_points: jnp.ndarray  # (n_leaves, max_aff, 3) affordance buffers
    leaf_mask: jnp.ndarray  # (n_leaves, max_aff) bool
    point_radius: jnp.ndarray  # () float32


def build_capt(points: np.ndarray, r_min: float, r_max: float, point_radius: float) -> CAPT:
    raise NotImplementedError("CAPT build lands with the pointcloud milestone")


def capt_collides(capt: CAPT, centers, radii):
    raise NotImplementedError("CAPT query lands with the pointcloud milestone")
