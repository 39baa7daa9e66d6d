"""Deterministic vectorized Halton sampler (reference: random/halton.hh).

Bit-compatible redesign of the reference's incremental Halton: per-dimension
counters (n, d) over prime bases 3..59, updated with blend masks; bases rotate
after 1M iterations to preserve f32 precision (halton.hh:11, 51-57, 76-82).
Determinism is the reproducibility contract of the whole framework: the same
sample stream ⇒ the same tree growth ⇒ the same paths (SURVEY §2.4).

State is a pytree, so planners can carry it through `lax.while_loop` and vmap
it across batched problems.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = np.array(
    [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59], np.float32
)

MAX_ITERATIONS = 1_000_000  # reference: halton.hh:12


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaltonState:
    """Axis 0 is the dimension axis; any trailing axes are batch lanes.

    Keeping the batch MINOR (state arrays (dim, L) rather than (L, dim)) lets
    batched planners advance L streams per step at full VPU lane utilization
    without vmap (which would put L major).
    """

    b: jnp.ndarray  # (dim, *batch) current bases
    n: jnp.ndarray  # (dim, *batch) numerators
    d: jnp.ndarray  # (dim, *batch) denominators
    iterations: jnp.ndarray  # (*batch,) int32

    @classmethod
    def lane_partition_spec(cls, axes):
        """Declared problem-lane axis per field, for mesh sharding (consumed
        by parallel.mesh.make_sharded_batch_solver): batch-minor state arrays
        carry lanes LAST; guessing by extent would break whenever dim == L."""
        from jax.sharding import PartitionSpec as P

        return cls(b=P(None, axes), n=P(None, axes), d=P(None, axes),
                   iterations=P(axes))


def halton_init(dim: int, bases=None) -> HaltonState:
    if bases is None:
        if dim > len(PRIMES):
            raise ValueError(f"dim {dim} exceeds available prime bases")
        bases = PRIMES[:dim]
    b = jnp.asarray(bases, jnp.float32)
    return HaltonState(
        b=b,
        n=jnp.zeros(dim, jnp.float32),
        d=jnp.ones(dim, jnp.float32),
        iterations=jnp.zeros((), jnp.int32),
    )


def halton_init_batch(dim: int, batch: int) -> HaltonState:
    """L independent streams, batch-minor: arrays (dim, L)."""
    s = halton_init(dim)
    return HaltonState(
        b=jnp.broadcast_to(s.b[:, None], (dim, batch)),
        n=jnp.zeros((dim, batch), jnp.float32),
        d=jnp.ones((dim, batch), jnp.float32),
        iterations=jnp.zeros((batch,), jnp.int32),
    )


def halton_next(state: HaltonState):
    """One sample in the unit cube. Returns (sample (dim, *batch), new state).

    Mirrors halton.hh:73-103 operation-for-operation (blend = jnp.where).
    """
    it = state.iterations + 1
    rolled = it > MAX_ITERATIONS
    rolled_d = rolled[None] if state.b.ndim > 1 else rolled

    b = jnp.where(rolled_d, jnp.roll(state.b, -1, axis=0), state.b)
    n = jnp.where(rolled_d, jnp.zeros_like(state.n), state.n)
    d = jnp.where(rolled_d, jnp.ones_like(state.d), state.d)
    it = jnp.where(rolled, jnp.ones_like(it), it)

    xf = d - n
    x_eq_1 = xf == 1.0
    x_neq_1 = ~x_eq_1

    d = jnp.where(x_eq_1, jnp.floor(d * b), d)
    y = jnp.where(x_neq_1, jnp.floor(d / b), 0.0)

    def cond(carry):
        _, x_le_y = carry
        return jnp.any(x_le_y)

    def body(carry):
        y, x_le_y = carry
        y = jnp.where(x_le_y, jnp.floor(y / b), y)
        x_le_y = x_le_y & (xf <= y)
        return y, x_le_y

    y, _ = jax.lax.while_loop(cond, body, (y, x_neq_1 & (xf <= y)))

    n = jnp.where(x_eq_1, 1.0, jnp.floor((b + 1.0) * y) - xf)
    sample = n / d
    return sample, HaltonState(b=b, n=n, d=d, iterations=it)


def halton_state_at(index, dim: int, bases=None) -> "HaltonState":
    """Closed-form state after `index` samples (host-side, O(log index)).

    The incremental counters (n, d) after drawing sample i are exactly
    d = b^k (k = digits of i in base b) and n = digit-reversal of i — i.e.
    the radical inverse n/d (verified against halton_next step-for-step).
    `index` may be a scalar or an (L,) array (batched, batch-minor output).
    Exact in f32 for index < ~6e6 (d stays below 2^24 for base 3).

    The `iterations` counter restarts at 0 so the 1M-precision base rotation
    (halton.hh:11) happens after a further 1M draws, not immediately.
    """
    idx = np.atleast_1d(np.asarray(index, np.int64))
    if bases is None:
        bases = PRIMES[:dim]
    bases = np.asarray(bases)
    if bases.ndim == 1:
        bases = np.broadcast_to(bases[:, None], (dim, len(idx)))
    L = idx.shape[0]
    n = np.zeros((dim, L), np.float64)
    d = np.ones((dim, L), np.float64)
    for j in range(dim):
        for l in range(L):
            b = int(bases[j, l])
            s = int(idx[l])
            if s == 0:
                continue
            nn, dd, x = 0, 1, s
            while x > 0:
                nn = nn * b + (x % b)
                dd *= b
                x //= b
            n[j, l] = nn
            d[j, l] = dd
    state = HaltonState(
        b=jnp.asarray(bases, jnp.float32),
        n=jnp.asarray(n, jnp.float32),
        d=jnp.asarray(d, jnp.float32),
        iterations=jnp.zeros((L,), jnp.int32),
    )
    if np.isscalar(index) or np.asarray(index).ndim == 0:
        return HaltonState(
            b=state.b[:, 0], n=state.n[:, 0], d=state.d[:, 0],
            iterations=state.iterations[0],
        )
    return state


def halton_skip(state: HaltonState, count) -> HaltonState:
    """Advance the stream by `count` samples (reference RNG.skip)."""

    def body(_, s):
        _, s = halton_next(s)
        return s

    return jax.lax.fori_loop(0, count, body, state)


def halton_skip_batch(state: HaltonState, counts) -> HaltonState:
    """Advance lane i of a batched state by counts[i] samples."""
    max_count = jnp.max(counts)

    def body(i, s):
        _, s2 = halton_next(s)
        live = i < counts  # (L,)
        return HaltonState(
            b=jnp.where(live[None], s2.b, s.b),
            n=jnp.where(live[None], s2.n, s.n),
            d=jnp.where(live[None], s2.d, s.d),
            iterations=jnp.where(live, s2.iterations, s.iterations),
        )

    return jax.lax.while_loop(
        lambda c: c[0] < max_count,
        lambda c: (c[0] + 1, body(c[0], c[1])),
        (jnp.int32(0), state),
    )[1]


def halton_batch(state: HaltonState, count: int):
    """Materialize `count` samples: returns ((count, dim), new state)."""

    def step(s, _):
        x, s = halton_next(s)
        return s, x

    state, xs = jax.lax.scan(step, state, None, length=count)
    return xs, state
