"""XORShift-style pseudo-random sampler.

The reference wraps Lemire's AVX2 xorshift128+ (random/xorshift.hh), which is
x86-only (its binding throws on ARM, bindings/common.hh:579-584) — i.e. the
stream is already platform-specific upstream, so there is no cross-platform
bit-parity contract to preserve. The TPU-native replacement is a counter-based
jax.random (threefry) stream with the same API surface (reset/skip/next) and
the same [min_val, max_val) range semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class XORShiftState:
    key: jnp.ndarray  # jax PRNG key data
    counter: jnp.ndarray  # () i32


def xorshift_init(seed: int = 2, seed2: int = 3) -> XORShiftState:
    return XORShiftState(
        key=jax.random.key_data(jax.random.PRNGKey(seed * 0x9E3779B9 + seed2)),
        counter=jnp.zeros((), jnp.int32),
    )


def xorshift_next(state: XORShiftState, dim: int, min_val=0.0, max_val=1.0):
    k = jax.random.wrap_key_data(state.key)
    sub = jax.random.fold_in(k, state.counter)
    x = jax.random.uniform(sub, (dim,), jnp.float32, min_val, max_val)
    return x, XORShiftState(key=state.key, counter=state.counter + 1)


def xorshift_init_batch(batch: int, seed: int = 2, seed2: int = 3) -> XORShiftState:
    """L independent streams (each lane folds its index into the key)."""
    return XORShiftState(
        key=jax.random.key_data(jax.random.PRNGKey(seed * 0x9E3779B9 + seed2)),
        counter=jnp.zeros((batch,), jnp.int32),
    )
