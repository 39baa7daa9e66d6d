"""Microbenchmark the turbo NN building blocks in isolation (axon-honest:
one jit'd fori_loop with chained inputs, synced via float())."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N, L, D, STEPS = 2048, 128, 7, 256


def bench(name, body):
    @jax.jit
    def run(q0):
        def step(i, q):
            return body(q, i)

        return lax.fori_loop(0, STEPS, step, q0)

    q0 = jnp.ones((D, L))
    float(jnp.sum(run(q0)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(run(q0)))
    dt = (time.perf_counter() - t0) / STEPS * 1e6
    print(f"{name:28s} {dt:9.1f} us/step")


states = jnp.asarray(np.random.rand(D, N, L).astype(np.float32))
s2 = jnp.asarray(np.random.rand(N, L).astype(np.float32))
radii = jnp.asarray(np.random.rand(N, L).astype(np.float32))
states_lm = jnp.asarray(np.random.rand(L, N, D).astype(np.float32))

bench("noop", lambda q, i: q + 1.0)
bench("dot=sum(mul)", lambda q, i: q + jnp.sum(states * q[:, None, :], axis=0)[:D])
bench(
    "dot+argmin",
    lambda q, i: q
    + jnp.argmin(s2 - 2.0 * jnp.sum(states * q[:, None, :], axis=0), axis=0)[None, :].astype(jnp.float32),
)
bench("argmin only", lambda q, i: q + jnp.argmin(s2 * q[0, 0], axis=0)[None].astype(jnp.float32))
bench("min only", lambda q, i: q + jnp.min(s2 * q[0, 0], axis=0)[None])


def full_nearest(q, i):
    dot = jnp.sum(states * q[:, None, :], axis=0)
    sq = s2 - 2.0 * dot + jnp.sum(q * q, axis=0)[None, :]
    idx = jnp.argmin(sq, axis=0).astype(jnp.int32)
    got = jnp.take_along_axis(states_lm, idx[:, None, None], axis=1)[:, 0, :].T
    return q + got + jnp.min(sq, axis=0)[None]


bench("full nearest+gather", full_nearest)


def update_row(q, i):
    row = q[:1, :] * 2.0
    s = lax.dynamic_update_slice(states, row[:, None, :][:D], (0, jnp.int32(0) + i % N, 0))
    return q + s[:, 0, :]


bench("dyn_update_slice (D,N,L)", update_row)
