"""Isolate the expensive interaction: NN gathers against buffers that are
dynamically UPDATED in the same loop (the real solver pattern)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N, L, D, STEPS = 2048, 128, 7, 256


def bench(name, init, body):
    @jax.jit
    def run(c0):
        return lax.fori_loop(0, STEPS, body, c0)

    c0 = init()
    out = run(c0)
    float(jnp.sum(out[0]))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(run(c0)[0]))
    dt = (time.perf_counter() - t0) / STEPS * 1e6
    print(f"{name:44s} {dt:9.1f} us/step")


def mk():
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.rand(D, L).astype(np.float32)),  # q
        jnp.asarray(rng.rand(D, N, L).astype(np.float32)),  # states
        jnp.asarray(rng.rand(L, N, D).astype(np.float32)),  # states_lm
        jnp.asarray(rng.rand(N, L).astype(np.float32)),  # s2
        jnp.int32(5),  # slot
    )


def nearest(s2, states, q):
    dot = jnp.sum(states * q[:, None, :], axis=0)
    sq = s2 - 2.0 * dot + jnp.sum(q * q, axis=0)[None, :]
    return jnp.argmin(sq, axis=0).astype(jnp.int32)


def fetch(states_lm, idx):
    return jnp.take_along_axis(states_lm, idx[:, None, None], axis=1)[:, 0, :].T


# 1: one NN + gather, static buffers (no updates)
def b1(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    q = 0.5 * q + 0.5 * fetch(states_lm, idx)
    return (q, states, states_lm, s2, slot)


# 2: one NN + gather + dynamic_update_slice of all three buffers at slot
def b2(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    got = fetch(states_lm, idx)
    q2 = 0.5 * q + 0.5 * got
    states = lax.dynamic_update_slice(states, q2[:, None, :], (0, slot, 0))
    states_lm = lax.dynamic_update_slice(states_lm, q2.T[:, None, :], (0, slot, 0))
    s2 = lax.dynamic_update_slice(s2, jnp.sum(q2 * q2, 0)[None, :], (slot, 0))
    return (q2, states, states_lm, s2, slot + 1)


# 3: TWO chained NN+gathers + updates (the solver pattern)
def b3(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    got = fetch(states_lm, idx)
    q1 = 0.5 * q + 0.5 * got
    idx2 = nearest(s2, states, q1)
    got2 = fetch(states_lm, idx2)
    q2 = 0.5 * q1 + 0.3 * got2
    states = lax.dynamic_update_slice(states, q2[:, None, :], (0, slot, 0))
    states_lm = lax.dynamic_update_slice(states_lm, q2.T[:, None, :], (0, slot, 0))
    s2 = lax.dynamic_update_slice(s2, jnp.sum(q2 * q2, 0)[None, :], (slot, 0))
    return (q2, states, states_lm, s2, slot + 1)


# 4: two NNs but the second's query does NOT depend on the first
def b4(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    got = fetch(states_lm, idx)
    idx2 = nearest(s2, states, q * 0.9)
    got2 = fetch(states_lm, idx2)
    q2 = 0.5 * q + 0.3 * got + 0.2 * got2
    states = lax.dynamic_update_slice(states, q2[:, None, :], (0, slot, 0))
    states_lm = lax.dynamic_update_slice(states_lm, q2.T[:, None, :], (0, slot, 0))
    s2 = lax.dynamic_update_slice(s2, jnp.sum(q2 * q2, 0)[None, :], (slot, 0))
    return (q2, states, states_lm, s2, slot + 1)


bench("1 NN+gather, const buffers", mk, b1)
bench("1 NN+gather + dyn updates", mk, b2)
bench("2 chained NN+gather + dyn updates", mk, b3)
bench("2 indep NN+gather + dyn updates", mk, b4)


# 5: single buffer (no lane-major mirror): gather via take_along_axis axis=1
def b5(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    got = jnp.take_along_axis(states, idx[None, :, None].T.reshape(1, 1, L), axis=1)[:, 0, :]
    q2 = 0.5 * q + 0.5 * got
    states = lax.dynamic_update_slice(states, q2[:, None, :], (0, slot, 0))
    s2 = lax.dynamic_update_slice(s2, jnp.sum(q2 * q2, 0)[None, :], (slot, 0))
    return (q2, states, states_lm, s2, slot + 1)


# 6: two indep NNs, single buffer, one contiguous 2-row update
def b6(i, c):
    q, states, states_lm, s2, slot = c
    idx = nearest(s2, states, q)
    idx2 = nearest(s2, states, q * 0.9)
    got = jnp.take_along_axis(states, idx[None, :, None].T.reshape(1, 1, L), axis=1)[:, 0, :]
    got2 = jnp.take_along_axis(states, idx2[None, :, None].T.reshape(1, 1, L), axis=1)[:, 0, :]
    q2 = 0.5 * q + 0.3 * got + 0.2 * got2
    rows = jnp.stack([q2, q2 * 0.99], axis=1)  # (D, 2, L)
    states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
    s2row = jnp.stack([jnp.sum(q2 * q2, 0), jnp.sum(q2 * q2, 0) * 0.99])
    s2 = lax.dynamic_update_slice(s2, s2row, (slot, 0))
    return (q2, states, states_lm, s2, slot + 2)


bench("1 NN, single buffer, dyn updates", mk, b5)
bench("2 indep NN, single buf, merged update", mk, b6)
