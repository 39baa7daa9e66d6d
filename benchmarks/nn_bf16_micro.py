"""Round-5 NN-sweep formulation shootout on the axon device.

The NN phase of the turbo step (dot over the (dim, N, L) states buffer +
sentinel-norm argmin, planners/rrtc_turbo.py) is the second-largest per-step
term in deep waves (~69 us at N=4096, L=320; step_profile_results.json).
This measures candidate reformulations IN THE REAL LOOP PATTERN (buffers
dynamically updated every step so mirror-maintenance cost is included):

  f32_elemwise   — current production formulation
  bf16_elemwise  — bf16 mirrors of states+norms, elementwise ops in bf16
  bf16_matmul    — augmented-state dot_general: ONE matmul computes both
                   trees' (s2 - 2 s.q) surfaces from a bf16 (dim+2, N, L)
                   mirror with f32 accumulation (MXU path; cancellation
                   stays f32, only coordinate rounding is bf16)
  f32_matmul     — same dot_general shape in f32 (op-count effect alone)
  bf16_dot_only  — bf16 states mirror for the dot (f32 accumulate), f32
                   sentinel norms (halves the big read, keeps norms exact)

Run: python benchmarks/nn_bf16_micro.py [N L]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

D = 7
STEPS = 256
BF = jnp.bfloat16


def bench(name, init, body, steps=STEPS):
    @jax.jit
    def run(c0):
        out = lax.fori_loop(0, steps, body, c0)
        # reduce ON DEVICE: fetching a big buffer through the tunnel would
        # dominate the measurement (host<->device bytes are not free here)
        return jnp.sum(out[-2].astype(jnp.float32))  # q is second-to-last

    c0 = init()
    float(run(c0))  # compile+warm
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(c0))
        best = min(best, (time.perf_counter() - t0) / steps * 1e6)
    print(f"{name:20s} {best:9.1f} us/step")
    return best


def main(N=4096, L=320):
    rng = np.random.RandomState(0)
    print(f"N={N} L={L} D={D} steps={STEPS}")
    states0 = rng.rand(D, N, L).astype(np.float32)
    s2ab0 = np.sum(states0 * states0, axis=0)[None].repeat(2, 0).astype(np.float32)
    q0 = rng.rand(D, L).astype(np.float32)
    results = {}

    # ---- A: current production formulation --------------------------------
    def init_a():
        return (jnp.asarray(states0), jnp.asarray(s2ab0), jnp.asarray(q0),
                jnp.int32(3))

    def body_a(i, c):
        states, s2ab, q, slot = c
        dot = jnp.sum(states * q[:, None, :], axis=0)
        q2 = jnp.sum(q * q, axis=0)
        sq = s2ab - 2.0 * dot[None] + q2[None, None, :]
        args2 = jnp.argmin(sq, axis=1).astype(jnp.int32)
        got = jnp.take_along_axis(
            states, jnp.broadcast_to(args2[None], (D, 2, L)), axis=1)
        new = 0.5 * (got[:, 0] + q)
        rows = jnp.stack([new, got[:, 1]], axis=1)
        states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
        n2 = jnp.sum(rows * rows, axis=0)
        s2ab = lax.dynamic_update_slice(s2ab, n2[None], (0, slot, 0))
        q = new * 0.99
        return states, s2ab, q, slot + 2

    results["f32_elemwise"] = bench("f32_elemwise", init_a, body_a)

    # ---- B: full bf16 elementwise -----------------------------------------
    def init_b():
        return (jnp.asarray(states0), jnp.asarray(states0, BF),
                jnp.asarray(s2ab0, BF), jnp.asarray(q0), jnp.int32(3))

    def body_b(i, c):
        states, states_bf, s2_bf, q, slot = c
        qb = q.astype(BF)
        dot = jnp.sum(states_bf * qb[:, None, :], axis=0)
        sq = s2_bf - 2.0 * dot[None]
        args2 = jnp.argmin(sq, axis=1).astype(jnp.int32)
        got = jnp.take_along_axis(
            states, jnp.broadcast_to(args2[None], (D, 2, L)), axis=1)
        new = 0.5 * (got[:, 0] + q)
        rows = jnp.stack([new, got[:, 1]], axis=1)
        states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
        states_bf = lax.dynamic_update_slice(states_bf, rows.astype(BF), (0, slot, 0))
        n2 = jnp.sum(rows * rows, axis=0)
        s2_bf = lax.dynamic_update_slice(s2_bf, n2[None].astype(BF), (0, slot, 0))
        q = new * 0.99
        return states, states_bf, s2_bf, q, slot + 2

    results["bf16_elemwise"] = bench("bf16_elemwise", init_b, body_b)

    # ---- C: augmented bf16 matmul (one dot_general for both trees) --------
    # aug (D+2, N, L): rows 0..D-1 = states, row D = s2 tree A, D+1 = s2 tree B
    # w (2, D+2, L): [-2q; 1; 0] and [-2q; 0; 1]  ->  m (2, N, L) f32
    def init_c():
        aug = np.concatenate([states0, s2ab0], axis=0)
        return (jnp.asarray(states0), jnp.asarray(aug, BF), jnp.asarray(q0),
                jnp.int32(3))

    def body_c(i, c):
        states, aug_bf, q, slot = c
        e = jnp.eye(2, dtype=BF)[:, :, None]
        w = jnp.concatenate(
            [jnp.broadcast_to((-2.0 * q).astype(BF)[None], (2, D, L)),
             jnp.broadcast_to(e, (2, 2, L))], axis=1)  # (2, D+2, L)
        m = lax.dot_general(
            w, aug_bf,
            dimension_numbers=(((1,), (0,)), ((2,), (2,))),
            preferred_element_type=jnp.float32,
        )  # (L, 2, N)
        args2 = jnp.argmin(m, axis=2).astype(jnp.int32).T  # (2, L)
        got = jnp.take_along_axis(
            states, jnp.broadcast_to(args2[None], (D, 2, L)), axis=1)
        new = 0.5 * (got[:, 0] + q)
        rows = jnp.stack([new, got[:, 1]], axis=1)
        states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
        n2 = jnp.sum(rows * rows, axis=0)
        aug_rows = jnp.concatenate([rows, jnp.stack([n2, n2], 0)], axis=0)
        aug_bf = lax.dynamic_update_slice(aug_bf, aug_rows.astype(BF), (0, slot, 0))
        q = new * 0.99
        return states, aug_bf, q, slot + 2

    results["bf16_matmul"] = bench("bf16_matmul", init_c, body_c)

    # ---- D: same matmul in f32 --------------------------------------------
    def init_d():
        aug = np.concatenate([states0, s2ab0], axis=0)
        return (jnp.asarray(states0), jnp.asarray(aug), jnp.asarray(q0),
                jnp.int32(3))

    def body_d(i, c):
        states, aug, q, slot = c
        e = jnp.eye(2, dtype=jnp.float32)[:, :, None]
        w = jnp.concatenate(
            [jnp.broadcast_to((-2.0 * q)[None], (2, D, L)),
             jnp.broadcast_to(e, (2, 2, L))], axis=1)
        m = lax.dot_general(
            w, aug, dimension_numbers=(((1,), (0,)), ((2,), (2,))),
            preferred_element_type=jnp.float32)
        args2 = jnp.argmin(m, axis=2).astype(jnp.int32).T
        got = jnp.take_along_axis(
            states, jnp.broadcast_to(args2[None], (D, 2, L)), axis=1)
        new = 0.5 * (got[:, 0] + q)
        rows = jnp.stack([new, got[:, 1]], axis=1)
        states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
        n2 = jnp.sum(rows * rows, axis=0)
        aug_rows = jnp.concatenate([rows, jnp.stack([n2, n2], 0)], axis=0)
        aug = lax.dynamic_update_slice(aug, aug_rows, (0, slot, 0))
        q = new * 0.99
        return states, aug, q, slot + 2

    results["f32_matmul"] = bench("f32_matmul", init_d, body_d)

    # ---- E: bf16 dot only, f32 norms --------------------------------------
    def init_e():
        return (jnp.asarray(states0), jnp.asarray(states0, BF),
                jnp.asarray(s2ab0), jnp.asarray(q0), jnp.int32(3))

    def body_e(i, c):
        states, states_bf, s2ab, q, slot = c
        dot = lax.dot_general(
            q.astype(BF)[None], states_bf,
            dimension_numbers=(((1,), (0,)), ((2,), (2,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :].T  # (N, L)
        sq = s2ab - 2.0 * dot[None]
        args2 = jnp.argmin(sq, axis=1).astype(jnp.int32)
        got = jnp.take_along_axis(
            states, jnp.broadcast_to(args2[None], (D, 2, L)), axis=1)
        new = 0.5 * (got[:, 0] + q)
        rows = jnp.stack([new, got[:, 1]], axis=1)
        states = lax.dynamic_update_slice(states, rows, (0, slot, 0))
        states_bf = lax.dynamic_update_slice(states_bf, rows.astype(BF), (0, slot, 0))
        n2 = jnp.sum(rows * rows, axis=0)
        s2ab = lax.dynamic_update_slice(s2ab, n2[None], (0, slot, 0))
        q = new * 0.99
        return states, states_bf, s2ab, q, slot + 2

    results["bf16_dot_only"] = bench("bf16_dot_only", init_e, body_e)
    return results


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    main(N, L)
