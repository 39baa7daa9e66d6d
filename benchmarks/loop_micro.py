"""Characterize axon relay costs with the caching traps avoided:
every timed call gets DIFFERENT input values (chained), sync via np.asarray.
Measures: per-call overhead, per-iteration loop cost, dynamic_update_slice
in-loop cost vs buffer size, donation effect."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def bench_call(name, f, make_arg, n=5):
    """Each call gets a fresh argument value; times each call separately."""
    f(make_arg(0))  # compile
    times = []
    for k in range(1, n + 1):
        a = make_arg(k)
        np.asarray(jax.tree.leaves(a)[0][..., :1])  # settle input upload
        t0 = time.perf_counter()
        r = f(a)
        np.asarray(jax.tree.leaves(r)[0][..., :1])
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] * 1e3
    print(f"{name:52s} {ms:9.2f} ms (median of {n})")
    return ms


x0 = np.ones((128, 128), np.float32)

bench_call("call x+1", jax.jit(lambda x: x + 1.0), lambda k: jnp.asarray(x0 + k))

for steps in (64, 256, 1024):
    f = jax.jit(lambda x, s=steps: lax.fori_loop(0, s, lambda i, c: c * 1.0001 + 1e-6, x))
    bench_call(f"fori {steps} steps elementwise", f, lambda k: jnp.asarray(x0 + k))

for shape in ((7, 512, 128), (7, 2048, 704), (7, 8192, 704)):
    big0 = np.ones(shape, np.float32)
    f = jax.jit(
        lambda b: lax.fori_loop(
            0,
            256,
            lambda i, c: lax.dynamic_update_slice(
                c, c[:, :2] * 0.5 + 0.1, (0, (i * 7) % (shape[1] - 2), 0)
            ),
            b,
        )
    )
    bench_call(f"fori 256 dyn_update {shape}", f, lambda k: jnp.asarray(big0 + k))

# donated variant
shape = (7, 2048, 704)
big0 = np.ones(shape, np.float32)
fdon = jax.jit(
    lambda b: lax.fori_loop(
        0,
        256,
        lambda i, c: lax.dynamic_update_slice(
            c, c[:, :2] * 0.5 + 0.1, (0, (i * 7) % (shape[1] - 2), 0)
        ),
        b,
    ),
    donate_argnums=0,
)
bench_call(f"fori 256 dyn_update {shape} donated", fdon, lambda k: jnp.asarray(big0 + k))

# static-index update for comparison (aliasing-friendly?)
fstat = jax.jit(
    lambda b: lax.fori_loop(
        0,
        256,
        lambda i, c: lax.dynamic_update_slice(c, c[:, :2] * 0.5 + 0.1, (0, 0, 0)),
        b,
    )
)
bench_call(f"fori 256 static-index update {shape}", fstat, lambda k: jnp.asarray(big0 + k))

# gather (take_along_axis) on carried buffer, no update
fgath = jax.jit(
    lambda b: lax.fori_loop(
        0,
        256,
        lambda i, c: c.at[:, 0, 0].set(
            jnp.take_along_axis(
                c, jnp.full((7, 1, shape[2]), (i * 11) % shape[1], jnp.int32), axis=1
            )[:, 0, 0]
        ),
        b,
    )
)
bench_call(f"fori 256 gather+tiny-update {shape}", fgath, lambda k: jnp.asarray(big0 + k))
