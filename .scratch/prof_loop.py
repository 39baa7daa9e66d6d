import sys, time
sys.path.insert(0,"/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

@jax.jit
def loop_tiny(x, n):
    def body(c):
        i, x = c
        return i+1, x*1.0000001 + 0.1
    return jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), x))[1]

x = jnp.zeros((8,128), jnp.float32)
r = loop_tiny(x, 10); r.block_until_ready()
for n in (100, 1000, 2000):
    t = time.perf_counter(); loop_tiny(x, n).block_until_ready(); dt = time.perf_counter()-t
    print(f"tiny-body while_loop n={n}: {dt*1e3:.2f}ms -> {dt/n*1e6:.2f}us/iter")

@jax.jit
def loop_5ops(x, n):
    def body(c):
        i, x = c
        for _ in range(5):
            x = jnp.tanh(x) + 0.01
        return i+1, x
    return jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), x))[1]
x2 = jnp.zeros((32, 1024), jnp.float32)
r = loop_5ops(x2, 10); r.block_until_ready()
for n in (100, 1000):
    t = time.perf_counter(); loop_5ops(x2, n).block_until_ready(); dt = time.perf_counter()-t
    print(f"5-op body n={n}: {dt*1e3:.2f}ms -> {dt/n*1e6:.2f}us/iter")
