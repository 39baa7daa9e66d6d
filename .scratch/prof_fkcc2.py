import sys, time
sys.path.insert(0,"/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from benchmarks.evaluate_mbm import load_problems
import vamp_tpu as vamp
from vamp_tpu.ops.fkcc_bm import make_fkcc_planner

module = vamp.robot_module("panda"); spec = module.spec

def bench(sets, caps, L, T, label):
    problems = load_problems("panda", sets)
    envs_list = []
    for i in range(L):
        e = vamp.problem_dict_to_vamp(problems[i % len(problems)])
        envs_list.append(e.pack(capacities=caps))
    envs = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    fkcc = jax.jit(make_fkcc_planner(spec))
    q = jnp.zeros((7, T, L), jnp.float32)
    r = fkcc(q, envs, None, None); r.block_until_ready()
    n_rep = 50
    t = time.perf_counter()
    for _ in range(n_rep): r = fkcc(q, envs, None, None)
    r.block_until_ready()
    dt = (time.perf_counter()-t)/n_rep
    print(f"{label}: L={L} T={T}: {dt*1e6:.1f}us/call, {T*L/dt/1e6:.1f}M states/s")

full = {"spheres":0,"capsules":16,"cuboids":16}
bench(None, full, 64, 32, "full-smallL64")
bench(None, full, 128, 32, "full-L128")
bench(None, full, 256, 32, "full-L256")
bench(["cage"], {"spheres":0,"capsules":0,"cuboids":8}, 1024, 32, "cage-caps-L1024")
bench(["cage"], {"spheres":0,"capsules":0,"cuboids":8}, 128, 32, "cage-caps-L128")

# NN-sweep-like cost: masked argmin over (dim, N, L) in chunks
def bench_nn(N, L, chunks_live):
    states = jnp.zeros((7, N, L), jnp.float32)
    q = jnp.zeros((7, L))
    mask = jnp.ones((N, L), bool)
    CH = 256
    @jax.jit
    def nn(states, mask, q, bound):
        n_chunks = (bound + CH - 1)//CH
        def chunk(c):
            ci, best = c
            blk = jax.lax.dynamic_slice(states, (0, ci*CH, 0), (7, CH, L))
            mblk = jax.lax.dynamic_slice(mask, (ci*CH, 0), (CH, L))
            d = blk - q[:, None, :]
            sq = jnp.where(mblk, jnp.sum(d*d, axis=0), 3.4e38)
            return ci+1, jnp.minimum(best, jnp.min(sq, axis=0))
        return jax.lax.while_loop(lambda c: c[0] < n_chunks, chunk, (jnp.int32(0), jnp.full((L,), 3.4e38)))[1]
    bound = jnp.int32(chunks_live*CH)
    r = nn(states, mask, q, bound); r.block_until_ready()
    t = time.perf_counter()
    for _ in range(50): r = nn(states, mask, q, bound)
    r.block_until_ready()
    dt = (time.perf_counter()-t)/50
    print(f"nn N={N} L={L} live={chunks_live*CH}: {dt*1e6:.1f}us/sweep")

bench_nn(2048, 1024, 4)
bench_nn(2048, 1024, 8)
bench_nn(8192, 64, 16)
bench_nn(8192, 64, 32)
