import sys, time
sys.path.insert(0,"/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from benchmarks.evaluate_mbm import load_problems
import vamp_tpu as vamp
from vamp_tpu.ops.fkcc_bm import make_fkcc_planner

module = vamp.robot_module("panda"); spec = module.spec
problems = load_problems("panda", None)

def bench(caps, L, T, label):
    envs_list = []
    for p in [problems[i % len(problems)] for i in range(L)]:
        e = vamp.problem_dict_to_vamp(p)
        envs_list.append(e.pack(capacities=caps))
    envs = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
    fkcc = jax.jit(make_fkcc_planner(spec))
    q = jnp.zeros((7, T, L), jnp.float32)
    r = fkcc(q, envs, None, None); r.block_until_ready()
    n_rep = 50
    t = time.perf_counter()
    for _ in range(n_rep):
        r = fkcc(q, envs, None, None)
    r.block_until_ready()
    dt = (time.perf_counter()-t)/n_rep
    states = T*L
    print(f"{label}: L={L} T={T} caps={caps}: {dt*1e6:.1f}us/call, {states/dt/1e6:.1f}M states/s")

bench({"spheres":0,"capsules":16,"cuboids":16}, 1024, 32, "wave0-caps")
bench({"spheres":0,"capsules":0,"cuboids":8}, 1024, 32, "cage-caps")
bench({"spheres":0,"capsules":16,"cuboids":16}, 64, 32, "smallL")
bench({"spheres":0,"capsules":16,"cuboids":16}, 128, 32, "L128")
