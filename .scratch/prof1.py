import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pathlib import Path
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from benchmarks.evaluate_mbm import load_problems
import vamp_tpu as vamp
from vamp_tpu.planners.rrtc import make_rrtc_batch
from vamp_tpu.samplers.halton import halton_init_batch
from vamp_tpu.utils.settings import RRTCSettings

module = vamp.robot_module("panda"); spec = module.spec; dim = spec.dimension
problems = load_problems("panda", None)
caps = {"spheres": 0, "capsules": 0, "cuboids": 0}
envs_list, starts, goals = [], [], []
for p in problems:
    e = vamp.problem_dict_to_vamp(p)
    caps["spheres"] = max(caps["spheres"], -(-len(e.spheres)//8)*8)
    caps["capsules"] = max(caps["capsules"], -(-len(e.capsules)//8)*8)
    caps["cuboids"] = max(caps["cuboids"], -(-len(e.cuboids)//8)*8)
print("caps:", caps)
for p in problems:
    e = vamp.problem_dict_to_vamp(p)
    envs_list.append(e.pack(capacities=caps))
    starts.append(np.asarray(p["start"], np.float32))
    goals.append(np.asarray(p["goals"][0], np.float32))
envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
starts = np.stack(starts); goals = np.stack(goals)
N = len(problems)

def timed_solve(L, max_iter, max_samp, iters_pair):
    idx = np.arange(L) % N
    envs_w = jax.tree.map(lambda x: x[idx], envs_all)
    out = {}
    for mi in iters_pair:
        settings = RRTCSettings(range=vamp.ROBOT_RRT_RANGES.get("panda",2.0), max_iterations=mi, max_samples=max_samp)
        solve = jax.jit(make_rrtc_batch(spec, settings, n_goals=1, max_path=256))
        args = (jnp.asarray(starts[idx]), jnp.asarray(goals[idx])[:,None,:], jnp.ones((L,1),bool), envs_w, halton_init_batch(dim,L))
        r = solve(*args); r.solved.block_until_ready()
        t = time.perf_counter(); r = solve(*args); r.solved.block_until_ready(); dt = time.perf_counter()-t
        out[mi] = (dt, int(np.asarray(r.solved).sum()))
    (m1,(t1,s1)),(m2,(t2,s2)) = sorted(out.items())
    print(f"L={L} samp={max_samp}: iter{m1}={t1*1e3:.1f}ms iter{m2}={t2*1e3:.1f}ms -> {(t2-t1)/(m2-m1)*1e6:.1f}us/step (solved {s1},{s2})")

print("range:", vamp.ROBOT_RRT_RANGES.get("panda"))
timed_solve(1024, 100, 2048, (50,100))
timed_solve(64, 400, 8192, (200,400))
timed_solve(64, 400, 2048, (200,400))
