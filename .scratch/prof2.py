import sys, time
sys.path.insert(0,"/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from benchmarks.evaluate_mbm import load_problems
import vamp_tpu as vamp
import vamp_tpu.planners.rrtc as rrtc_mod
from vamp_tpu.samplers.halton import halton_init_batch
from vamp_tpu.utils.settings import RRTCSettings

module = vamp.robot_module("panda"); spec = module.spec; dim = 7
problems = load_problems("panda", None)
caps = {"spheres":0,"capsules":16,"cuboids":16}
envs_list, starts, goals = [], [], []
for p in problems:
    e = vamp.problem_dict_to_vamp(p)
    envs_list.append(e.pack(capacities=caps))
    starts.append(np.asarray(p["start"], np.float32)); goals.append(np.asarray(p["goals"][0], np.float32))
envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *envs_list)
starts = np.stack(starts); goals = np.stack(goals); NP = len(problems)

def run(L, max_samp, iters_pair, label):
    idx = np.arange(L) % NP
    envs_w = jax.tree.map(lambda x: x[idx], envs_all)
    ts = {}
    for mi in iters_pair:
        settings = RRTCSettings(range=1.0, max_iterations=mi, max_samples=max_samp)
        solve = jax.jit(rrtc_mod.make_rrtc_batch(spec, settings, n_goals=1, max_path=256))
        args = (jnp.asarray(starts[idx]), jnp.asarray(goals[idx])[:,None,:], jnp.ones((L,1),bool), envs_w, halton_init_batch(dim,L))
        r = solve(*args); r.solved.block_until_ready()
        t = time.perf_counter(); r = solve(*args); r.solved.block_until_ready(); dt = time.perf_counter()-t
        ts[mi] = (dt, int(np.asarray(r.solved).sum()))
    (m1,(t1,s1)),(m2,(t2,s2)) = sorted(ts.items())
    print(f"{label} L={L} N={max_samp}: {t1*1e3:.1f}/{t2*1e3:.1f}ms -> {(t2-t1)/(m2-m1)*1e6:.1f}us/iter (solved {s1},{s2})", flush=True)

run(1024, 2048, (50,100), "new-full")
# stub out fk+cc entirely: every edge reports valid
orig = rrtc_mod.make_fkcc_planner
rrtc_mod.make_fkcc_planner = lambda spec: (lambda q, envs, br=None, bp=None: jnp.ones(q.shape[1:], bool))
run(1024, 2048, (50,100), "no-fkcc")
rrtc_mod.make_fkcc_planner = orig
run(64, 2048, (200,400), "new-full")
