"""FCIT* anytime cost-convergence on UR5/Fetch MBM (BASELINE config).

For a sample of MBM problems per robot, runs FCIT* in anytime mode
(optimize=True) on fixed Halton streams and records the validated
cost-after-each-sampling-round trace (FCITResult.cost_trace), plus the
RRTC+simplify cost on the same problems for context. The reference harness
simplifies EVERY planner's result (/root/reference/scripts/evaluate_mbm.py:
101-104), so the headline comparison is FCIT*+simplify vs RRTC+simplify.

Crash isolation (--subproc, default on): the axon tunnel's TPU worker
intermittently dies on large k-NN FCIT programs ("kernel fault"; the same
program usually succeeds on retry), so each lane chunk runs in its OWN
python subprocess — a crashed chunk wedges only that process, the parent
waits out the tunnel recovery and retries (at most `--retries` times) before
recording the chunk as failed. The parent never touches the device.

    python benchmarks/fcit_convergence.py --robots ur5 fetch --n 64
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def _picks(robot: str, n: int):
    from benchmarks.evaluate_mbm import load_problems

    problems = load_problems(robot)
    rng = np.random.default_rng(1)
    return problems, rng.choice(
        len(problems), size=min(n, len(problems)), replace=False
    )


def _setup(robot, ids):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vamp_tpu as vamp
    from vamp_tpu.env import max_class_counts

    spec = vamp.robot_module(robot).spec
    problems, picks = _picks(robot, 10 ** 9)
    chosen = [problems[i] for i in ids]
    # suite-wide caps: every chunk gets identical env shapes -> one compiled
    # executable shared via the persistent jax cache across worker processes
    caps = max_class_counts([vamp.problem_dict_to_vamp(p) for p in problems])
    envs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[vamp.problem_dict_to_vamp(p).pack(quantum=1, capacities=caps) for p in chosen],
    )
    starts = jnp.asarray(np.stack([p["start"] for p in chosen]).astype(np.float32))
    goals = jnp.asarray(np.stack([p["goals"][0] for p in chosen]).astype(np.float32))
    return vamp, spec, envs, starts, goals


def worker_fcit(robot: str, ids, rounds: int, batch: int, out_path: str):
    """One lane chunk of FCIT* + simplify; device work."""
    import jax
    import jax.numpy as jnp

    from benchmarks.evaluate_mbm import racing_samplers
    from vamp_tpu.planners.fcit import make_fcit_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import RoadmapSettings, SimplifySettings

    vamp, spec, envs, starts, goals = _setup(robot, ids)
    L = len(ids)
    rset = RoadmapSettings(
        max_iterations=rounds,
        max_samples=1 + 1 + rounds * batch,
        batch_size=batch,
        optimize=True,
    )
    fc = jax.jit(make_fcit_batch(spec, rset, n_goals=1, max_path=64))
    simp = jax.jit(make_simplify_batch(spec, SimplifySettings(), 256, 16))
    fr = fc(starts, goals[:, None, :], jnp.ones((L, 1), bool), envs,
            racing_samplers(spec.dimension, L, np.zeros(L, np.int64)))
    trace = np.asarray(fr.cost_trace)[:, :rounds]
    fpath = jnp.pad(fr.path, ((0, 0), (0, 256 - fr.path.shape[1]), (0, 0)))
    fsp = simp(fpath, jnp.maximum(fr.path_length, 2), envs)
    Path(out_path).write_text(json.dumps(dict(
        ids=[int(i) for i in ids],
        trace=[[float(v) if np.isfinite(v) else None for v in row] for row in trace],
        fcost=np.asarray(fr.cost).tolist(),
        fscost=np.asarray(fsp.cost).tolist(),
        fsolved=np.asarray(fr.solved).astype(int).tolist(),
        max_samples=int(rset.max_samples),
    )))


def worker_rrtc(robot: str, ids, out_path: str):
    """RRTC + simplify context on the same problems; device work."""
    import jax
    import jax.numpy as jnp

    from benchmarks.evaluate_mbm import racing_samplers
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import RRTCSettings, SimplifySettings

    vamp, spec, envs, starts, goals = _setup(robot, ids)
    L = len(ids)
    rs = RRTCSettings(
        range=vamp.ROBOT_RRT_RANGES.get(robot, 2.0),
        max_iterations=4096, max_samples=6144,
    )
    solve = jax.jit(make_rrtc_turbo_batch(spec, rs, 1, 256))
    simp = jax.jit(make_simplify_batch(spec, SimplifySettings(), 256, 16))
    rr = solve(starts, goals[:, None, :], jnp.ones((L, 1), bool), envs,
               racing_samplers(spec.dimension, L, np.zeros(L, np.int64)))
    sp = simp(rr.path, rr.path_length, envs)
    Path(out_path).write_text(json.dumps(dict(
        ids=[int(i) for i in ids],
        rcost=np.asarray(sp.cost).tolist(),
        rsolved=np.asarray(rr.solved).astype(int).tolist(),
    )))


def _spawn(args_list, retries: int, recover_s: float):
    """Run a worker subprocess; on crash wait out tunnel recovery and retry."""
    for attempt in range(retries + 1):
        rc = subprocess.run(
            [sys.executable, __file__] + args_list, cwd=str(REPO),
            timeout=3000,
        ).returncode
        if rc == 0:
            return True
        print(f"  worker crashed (rc={rc}), attempt {attempt + 1}/{retries + 1}; "
              f"waiting {recover_s:.0f}s for tunnel recovery")
        time.sleep(recover_s)
    return False


def run_robot(robot: str, n: int, rounds: int, batch: int, chunk: int = 4,
              retries: int = 2, recover_s: float = 180.0, tmp=None):
    problems, picks = _picks(robot, n)
    L = len(picks)
    tmpdir = Path(tmp or "/tmp/fcit_conv")
    tmpdir.mkdir(parents=True, exist_ok=True)

    trace = np.full((L, rounds), np.nan, np.float32)
    fcost = np.zeros(L, np.float32)
    fscost = np.zeros(L, np.float32)
    fsolved = np.zeros(L, bool)
    covered = np.zeros(L, bool)
    max_samples = None
    for c0 in range(0, L, chunk):
        sl = slice(c0, min(c0 + chunk, L))
        ids = [int(i) for i in picks[sl]]
        out = tmpdir / f"{robot}_fcit_{c0}.json"
        if out.exists():
            out.unlink()
        ok = _spawn(
            ["--worker", "fcit", "--robot", robot, "--ids",
             ",".join(map(str, ids)), "--rounds", str(rounds),
             "--batch", str(batch), "--out", str(out)],
            retries, recover_s,
        )
        if not ok or not out.exists():
            print(f"  chunk {c0}: FAILED after retries (recorded as unsolved)")
            continue
        d = json.loads(out.read_text())
        trace[sl] = np.asarray(
            [[np.inf if v is None else v for v in row] for row in d["trace"]],
            np.float32,
        )
        fcost[sl] = d["fcost"]
        fscost[sl] = d["fscost"]
        fsolved[sl] = np.asarray(d["fsolved"], bool)
        covered[sl] = True
        max_samples = d["max_samples"]
        print(f"  chunk {c0}: solved {int(np.asarray(d['fsolved']).sum())}/{len(ids)}")

    rout = tmpdir / f"{robot}_rrtc.json"
    if rout.exists():
        rout.unlink()
    rok = _spawn(
        ["--worker", "rrtc", "--robot", robot, "--ids",
         ",".join(str(int(i)) for i in picks), "--out", str(rout)],
        retries, recover_s,
    )
    if rok and rout.exists():
        d = json.loads(rout.read_text())
        rcost = np.asarray(d["rcost"], np.float32)
        rsolved = np.asarray(d["rsolved"], bool)
    else:
        rcost = np.zeros(L, np.float32)
        rsolved = np.zeros(L, bool)

    ft = np.where(np.isnan(trace), np.inf, trace)
    mono = all(np.all(np.diff(row[np.isfinite(row)]) <= 1e-4) for row in ft)
    both = fsolved & rsolved
    return dict(
        robot=robot,
        n=L,
        chunks_covered=int(covered.sum()),
        rounds=rounds,
        batch=batch,
        max_samples=max_samples,
        fcit_solved=int(fsolved.sum()),
        rrtc_solved=int(rsolved.sum()),
        trace_monotone=bool(mono),
        mean_fcit_final=float(fcost[fsolved].mean()) if fsolved.any() else None,
        mean_fcit_simplified=float(fscost[fsolved].mean()) if fsolved.any() else None,
        mean_rrtc_simplified=float(rcost[rsolved].mean()) if rsolved.any() else None,
        # planner+simplify vs planner+simplify (reference harness semantics,
        # /root/reference/scripts/evaluate_mbm.py:101-104)
        fcit_beats_simplified_frac=(
            float((fscost[both] <= rcost[both] + 1e-3).mean()) if both.any() else None
        ),
        fcit_raw_beats_simplified_frac=(
            float((fcost[both] <= rcost[both] + 1e-3).mean()) if both.any() else None
        ),
        traces=[[float(v) if np.isfinite(v) else None for v in row] for row in ft],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", nargs="*", default=["ur5", "fetch"])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--recover_s", type=float, default=180.0)
    # worker mode (internal): one device chunk per process
    ap.add_argument("--worker", choices=["fcit", "rrtc"], default=None)
    ap.add_argument("--robot", default=None)
    ap.add_argument("--ids", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.worker:
        ids = [int(s) for s in args.ids.split(",")]
        if args.worker == "fcit":
            worker_fcit(args.robot, ids, args.rounds, args.batch, args.out)
        else:
            worker_rrtc(args.robot, ids, args.out)
        return

    # merge with any existing artifact so single-robot reruns don't drop
    # the other robots' traces
    path = Path(__file__).resolve().parent / "fcit_convergence_results.json"
    out = json.loads(path.read_text()) if path.exists() else {}
    for r in args.robots:
        res = run_robot(r, args.n, args.rounds, args.batch, args.chunk,
                        args.retries, args.recover_s)
        out[r] = res
        print(
            f"{r}: fcit {res['fcit_solved']}/{res['n']} solved, monotone="
            f"{res['trace_monotone']}, mean fcit+simp {res['mean_fcit_simplified']} "
            f"vs rrtc+simplify {res['mean_rrtc_simplified']} "
            f"(fcit<=simplified on {res['fcit_beats_simplified_frac']})"
        )
        # write after EVERY robot: a wall-clock or tunnel cut must not
        # discard completed robots (the chunks already cost an hour each)
        path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
