"""Independent correctness cross-check against the reference implementation.

Solves a sample of MBM problems per robot (Panda, UR5, Fetch — round 5
extended the oracle beyond Panda) plus a Panda sphere-cage configuration with
an end-effector attachment, with the vamp_tpu turbo planner (plus default
simplification), then feeds every solved path to the REFERENCE C++ edge
validator (tools/crosscheck/crosscheck_validate.cc compiled straight from
/root/reference headers) — the same role OMPL cross-validation plays in the
reference's own scripts (reference scripts/visualize_ompl.py, whose OMPL
stack is not available in this image; the reference itself is the stronger
oracle). Agreement claim: every path vamp_tpu reports as solved is accepted
by the reference's validate_motion at its own resolution semantics
(reference planning/validate.hh:24-75 per robot; validate.hh:43-44
dispatches fkcc_attach when attachments are present).

Runs on CPU (correctness only — no timing). Writes
benchmarks/crosscheck_results.json.

    python benchmarks/crosscheck.py --n 64
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

BIN = "/tmp/crosscheck_validate"
SRC = Path(__file__).resolve().parent.parent / "tools/crosscheck/crosscheck_validate.cc"

CAGE = np.array(
    [
        [0.55, 0, 0.25], [0.35, 0.35, 0.25], [0, 0.55, 0.25], [-0.55, 0, 0.25],
        [-0.35, -0.35, 0.25], [0, -0.55, 0.25], [0.35, -0.35, 0.25],
        [0.35, 0.35, 0.8], [0, 0.55, 0.8], [-0.35, 0.35, 0.8], [-0.55, 0, 0.8],
        [-0.35, -0.35, 0.8], [0, -0.55, 0.8], [0.35, -0.35, 0.8],
    ],
    np.float32,
)
START = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)
GOAL = np.array([2.35, 1.0, 0.0, -0.8, 0.0, 2.5, 0.785], np.float32)


def build_binary():
    cmd = [
        "g++", "-O2", "-march=native", "-std=c++17",
        "-I", "/root/reference/src/impl",
        "-I", str(SRC.parent.parent / "golden/stub"),
        str(SRC), "-o", BIN,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def solve_problems(robot, envs, starts, goals, max_iterations=4096, max_samples=11264):
    """Turbo solve + default simplify; returns (solved, paths, simp_paths)."""
    import jax
    import jax.numpy as jnp

    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import racing_samplers
    from vamp_tpu.env import max_class_counts
    from vamp_tpu.planners.rrtc_turbo import make_rrtc_turbo_batch
    from vamp_tpu.planners.simplify import make_simplify_batch
    from vamp_tpu.utils.settings import RRTCSettings, SimplifySettings

    spec = vamp.robot_module(robot).spec
    caps = max_class_counts(envs)
    packed = [e.pack(quantum=1, capacities=caps) for e in envs]
    envs_all = jax.tree.map(lambda *xs: jnp.stack(xs), *packed)
    L = len(envs)

    settings = RRTCSettings(
        range=vamp.ROBOT_RRT_RANGES.get(robot, 2.0),
        max_iterations=max_iterations, max_samples=max_samples,
    )
    solve = jax.jit(make_rrtc_turbo_batch(spec, settings, 1, 256))
    res = solve(
        jnp.asarray(np.stack(starts)), jnp.asarray(np.stack(goals))[:, None, :],
        jnp.ones((L, 1), bool), envs_all,
        racing_samplers(spec.dimension, L, np.zeros(L, np.int64)),
    )
    solved = np.asarray(res.solved)
    lens = np.asarray(res.path_length)
    paths = [np.asarray(res.path[i][: lens[i]]) for i in range(L)]

    simplify = jax.jit(
        make_simplify_batch(spec, SimplifySettings(), max_path=256, chunk_states=16)
    )
    plen = np.where(solved, lens, 2).astype(np.int32)
    sres = simplify(res.path, jnp.asarray(plen), envs_all)
    slens = np.asarray(sres.path_length)
    simp_paths = [np.asarray(sres.path[i][: slens[i]]) for i in range(L)]
    return solved, paths, simp_paths


def _mat_to_quat(R):
    """(3,3) proper rotation -> xyzw quaternion (float64, Shepperd)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        w = np.sqrt(1.0 + t) / 2.0
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 0.0)) * 2.0
        q = [0.0, 0.0, 0.0, 0.0]
        q[i] = s / 4.0
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        q[3] = (R[k, j] - R[j, k]) / s
        x, y, z, w = q[0], q[1], q[2], q[3]
    return np.array([x, y, z, w])


def dump_env(lines, e):
    att = getattr(e, "attachment", None)
    na = len(att.radii) if att is not None else 0
    lines.append(f"ENV {len(e.spheres)} {len(e.capsules)} {len(e.cuboids)} {na}")
    for o in e.spheres:
        c = [float(v) for v in np.asarray(o.center, np.float64)]
        lines.append(f"S {c[0]!r} {c[1]!r} {c[2]!r} {float(o.radius)!r}")
    for o in e.capsules:
        x1 = [float(v) for v in np.asarray(o.x1, np.float64)]
        xv = [float(v) for v in np.asarray(o.xv, np.float64)]
        lines.append(
            f"C {x1[0]!r} {x1[1]!r} {x1[2]!r} {xv[0]!r} {xv[1]!r} {xv[2]!r} {float(o.radius)!r}"
        )
    for o in e.cuboids:
        c = np.asarray(o.center, np.float64)
        a = np.asarray(o.axes, np.float64)
        h = np.asarray(o.half_extents, np.float64)
        vals = list(c) + list(a.reshape(-1)) + list(h)
        lines.append("B " + " ".join(repr(float(v)) for v in vals))
    if na:
        t = list(np.asarray(att.pos, np.float64)) + list(_mat_to_quat(att.rot))
        lines.append("T " + " ".join(repr(float(v)) for v in t))
        for c, r in zip(att.centers, att.radii):
            cc = [float(v) for v in np.asarray(c, np.float64)]
            lines.append(f"AS {cc[0]!r} {cc[1]!r} {cc[2]!r} {float(r)!r}")


def edge_margin(spec, env, path, edge, fk64, ee64=None):
    """Float64 min signed clearance of the rejected edge over the reference's
    exact check set (fractions j/(8n)); includes posed attachment spheres vs
    the environment when the env carries an attachment (attachment-vs-robot
    self checks are not re-derived here — flagged in the artifact note)."""
    import jax.numpy as jnp

    a, b = path[edge], path[edge + 1]
    d = float(np.linalg.norm((b - a).astype(np.float32)))
    n8 = max(int(np.ceil(np.float32(d) * spec.resolution / 8.0)), 1) * 8
    fr = np.arange(1, n8 + 1, dtype=np.float32) / np.float32(n8)
    qs = a[None] + fr[:, None] * (b - a)[None]
    xs, ys, zs = fk64(jnp.asarray(qs.T), None, None)
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    zs = np.asarray(zs, np.float64)
    rad = spec.sphere_radius.astype(np.float64)[:, None]

    att = getattr(env, "attachment", None)
    if att is not None and ee64 is not None:
        exyz, equat = ee64(qs)  # (n, 3), (n, 4) xyzw
        R = _quat_mats(np.asarray(equat, np.float64))
        t = np.asarray(exyz, np.float64)
        aR = np.asarray(att.rot, np.float64)
        ap = np.asarray(att.pos, np.float64)
        for c, r in zip(att.centers, att.radii):
            loc = aR @ np.asarray(c, np.float64) + ap
            w = np.einsum("nij,j->ni", R, loc) + t  # (n, 3)
            xs = np.concatenate([xs, w[None, :, 0]])
            ys = np.concatenate([ys, w[None, :, 1]])
            zs = np.concatenate([zs, w[None, :, 2]])
            rad = np.concatenate([rad, np.full((1, 1), float(r))])

    worst = np.inf
    for o in env.spheres:
        c = np.asarray(o.center, np.float64)
        dd = np.sqrt((xs - c[0]) ** 2 + (ys - c[1]) ** 2 + (zs - c[2]) ** 2) - rad - o.radius
        worst = min(worst, float(dd.min()))
    for o in env.capsules:
        x1 = np.asarray(o.x1, np.float64)
        xv = np.asarray(o.xv, np.float64)
        t = np.clip(
            ((xs - x1[0]) * xv[0] + (ys - x1[1]) * xv[1] + (zs - x1[2]) * xv[2])
            / np.dot(xv, xv), 0, 1,
        )
        dd = np.sqrt(
            (xs - x1[0] - t * xv[0]) ** 2 + (ys - x1[1] - t * xv[1]) ** 2
            + (zs - x1[2] - t * xv[2]) ** 2
        ) - rad - o.radius
        worst = min(worst, float(dd.min()))
    for o in env.cuboids:
        c = np.asarray(o.center, np.float64)
        ax = np.asarray(o.axes, np.float64)
        h = np.asarray(o.half_extents, np.float64)
        dx, dy, dz = xs - c[0], ys - c[1], zs - c[2]
        sq = 0.0
        for k in range(3):
            pr = dx * ax[k, 0] + dy * ax[k, 1] + dz * ax[k, 2]
            sq = sq + np.maximum(np.abs(pr) - h[k], 0.0) ** 2
        worst = min(worst, float((np.sqrt(sq) - rad).min()))
    return worst


def _quat_mats(q):
    """(n, 4) xyzw -> (n, 3, 3) rotation matrices (float64)."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], 1)


def run_section(robot, n, attach=False, seed=7):
    """Solve + oracle-validate one section; returns the stats dict."""
    import jax.numpy as jnp  # noqa: F401  (jax initialized by caller)

    import vamp_tpu as vamp
    from benchmarks.evaluate_mbm import load_problems
    from vamp_tpu.ops.fkcc_bm import make_sphere_fk_bm

    spec = vamp.robot_module(robot).spec
    rng = np.random.default_rng(seed)

    if attach:
        from vamp_tpu.env import Environment, Sphere

        envs, starts, goals = [], [], []
        for _ in range(n):
            e = Environment()
            for c in CAGE + rng.uniform(-0.01, 0.01, CAGE.shape).astype(np.float32):
                e.add_sphere(Sphere(c, 0.15))
            att = vamp.Attachment.from_quat([0.0, 0.0, 0.12], [0.0, 0.0, 0.0, 1.0])
            att.add_sphere([0.0, 0.0, 0.0], 0.05)
            e.attach(att)
            envs.append(e)
            starts.append(START)
            goals.append(GOAL)
    else:
        import jax

        from vamp_tpu.ops.fkcc import make_fkcc

        problems = load_problems(robot)
        picks = rng.choice(len(problems), size=n, replace=False)
        envs = [vamp.problem_dict_to_vamp(problems[pi]) for pi in picks]
        starts = [np.asarray(problems[pi]["start"], np.float32) for pi in picks]
        goals = [np.asarray(problems[pi]["goals"][0], np.float32) for pi in picks]
        # Valid-problem filter, matching the reference harness's data['valid']
        # skip (reference scripts/evaluate_mbm.py:71-73): a problem whose goal
        # (or start) is itself in collision is excluded from the dataset's
        # scoring. Without this, the planner can legally grow edges OUT OF a
        # colliding goal node — the reference check set j/(8n), j>=1 never
        # re-checks a tree node — and the oracle then rejects the final edge
        # INTO it (this was every round-5 UR5 "disagreement": 7/7 had
        # goal_free=False).
        fkcc = jax.jit(make_fkcc(vamp.robot_module(robot).spec))
        keep = []
        for k in range(len(envs)):
            pe = envs[k].pack()
            ok = bool(fkcc(jnp.asarray(starts[k][None]), pe)[0]) and bool(
                fkcc(jnp.asarray(goals[k][None]), pe)[0]
            )
            if ok:
                keep.append(k)
        n_invalid = len(envs) - len(keep)
        envs = [envs[k] for k in keep]
        starts = [starts[k] for k in keep]
        goals = [goals[k] for k in keep]

    solved, paths, simp_paths = solve_problems(robot, envs, starts, goals)

    lines = [f"ROBOT {robot}"]
    order = []
    for i in range(len(envs)):
        if not solved[i]:
            continue
        dump_env(lines, envs[i])
        for which, p in (("initial", paths[i]), ("simplified", simp_paths[i])):
            lines.append(f"PATH {len(p)}")
            for q in p:
                lines.append(" ".join(repr(float(v)) for v in q))
            order.append((int(i), which))

    payload = "\n".join(lines) + "\n"
    proc = subprocess.run([BIN], input=payload, capture_output=True, text=True, check=True)
    verdicts = {}
    for line in proc.stdout.strip().splitlines():
        k, ok, bad = line.split()
        verdicts[int(k)] = (int(ok), int(bad))
    agree = sum(1 for k in verdicts if verdicts[k][0] == 1)

    fk64 = make_sphere_fk_bm(spec)  # poly trig = reference math
    ee64 = None
    if attach:
        module = vamp.robot_module(robot)

        def ee64(qs):
            out = np.stack([np.asarray(module.eefk(q), np.float64) for q in qs])
            return out[:, :3], out[:, 3:]

    disagreements = [
        dict(
            problem=order[k][0],
            path=order[k][1],
            first_bad_edge=verdicts[k][1],
            float64_min_clearance_m=round(
                edge_margin(
                    spec, envs[order[k][0]],
                    (paths if order[k][1] == "initial" else simp_paths)[order[k][0]],
                    verdicts[k][1], fk64, ee64,
                ), 9,
            ),
        )
        for k in verdicts
        if verdicts[k][0] == 0
    ]
    return {
        "n_problems": int(n),
        "invalid_excluded": int(0 if attach else n_invalid),
        "solved": int(solved.sum()),
        "paths_checked": len(verdicts),
        "reference_accepts": agree,
        "agreement": round(agree / max(len(verdicts), 1), 4),
        "disagreements": disagreements,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--n_attach", type=int, default=16)
    ap.add_argument("--robots", nargs="*", default=["panda", "ur5", "fetch"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    build_binary()
    out = {
        "oracle": "reference validate_motion<Robot,8,32> compiled from /root/reference "
                  "(Robot in {PandaBase<0,0,0>, UR5, Fetch}; validate.hh:43-44 attachment dispatch)",
        "note": "Each disagreement carries its float64 minimum signed clearance over the reference's exact check set. Positive: collision-free in exact arithmetic, rejected by the reference's f32 fast-math by ulps. Negative: a sub-millimetre contact that lies BETWEEN check states of one grid - the two implementations' f32 edge lengths can differ by ulps, flipping n = ceil(dist*res/8) at a boundary and shifting every check fraction j/(8n); contacts thinner than the resolution-32 sampling spacing are then sampled by one grid and missed by the other, in either direction. Both implementations accept/reject such paths only up to the resolution-32 contract; neither grid dominates the other. Attachment-run clearance analysis covers robot+attachment spheres vs environment (not attachment-vs-robot self pairs).",
        "sections": {},
    }
    for robot in args.robots:
        print(f"== {robot} ({args.n} problems)")
        out["sections"][robot] = run_section(robot, args.n)
        print(json.dumps(out["sections"][robot], indent=1))
    if args.n_attach:
        print(f"== panda_attach ({args.n_attach} cage trials, attached sphere)")
        out["sections"]["panda_attach"] = run_section("panda", args.n_attach, attach=True)
        print(json.dumps(out["sections"]["panda_attach"], indent=1))

    path = Path(__file__).resolve().parent / "crosscheck_results.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
