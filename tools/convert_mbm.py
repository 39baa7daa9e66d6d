"""Convert MotionBenchMaker problem tarballs (MoveIt YAML scenes) into the
pickled problem-dict format the benchmark harness consumes.

Reimplementation of the reference's resources/problem_tar_to_pkl_json.py
conversion (same output schema) with a small numpy transform helper instead
of the vendored transformations library. Run from the repo root:

    python tools/convert_mbm.py --robot panda

Reads  $VAMP_TPU_RESOURCES/<robot>/problems.tar.bz2
Writes benchmarks/data/<robot>_problems.pkl.gz
"""

import gzip
import os
import pickle
import re
import sys
import tarfile
from collections import defaultdict
from pathlib import Path

import numpy as np
import yaml

try:
    from yaml import CSafeLoader as Loader
except ImportError:
    from yaml import SafeLoader as Loader

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vamp_tpu.robots.descriptions import ROBOT_JOINTS

RESOURCES = Path(os.environ.get("VAMP_TPU_RESOURCES", "/root/reference/resources"))
OUT_DIR = Path(__file__).resolve().parent.parent / "benchmarks" / "data"


def quat_to_matrix(q):
    """(x, y, z, w) -> 4x4 homogeneous rotation."""
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    if n < 1e-12:
        return np.eye(4)
    x, y, z, w = x / n, y / n, z / n, w / n
    m = np.eye(4)
    m[:3, :3] = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    return m


def matrix_to_quat(m):
    """4x4 -> (x, y, z, w)."""
    R = m[:3, :3]
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
        q = [0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = q
    return [x, y, z, w]


def matrix_to_euler_xyz(m):
    """4x4 -> extrinsic xyz euler ('sxyz'), matching transformations.py."""
    R = m[:3, :3]
    cy = np.hypot(R[0, 0], R[1, 0])
    if cy > 1e-8:
        ax = np.arctan2(R[2, 1], R[2, 2])
        ay = np.arctan2(-R[2, 0], cy)
        az = np.arctan2(R[1, 0], R[0, 0])
    else:
        ax = np.arctan2(-R[1, 2], R[1, 1])
        ay = np.arctan2(-R[2, 0], cy)
        az = 0.0
    return [float(ax), float(ay), float(az)]


def transform_from_yaml(tf):
    m = quat_to_matrix(tf["orientation"])
    m[:3, 3] = tf["position"]
    return m


def load_scene(data):
    objects = {"sphere": [], "cylinder": [], "box": []}
    for co in data["world"]["collision_objects"]:
        obj = {"name": co["id"]}
        base = np.eye(4) if "pose" not in co else transform_from_yaml(co["pose"])
        primitive = co["primitives"][0]
        pose = base @ transform_from_yaml(co["primitive_poses"][0])

        t = primitive["type"]
        if t == "sphere":
            obj["radius"] = primitive["dimensions"][0]
        elif t == "cylinder":
            obj["length"] = primitive["dimensions"][0]
            obj["radius"] = primitive["dimensions"][1]
        elif t == "box":
            obj["half_extents"] = [d / 2 for d in primitive["dimensions"]]
        else:
            raise RuntimeError(f"invalid primitive type {t}")

        obj["position"] = pose[:3, 3].tolist()
        obj["orientation_euler_xyz"] = matrix_to_euler_xyz(pose)
        obj["orientation_quat_xyzw"] = matrix_to_quat(pose)
        objects[t].append(obj)
    return objects


def load_request(data, joints):
    js = data["start_state"]["joint_state"]
    start = [js["position"][js["name"].index(j)] for j in joints]
    jc = data["goal_constraints"][0]["joint_constraints"]
    jgn = [e["joint_name"] for e in jc]
    jgp = [e["position"] for e in jc]
    goal = [jgp[jgn.index(j)] for j in joints]
    return {"start": start, "goals": [goal]}


def main(robot: str = "panda"):
    joints = ROBOT_JOINTS[robot]
    scenes = defaultdict(list)
    requests = defaultdict(list)
    tar = tarfile.open(RESOURCES / robot / "problems.tar.bz2", "r:bz2")
    for member in tar.getmembers():
        if not member.isfile():
            continue
        f = tar.extractfile(member)
        _, problem, filename = member.name.split("/")
        problem = problem.replace(f"_{robot}", "")
        data = yaml.load(f.read(), Loader=Loader)
        index = int(re.findall(r"\d+", filename)[0])
        meta = {"index": index, "problem": problem}
        if "scene" in filename:
            scenes[problem].append(load_scene(data) | meta)
        elif "request" in filename:
            requests[problem].append(load_request(data, joints) | meta)

    out = {"robot": robot, "joints": joints, "problems": {}}
    for k in scenes:
        out["problems"][k] = [
            {**s, **r}
            for (s, r) in zip(
                sorted(scenes[k], key=lambda e: e["index"]),
                sorted(requests[k], key=lambda e: e["index"]),
            )
        ]

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    path = OUT_DIR / f"{robot}_problems.pkl.gz"
    with gzip.open(path, "wb") as f:
        pickle.dump(out, f)
    total = sum(len(v) for v in out["problems"].values())
    print(f"{robot}: {total} problems in {len(out['problems'])} sets -> {path}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="panda")
    args = ap.parse_args()
    if args.robot == "all":
        for r in ROBOT_JOINTS:
            main(r)
    else:
        main(args.robot)
