"""Robot registry: named specs for the supported robots.

Specs load from committed JSON artifacts (vamp_tpu/robots/data/<name>.json,
produced by tools/compile_robot_specs.py from the spherized URDFs). Joint
orderings mirror the reference (src/vamp/constants.py ROBOT_JOINTS); per-robot
RRT ranges mirror src/vamp/constants.py ROBOT_RRT_RANGES.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

from .spec import RobotSpec

DATA_DIR = Path(__file__).resolve().parent / "data"

ROBOT_JOINTS = {
    "ur5": [
        "shoulder_pan_joint",
        "shoulder_lift_joint",
        "elbow_joint",
        "wrist_1_joint",
        "wrist_2_joint",
        "wrist_3_joint",
    ],
    "panda": [f"panda_joint{i}" for i in range(1, 8)],
    "fetch": [
        "torso_lift_joint",
        "shoulder_pan_joint",
        "shoulder_lift_joint",
        "upperarm_roll_joint",
        "elbow_flex_joint",
        "forearm_roll_joint",
        "wrist_flex_joint",
        "wrist_roll_joint",
    ],
    "baxter": [
        "right_s0", "right_s1", "right_e0", "right_e1",
        "right_w0", "right_w1", "right_w2",
        "left_s0", "left_s1", "left_e0", "left_e1",
        "left_w0", "left_w1", "left_w2",
    ],
}

# End-effector frames (for eefk / attachments). Verified against reference
# eefk golden outputs (tests/golden/reference.json). Baxter's reference eefk
# is an empty generated body (returns garbage); we use right_hand, documented
# as a knowing fix of that reference quirk.
ROBOT_EE_LINKS = {
    "panda": "panda_hand",
    "ur5": "robotiq_85_base_link",
    "fetch": "gripper_link",
    "baxter": "right_hand",
}

ROBOT_RRT_RANGES = {"sphere": 1.0, "ur5": 1.5, "panda": 1.0, "fetch": 1.0, "baxter": 0.5}

ROBOT_MAX_RADII = {"panda": 1.19, "ur5": 1.2, "fetch": 1.5, "baxter": 1.3}

POINT_RADIUS = 0.0025
DEFAULT_ITERATIONS = 1_000_000

ROBOT_NAMES = ["panda", "ur5", "fetch", "baxter"]


def make_sphere_robot(
    lows=(-10.0, -10.0, 0.0), highs=(10.0, 10.0, 5.0), radius=0.2
) -> RobotSpec:
    """Point-sphere robot in R^3 (reference: robots/sphere/fk.hh).

    Built as a degenerate 3-prismatic-joint chain so every kernel (fkcc,
    planners, validation) reuses the standard machinery. Preserved reference
    quirk: space_measure is the L2 *norm* of the bounds extent, not a volume
    (sphere/fk.hh:67-72); its eefk is left unimplemented in the reference —
    ours returns the point position with identity rotation (knowing fix).
    """
    from .spec import ChainOp, PRISMATIC

    eye = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    axes = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
    ops = tuple(
        ChainOp(
            parent=i - 1,
            origin_rot=eye,
            origin_xyz=(0.0, 0.0, 0.0),
            jtype=PRISMATIC,
            axis=axes[i],
            qi=i,
            link_name=f"axis_{'xyz'[i]}",
        )
        for i in range(3)
    )
    lows = np.asarray(lows, np.float32)
    highs = np.asarray(highs, np.float32)
    return RobotSpec(
        name="sphere",
        dimension=3,
        resolution=32,
        ops=ops,
        sphere_frame=np.asarray([2], np.int32),
        sphere_center=np.zeros((1, 3), np.float32),
        sphere_radius=np.asarray([radius], np.float32),
        sphere_link_names=("axis_z",),
        lower=lows,
        upper=highs,
        self_pairs=np.zeros((0, 2), np.int32),
        ee_frame=2,
        attach_check_frames=(),
        space_measure_const=float(np.linalg.norm(highs - lows)),
        self_pairs_attach=np.zeros((0, 2), np.int32),
    )


@lru_cache(maxsize=None)
def load_robot(name: str) -> RobotSpec:
    from .serialize import load_spec

    if name == "sphere":
        return make_sphere_robot()
    path = DATA_DIR / f"{name}.json"
    if not path.exists():
        raise ValueError(
            f"unknown robot {name!r}; run tools/compile_robot_specs.py to build specs"
        )
    return load_spec(path)
