"""RobotSpec <-> JSON serialization.

The committed JSON files under vamp_tpu/robots/data/ are this framework's
analogue of the reference's generated fk.hh artifacts: the output of an
offline compile step (tools/compile_robot_specs.py) over the spherized URDFs,
checked in so the package is standalone.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .spec import ChainOp, RobotSpec


def spec_to_dict(spec: RobotSpec) -> dict:
    return {
        "name": spec.name,
        "dimension": spec.dimension,
        "resolution": spec.resolution,
        "ops": [
            {
                "parent": op.parent,
                "origin_rot": op.origin_rot,
                "origin_xyz": op.origin_xyz,
                "jtype": op.jtype,
                "axis": op.axis,
                "qi": op.qi,
                "link_name": op.link_name,
            }
            for op in spec.ops
        ],
        "sphere_frame": spec.sphere_frame.tolist(),
        "sphere_center": spec.sphere_center.tolist(),
        "sphere_radius": spec.sphere_radius.tolist(),
        "sphere_link_names": list(spec.sphere_link_names),
        "lower": spec.lower.tolist(),
        "upper": spec.upper.tolist(),
        "self_pairs": spec.self_pairs.tolist(),
        "ee_frame": spec.ee_frame,
        "attach_check_frames": list(spec.attach_check_frames),
        "space_measure_const": spec.space_measure_const,
        "self_pairs_attach": None
        if spec.self_pairs_attach is None
        else spec.self_pairs_attach.tolist(),
    }


def spec_from_dict(d: dict) -> RobotSpec:
    return RobotSpec(
        name=d["name"],
        dimension=d["dimension"],
        resolution=d["resolution"],
        ops=tuple(
            ChainOp(
                parent=o["parent"],
                origin_rot=tuple(map(tuple, o["origin_rot"])),
                origin_xyz=tuple(o["origin_xyz"]),
                jtype=o["jtype"],
                axis=tuple(o["axis"]),
                qi=o["qi"],
                link_name=o["link_name"],
            )
            for o in d["ops"]
        ),
        sphere_frame=np.asarray(d["sphere_frame"], np.int32),
        sphere_center=np.asarray(d["sphere_center"], np.float32).reshape(-1, 3),
        sphere_radius=np.asarray(d["sphere_radius"], np.float32),
        sphere_link_names=tuple(d["sphere_link_names"]),
        lower=np.asarray(d["lower"], np.float32),
        upper=np.asarray(d["upper"], np.float32),
        self_pairs=np.asarray(d["self_pairs"], np.int32).reshape(-1, 2),
        ee_frame=d["ee_frame"],
        attach_check_frames=tuple(d["attach_check_frames"]),
        space_measure_const=d.get("space_measure_const"),
        self_pairs_attach=None
        if d.get("self_pairs_attach") is None
        else np.asarray(d["self_pairs_attach"], np.int32).reshape(-1, 2),
    )


def save_spec(spec: RobotSpec, path: Path):
    path.write_text(json.dumps(spec_to_dict(spec)))


def load_spec(path: Path) -> RobotSpec:
    return spec_from_dict(json.loads(path.read_text()))
