"""Minimal URDF parser for spherized robot models.

The reference framework ships "spherized" URDFs (one <collision><sphere> per
collision body) and runs an offline tracing compiler over them to emit C++ FK
kernels (reference: README.md:300-303, resources/<robot>/<robot>_spherized.urdf).
We parse the same URDFs at import time and *trace* the FK instead — JAX's jit
is our kernel generator, so there is no generated-code artifact to maintain.

Only the elements needed for kinematics + sphere collision models are parsed:
links (collision spheres), joints (type, parent/child, origin, axis, limits).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..ops.math import rpy_to_matrix_np


@dataclass
class UrdfSphere:
    center: np.ndarray  # (3,) in link frame
    radius: float


@dataclass
class UrdfLink:
    name: str
    spheres: List[UrdfSphere] = field(default_factory=list)


@dataclass
class UrdfJoint:
    name: str
    type: str  # revolute | continuous | prismatic | fixed
    parent: str
    child: str
    origin_xyz: np.ndarray  # (3,)
    origin_rot: np.ndarray  # (3,3)
    axis: np.ndarray  # (3,), unit
    lower: float
    upper: float


@dataclass
class UrdfModel:
    name: str
    links: Dict[str, UrdfLink]
    joints: Dict[str, UrdfJoint]
    child_joints: Dict[str, List[str]]  # link name -> joint names with that parent
    root_link: str

    def joint_path_to(self, link: str) -> List[str]:
        """Joint names along the chain from the root to `link`."""
        parent_joint = {j.child: j.name for j in self.joints.values()}
        path: List[str] = []
        cur = link
        while cur != self.root_link:
            jname = parent_joint[cur]
            path.append(jname)
            cur = self.joints[jname].parent
        return list(reversed(path))


def _parse_vec(text: Optional[str], default) -> np.ndarray:
    if text is None:
        return np.asarray(default, dtype=np.float64)
    return np.asarray([float(x) for x in text.split()], dtype=np.float64)


def parse_urdf(path: str) -> UrdfModel:
    tree = ET.parse(path)
    robot = tree.getroot()

    links: Dict[str, UrdfLink] = {}
    for link_el in robot.findall("link"):
        link = UrdfLink(name=link_el.get("name"))
        for col in link_el.findall("collision"):
            geom = col.find("geometry")
            if geom is None:
                continue
            sphere = geom.find("sphere")
            if sphere is None:
                continue  # non-sphere collision geometry is ignored (spherized models)
            origin = col.find("origin")
            xyz = _parse_vec(origin.get("xyz") if origin is not None else None, [0, 0, 0])
            link.spheres.append(UrdfSphere(center=xyz.astype(np.float32), radius=float(sphere.get("radius"))))
        links[link.name] = link

    joints: Dict[str, UrdfJoint] = {}
    child_joints: Dict[str, List[str]] = {name: [] for name in links}
    has_parent = set()
    for joint_el in robot.findall("joint"):
        origin = joint_el.find("origin")
        xyz = _parse_vec(origin.get("xyz") if origin is not None else None, [0, 0, 0])
        rpy = _parse_vec(origin.get("rpy") if origin is not None else None, [0, 0, 0])
        axis_el = joint_el.find("axis")
        axis = _parse_vec(axis_el.get("xyz") if axis_el is not None else None, [1, 0, 0])
        norm = np.linalg.norm(axis)
        if norm > 0:
            axis = axis / norm
        limit_el = joint_el.find("limit")
        lower = float(limit_el.get("lower", "0")) if limit_el is not None else 0.0
        upper = float(limit_el.get("upper", "0")) if limit_el is not None else 0.0
        j = UrdfJoint(
            name=joint_el.get("name"),
            type=joint_el.get("type"),
            parent=joint_el.find("parent").get("link"),
            child=joint_el.find("child").get("link"),
            origin_xyz=xyz.astype(np.float32),
            origin_rot=rpy_to_matrix_np(rpy),
            axis=axis.astype(np.float32),
            lower=lower,
            upper=upper,
        )
        joints[j.name] = j
        child_joints.setdefault(j.parent, []).append(j.name)
        has_parent.add(j.child)

    roots = [name for name in links if name not in has_parent]
    if len(roots) != 1:
        # Multiple roots can appear in malformed files; pick the one with descendants.
        roots.sort(key=lambda n: -len(child_joints.get(n, [])))
    return UrdfModel(
        name=robot.get("name", "robot"),
        links=links,
        joints=joints,
        child_joints=child_joints,
        root_link=roots[0],
    )


def parse_srdf_disabled_pairs(path: str) -> List[tuple]:
    """Parse <disable_collisions link1= link2=> pairs from an SRDF."""
    tree = ET.parse(path)
    out = []
    for el in tree.getroot().findall("disable_collisions"):
        out.append((el.get("link1"), el.get("link2")))
    return out
