"""Composite multi-robot specs — the TPU-native multi-robot layer.

The reference fork (mr-vamp) built toward multi-robot planning with a C++
template-per-base-position robot layer plus an OO RobotInterface/RobotFactory
stack (reference: robots/base_robot.hh:11-16, robots/panda_base.hh:52-73,
robots/robot_factory.hh:23-188, MR_DEV_PLAN.md phases 1-2); the actual
multi-robot planners and composite collision checking were never implemented.

Here the whole layer collapses into one constructor: a composite of N robots
at arbitrary base poses *is a RobotSpec*. Each part's base pose is baked into
its root chain ops (rotation/translation composed into the origin transforms),
configuration indices are offset into one concatenated configuration vector,
and inter-robot collision is expressed as extra self-collision sphere pairs —
which the fused batch-minor FK+CC kernel (ops/fkcc_bm.py) already evaluates as
dense link-block checks. Every planner (RRTC/PRM/FCIT*/AORRTC), the validator,
and the simplifier therefore work on composites unchanged, fully jitted, with
inter-robot collision checked inside the same fused kernel as environment
collision.

`bake_base` (a one-part composite) subsumes the fork's PandaBase<bx,by,bz>
grid-variant machinery: base position is a constant folded into the traced FK
program, with no template instantiation and no 3x3-grid restriction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .spec import ChainOp, RobotSpec


def _as_rotation(rot) -> np.ndarray:
    """Accept None | 3x3 matrix | quaternion xyzw | euler-z yaw scalar."""
    if rot is None:
        return np.eye(3, dtype=np.float64)
    r = np.asarray(rot, np.float64)
    if r.shape == (3, 3):
        return r
    if r.shape == (4,):  # xyzw quaternion
        x, y, z, w = r / np.linalg.norm(r)
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
    if r.shape == ():  # yaw about +z
        c, s = np.cos(float(r)), np.sin(float(r))
        return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    raise ValueError(f"cannot interpret base orientation with shape {r.shape}")


@dataclass(frozen=True)
class CompositePart:
    """One robot instance inside a composite."""

    spec: RobotSpec
    base_pos: np.ndarray  # (3,)
    base_rot: np.ndarray  # (3, 3)
    q_offset: int  # slice start in the composite configuration
    sphere_offset: int  # slice start in the composite sphere table

    @property
    def q_slice(self) -> slice:
        return slice(self.q_offset, self.q_offset + self.spec.dimension)

    @property
    def sphere_slice(self) -> slice:
        return slice(self.sphere_offset, self.sphere_offset + self.spec.n_spheres)


@dataclass(frozen=True)
class CompositeSpec:
    """A composite RobotSpec plus the per-part bookkeeping to split/join
    configurations and paths."""

    spec: RobotSpec
    parts: Tuple[CompositePart, ...]

    @property
    def dimension(self) -> int:
        return self.spec.dimension

    def join_configs(self, configs: Sequence) -> np.ndarray:
        """Per-robot configs -> one composite config (concatenate)."""
        return np.concatenate([np.asarray(c, np.float32).ravel() for c in configs])

    def split_config(self, q) -> List[np.ndarray]:
        """One composite config -> per-robot configs."""
        q = np.asarray(q, np.float32)
        return [q[..., p.q_slice] for p in self.parts]

    def split_path(self, path) -> List[np.ndarray]:
        """(T, dim) composite path -> list of (T, dim_i) per-robot paths."""
        path = np.asarray(path, np.float32)
        return [path[:, p.q_slice] for p in self.parts]


def _baked_ops(
    spec: RobotSpec, base_rot: np.ndarray, base_pos: np.ndarray, frame_off: int, q_off: int, tag: str
) -> List[ChainOp]:
    """Re-root a part's chain ops: bake the base pose into root ops, offset
    parent frames and configuration indices, tag link names."""
    out: List[ChainOp] = []
    for op in spec.ops:
        orot = np.asarray(op.origin_rot, np.float64)
        oxyz = np.asarray(op.origin_xyz, np.float64)
        if op.parent < 0:
            orot = base_rot @ orot
            oxyz = base_pos + base_rot @ oxyz
            parent = -1
        else:
            parent = op.parent + frame_off
        out.append(
            ChainOp(
                parent=parent,
                origin_rot=tuple(map(tuple, orot.tolist())),
                origin_xyz=tuple(oxyz.tolist()),
                jtype=op.jtype,
                axis=op.axis,
                qi=op.qi + q_off if op.qi >= 0 else -1,
                link_name=f"{tag}/{op.link_name}",
            )
        )
    return out


def make_composite_spec(
    specs: Sequence[RobotSpec],
    base_positions: Sequence,
    base_orientations: Optional[Sequence] = None,
    name: Optional[str] = None,
    check_inter_robot: bool = True,
) -> CompositeSpec:
    """Build the composite spec for `specs[i]` based at `base_positions[i]`.

    The composite configuration is the concatenation of the parts' configs;
    the composite sphere model is the concatenation of the parts' sphere
    models posed by their base transforms. `self_pairs` holds each part's own
    self-collision pairs (offset) plus, when `check_inter_robot`, every
    cross-robot sphere pair — so inter-robot collision rides the same fused
    kernel path as self-collision (dense per-link-block checks, no gathers).

    Capability target: SURVEY.md §2.9 "composite multi-robot planning — robots
    at arbitrary base offsets, composite state space (e.g. 2xPanda = 14-DoF),
    inter-robot sphere-sphere collision" (reference planned it in
    MR_DEV_PLAN.md:174-278 but never implemented it).
    """
    n = len(specs)
    if len(base_positions) != n:
        raise ValueError("need one base position per robot")
    rots = [
        _as_rotation(None if base_orientations is None else base_orientations[i]) for i in range(n)
    ]
    poss = [np.asarray(base_positions[i], np.float64).reshape(3) for i in range(n)]

    ops: List[ChainOp] = []
    parts: List[CompositePart] = []
    sphere_frame: List[np.ndarray] = []
    sphere_center: List[np.ndarray] = []
    sphere_radius: List[np.ndarray] = []
    sphere_links: List[str] = []
    lower: List[np.ndarray] = []
    upper: List[np.ndarray] = []
    pairs: List[np.ndarray] = []
    q_off = 0
    s_off = 0
    measure = 1.0
    for i, spec in enumerate(specs):
        tag = f"r{i}"
        frame_off = len(ops)
        ops.extend(_baked_ops(spec, rots[i], poss[i], frame_off, q_off, tag))

        frames = spec.sphere_frame.astype(np.int64)
        centers = spec.sphere_center.astype(np.float64)
        # Root-link spheres (frame -1) ride the composite base frame, so their
        # part base pose must be baked into the stored centers.
        root = frames < 0
        if root.any():
            centers = centers.copy()
            centers[root] = centers[root] @ rots[i].T + poss[i]
        sphere_frame.append(np.where(root, -1, frames + frame_off).astype(np.int32))
        sphere_center.append(centers.astype(np.float32))
        sphere_radius.append(spec.sphere_radius)
        sphere_links.extend(f"{tag}/{ln}" for ln in spec.sphere_link_names)

        lower.append(spec.lower)
        upper.append(spec.upper)
        if spec.self_pairs.size:
            pairs.append(spec.self_pairs + s_off)

        parts.append(
            CompositePart(
                spec=spec,
                base_pos=poss[i].astype(np.float32),
                base_rot=rots[i].astype(np.float32),
                q_offset=q_off,
                sphere_offset=s_off,
            )
        )
        measure *= spec.space_measure()
        q_off += spec.dimension
        s_off += spec.n_spheres

    if check_inter_robot:
        for a in range(n):
            for b in range(a + 1, n):
                ia = np.arange(parts[a].sphere_offset, parts[a].sphere_offset + specs[a].n_spheres)
                ib = np.arange(parts[b].sphere_offset, parts[b].sphere_offset + specs[b].n_spheres)
                gi, gk = np.meshgrid(ia, ib, indexing="ij")
                pairs.append(np.stack([gi.ravel(), gk.ravel()], axis=1).astype(np.int32))

    all_pairs = (
        np.concatenate(pairs, axis=0).astype(np.int32) if pairs else np.zeros((0, 2), np.int32)
    )

    composite = RobotSpec(
        name=name or "+".join(s.name for s in specs),
        dimension=q_off,
        resolution=max(s.resolution for s in specs),
        ops=tuple(ops),
        sphere_frame=np.concatenate(sphere_frame),
        sphere_center=np.concatenate(sphere_center, axis=0),
        sphere_radius=np.concatenate(sphere_radius),
        sphere_link_names=tuple(sphere_links),
        lower=np.concatenate(lower),
        upper=np.concatenate(upper),
        self_pairs=all_pairs,
        # eefk of a composite reports the FIRST part's end effector (composites
        # have no single canonical ee; use the parts for per-robot eefk).
        ee_frame=parts[0].spec.ee_frame,
        attach_check_frames=(),
        space_measure_const=measure,
        self_pairs_attach=all_pairs,
    )
    return CompositeSpec(spec=composite, parts=tuple(parts))


def bake_base(spec: RobotSpec, base_position, base_orientation=None, name: Optional[str] = None) -> RobotSpec:
    """A single robot at a fixed base pose, as a standalone RobotSpec.

    Replaces the fork's compile-time base templating (reference:
    robots/base_robot.hh:11-16, TEMPLATED_FK_SOLUTION.md): the base transform
    is constant-folded into the traced FK program, for any pose (not just a
    3x3 grid), with identical downstream codegen quality.
    """
    comp = make_composite_spec([spec], [base_position], [base_orientation], check_inter_robot=False)
    baked = comp.spec
    if name is None:
        p = np.asarray(base_position, np.float64).reshape(3)
        name = f"{spec.name}@({p[0]:g},{p[1]:g},{p[2]:g})"
    # restore original link names / ee metadata lost to part tagging
    return RobotSpec(
        name=name,
        dimension=baked.dimension,
        resolution=baked.resolution,
        ops=tuple(
            ChainOp(
                parent=op.parent,
                origin_rot=op.origin_rot,
                origin_xyz=op.origin_xyz,
                jtype=op.jtype,
                axis=op.axis,
                qi=op.qi,
                link_name=op.link_name[3:],  # strip "r0/"
            )
            for op in baked.ops
        ),
        sphere_frame=baked.sphere_frame,
        sphere_center=baked.sphere_center,
        sphere_radius=baked.sphere_radius,
        sphere_link_names=tuple(ln[3:] for ln in baked.sphere_link_names),
        lower=baked.lower,
        upper=baked.upper,
        self_pairs=spec.self_pairs,
        ee_frame=spec.ee_frame,
        attach_check_frames=spec.attach_check_frames,
        space_measure_const=spec.space_measure_const,
        self_pairs_attach=spec.self_pairs_attach,
    )
