"""Robot specification + the kinematics "compiler".

The reference generates per-robot C++ SSA forward-kinematics kernels offline
(reference: src/impl/vamp/robots/panda/fk.hh — 11k lines of generated code).
Here the equivalent artifact is a `RobotSpec`: a static description of the
kinematic chain and sphere collision model extracted from the same spherized
URDF, from which `make_sphere_fk` traces a closed-form jnp FK function. JAX's
tracing + XLA fusion play the role of the offline codegen: the traced function
is straight-line arithmetic over (batch, dim) arrays, exactly the shape of
program the reference emits, but vectorized over an arbitrary batch axis
instead of 8 SIMD lanes.

Conventions matched to the reference:
- configurations are in *radians/meters* (joint space); planners sample the
  unit cube and scale via the joint limits (reference: planning/rrtc.hh:111-112,
  robots/panda/fk.hh:14-86 scale/descale constants = URDF limits).
- `resolution` = collision checks per unit C-space distance (= 32 for all
  reference robots, e.g. robots/ur5.hh:12).
- eefk returns (x, y, z, qx, qy, qz, qw) (reference: bindings eefk).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .urdf import UrdfModel, parse_urdf
from ..ops.math import axis_angle_to_matrix, matrix_to_quaternion

# Joint type codes (static ints in the chain table).
FIXED, REVOLUTE, PRISMATIC = 0, 1, 2


@dataclass(frozen=True)
class ChainOp:
    """One joint hop in topological order (all fields static)."""

    parent: int  # frame index of parent (-1 = base frame)
    origin_rot: tuple  # 3x3 nested tuple
    origin_xyz: tuple  # (3,)
    jtype: int  # FIXED | REVOLUTE | PRISMATIC
    axis: tuple  # (3,)
    qi: int  # index into the configuration vector; -1 for fixed
    link_name: str


@dataclass(frozen=True)
class RobotSpec:
    name: str
    dimension: int
    resolution: int
    ops: Tuple[ChainOp, ...]  # frame i is produced by ops[i]
    # Sphere model: per-sphere owning frame + local center + radius.
    sphere_frame: np.ndarray  # (S,) int32
    sphere_center: np.ndarray  # (S, 3) float32, in frame coords
    sphere_radius: np.ndarray  # (S,) float32
    sphere_link_names: Tuple[str, ...]  # (S,) owning link name per sphere
    lower: np.ndarray  # (dim,) joint lower limits
    upper: np.ndarray  # (dim,) joint upper limits
    self_pairs: np.ndarray  # (P, 2) int32 sphere-index pairs to self-check
    ee_frame: int  # frame index of the end effector
    # Frames whose spheres the attachment must be checked against
    # (reference bakes these into fkcc_attach; attachment-vs-env is always on).
    attach_check_frames: Tuple[int, ...] = ()
    # Reference's baked space-measure constant (robots/<r>/fk.hh space_measure).
    # Its generator used a different volume convention than prod(range); we
    # carry the constant for PRM*/FCIT* radius parity.
    space_measure_const: Optional[float] = None
    # Pair set used by fkcc_attach — the reference's attachment variant checks
    # a (sometimes larger) set than plain fkcc (e.g. UR5, fk.hh:3671).
    self_pairs_attach: Optional[np.ndarray] = None  # (P2, 2) int32

    @property
    def n_spheres(self) -> int:
        return int(self.sphere_radius.shape[0])

    @property
    def range(self) -> np.ndarray:
        return self.upper - self.lower

    def space_measure(self) -> float:
        """Joint-space volume (for PRM*/FCIT* radii; reference panda/fk.hh:88-91)."""
        if self.space_measure_const is not None:
            return self.space_measure_const
        return float(np.prod(self.range.astype(np.float64)))

    def scale_configuration(self, q):
        """Unit cube [0,1]^d -> joint space (reference scale_configuration)."""
        return q * jnp.asarray(self.range, jnp.float32) + jnp.asarray(self.lower, jnp.float32)

    def descale_configuration(self, q):
        return (q - jnp.asarray(self.lower, jnp.float32)) / jnp.asarray(self.range, jnp.float32)


def build_spec(
    urdf_path: str,
    actuated_joints: Sequence[str],
    name: str,
    ee_link: str,
    self_pairs_links: Sequence[Tuple[str, str]] = (),
    self_pairs_links_attach: Optional[Sequence[Tuple[str, str]]] = None,
    attach_check_links: Sequence[str] = (),
    resolution: int = 32,
) -> RobotSpec:
    """Build a RobotSpec from a spherized URDF.

    `actuated_joints` fixes the configuration ordering (reference:
    src/vamp/constants.py ROBOT_JOINTS). Branches that contain neither spheres
    nor the end effector are pruned.
    """
    model = parse_urdf(urdf_path)
    qi_of = {jn: i for i, jn in enumerate(actuated_joints)}

    # Collect links that matter: any with spheres, the ee link, and ancestors.
    keep_links = {model.root_link, ee_link}
    for ln, link in model.links.items():
        if link.spheres:
            keep_links.add(ln)
    # expand ancestors
    parent_joint = {j.child: j for j in model.joints.values()}
    for ln in list(keep_links):
        cur = ln
        while cur != model.root_link:
            j = parent_joint[cur]
            keep_links.add(j.parent)
            cur = j.parent

    # Preorder DFS from the root in URDF declaration order — matches the
    # reference generator's sphere emission order (verified against golden
    # sphere_fk fixtures).
    ops: List[ChainOp] = []
    frame_of: Dict[str, int] = {model.root_link: -1}

    def visit(ln: str):
        for jn in model.child_joints.get(ln, []):
            j = model.joints[jn]
            if j.child not in keep_links:
                continue
            jtype = {"revolute": REVOLUTE, "continuous": REVOLUTE, "prismatic": PRISMATIC}.get(
                j.type, FIXED
            )
            qi = qi_of.get(jn, -1)
            if qi < 0:
                jtype = FIXED  # unactuated joints are frozen at zero
            ops.append(
                ChainOp(
                    parent=frame_of[ln],
                    origin_rot=tuple(map(tuple, j.origin_rot.tolist())),
                    origin_xyz=tuple(j.origin_xyz.tolist()),
                    jtype=jtype,
                    axis=tuple(j.axis.tolist()),
                    qi=qi,
                    link_name=j.child,
                )
            )
            frame_of[j.child] = len(ops) - 1
            visit(j.child)

    visit(model.root_link)

    assigned = {jn for jn in actuated_joints if jn in model.joints}
    missing = [jn for jn in actuated_joints if jn not in model.joints]
    if missing:
        raise ValueError(f"actuated joints not in URDF: {missing}")

    # Sphere table, in URDF <link> declaration order — the reference
    # generator's emission order (verified against golden sphere_fk fixtures).
    # Root-link spheres get frame -1 (base frame).
    sphere_frame, sphere_center, sphere_radius, sphere_links = [], [], [], []
    order = [ln for ln in model.links if ln in frame_of]
    for ln in order:
        fi = frame_of[ln]
        for s in model.links[ln].spheres:
            sphere_frame.append(fi)
            sphere_center.append(s.center)
            sphere_radius.append(s.radius)
            sphere_links.append(ln)

    sphere_frame = np.asarray(sphere_frame, np.int32)
    sphere_center = np.asarray(sphere_center, np.float32).reshape(-1, 3)
    sphere_radius = np.asarray(sphere_radius, np.float32)

    # Joint limits in configuration order.
    lower = np.asarray([model.joints[jn].lower for jn in actuated_joints], np.float32)
    upper = np.asarray([model.joints[jn].upper for jn in actuated_joints], np.float32)

    # Expand link-level self-collision pairs to sphere-index pairs. Each
    # generated block checks every fine-sphere pair of the two links (verified
    # by counting calls per block in the reference fk.hh), so all-pairs
    # expansion is boolean-identical.
    by_link: Dict[str, List[int]] = {}
    for i, ln in enumerate(sphere_links):
        by_link.setdefault(ln, []).append(i)

    def expand(link_pairs):
        pairs = []
        for (la, lb) in link_pairs:
            for i in by_link.get(la, []):
                for k in by_link.get(lb, []):
                    pairs.append((i, k))
        return np.asarray(pairs, np.int32).reshape(-1, 2)

    self_pairs = expand(self_pairs_links)
    self_pairs_attach = (
        expand(self_pairs_links_attach) if self_pairs_links_attach is not None else self_pairs
    )

    attach_frames = tuple(frame_of[ln] for ln in attach_check_links if ln in frame_of)

    return RobotSpec(
        name=name,
        dimension=len(actuated_joints),
        resolution=resolution,
        ops=tuple(ops),
        sphere_frame=sphere_frame,
        sphere_center=sphere_center,
        sphere_radius=sphere_radius,
        sphere_link_names=tuple(sphere_links),
        lower=lower,
        upper=upper,
        self_pairs=self_pairs,
        ee_frame=frame_of[ee_link],
        attach_check_frames=attach_frames,
        self_pairs_attach=self_pairs_attach,
    )


# ---------------------------------------------------------------------------
# FK tracing
# ---------------------------------------------------------------------------


def _chain_transforms(spec: RobotSpec, q: jnp.ndarray, base_rot, base_pos):
    """Per-frame world transforms for one configuration.

    q: (dim,). Returns lists of (3,3) rotations and (3,) translations, one per
    frame in spec.ops order. The python loop unrolls at trace time into the
    same straight-line arithmetic the reference's codegen produces.
    """
    Rs: List[jnp.ndarray] = []
    ts: List[jnp.ndarray] = []
    for op in spec.ops:
        if op.parent < 0:
            Rp, tp = base_rot, base_pos
        else:
            Rp, tp = Rs[op.parent], ts[op.parent]
        Orot = jnp.asarray(op.origin_rot, jnp.float32)
        Oxyz = jnp.asarray(op.origin_xyz, jnp.float32)
        R = Rp @ Orot
        t = tp + Rp @ Oxyz
        if op.jtype == REVOLUTE:
            A = axis_angle_to_matrix(jnp.asarray(op.axis, jnp.float32), q[op.qi])
            R = R @ A
        elif op.jtype == PRISMATIC:
            t = t + R @ (jnp.asarray(op.axis, jnp.float32) * q[op.qi])
        Rs.append(R)
        ts.append(t)
    return Rs, ts


def make_sphere_fk(spec: RobotSpec):
    """Trace `sphere_fk(q, base_rot, base_pos) -> (S, 3) world sphere centers`.

    Equivalent of the reference's generated sphere_fk (panda/fk.hh:104+), with
    the base pose a *runtime* argument instead of a template parameter
    (subsumes the fork's PandaBase<bx,by,bz> machinery, robots/panda_base.hh).
    """
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    # Group spheres by owning frame for gather-free transforms.
    groups: Dict[int, List[int]] = {}
    for i, fi in enumerate(spec.sphere_frame.tolist()):
        groups.setdefault(fi, []).append(i)
    order = np.concatenate([np.asarray(groups[f], np.int32) for f in sorted(groups)])
    inv_order = np.argsort(order)  # restore URDF sphere ordering

    def sphere_fk(q: jnp.ndarray, base_rot=None, base_pos=None) -> jnp.ndarray:
        br = eye if base_rot is None else base_rot
        bp = zero if base_pos is None else base_pos
        Rs, ts = _chain_transforms(spec, q, br, bp)
        chunks = []
        for f in sorted(groups):
            idx = groups[f]
            local = jnp.asarray(spec.sphere_center[idx], jnp.float32)  # (k,3)
            if f < 0:
                R, t = br, bp
            else:
                R, t = Rs[f], ts[f]
            chunks.append(local @ R.T + t)
        out = jnp.concatenate(chunks, axis=0)
        return out[jnp.asarray(inv_order)]

    return sphere_fk


def make_eefk(spec: RobotSpec):
    """Trace `eefk(q, base_rot, base_pos) -> (7,)` = (x,y,z, qx,qy,qz,qw)."""
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    def eefk(q: jnp.ndarray, base_rot=None, base_pos=None) -> jnp.ndarray:
        br = eye if base_rot is None else base_rot
        bp = zero if base_pos is None else base_pos
        Rs, ts = _chain_transforms(spec, q, br, bp)
        R, t = Rs[spec.ee_frame], ts[spec.ee_frame]
        quat = matrix_to_quaternion(R)
        return jnp.concatenate([t, quat])

    return eefk


def make_ee_transform(spec: RobotSpec):
    """Trace `ee_tf(q, ...) -> (R (3,3), t (3,))` for posing attachments."""
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    def ee_tf(q: jnp.ndarray, base_rot=None, base_pos=None):
        br = eye if base_rot is None else base_rot
        bp = zero if base_pos is None else base_pos
        Rs, ts = _chain_transforms(spec, q, br, bp)
        return Rs[spec.ee_frame], ts[spec.ee_frame]

    return ee_tf
