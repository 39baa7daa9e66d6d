"""Z-aligned capsule/cuboid fast paths must agree with the general kernels.

pack() routes z-aligned shapes (axis == +-z) to specialized lists (reference
environment.hh z_aligned_* lists; sphere_capsule.hh:26-44, sphere_cuboid.hh
z-case). Defeating the classifier with an epsilon rotation forces the same
shape down the general path — verdicts must match on random configurations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vamp_tpu.env import Capsule, Cuboid, Environment
from vamp_tpu.ops.fkcc_bm import make_fkcc_planner
from vamp_tpu.robots.descriptions import load_robot


def _rot_eps(axes, eps=3e-5):
    """Tiny x-rotation: defeats the 1e-6 z-alignment tolerance while moving
    the shape by ~eps (far below any test margin at these scales)."""
    c, s = np.cos(eps), np.sin(eps)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
    return (np.asarray(axes, np.float64) @ R.T).astype(np.float32)


def _envs():
    ez = Environment()
    eg = Environment()
    # vertical capsules (up and down axis orientations)
    for p1, v, r in [
        ([0.4, 0.1, 0.1], [0, 0, 0.8], 0.12),
        ([-0.3, 0.4, 0.9], [0, 0, -0.7], 0.08),
    ]:
        ez.add_capsule(Capsule(np.float32(p1), np.float32(v), r))
        vg = _rot_eps(np.eye(3))[2] * np.linalg.norm(v) * np.sign(v[2])
        eg.add_capsule(Capsule(np.float32(p1), vg.astype(np.float32), r))
    # z-aligned cuboids with in-plane rotation; z row in different positions
    th = 0.6
    c, s = np.cos(th), np.sin(th)
    axes_a = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    axes_b = np.array([[0, 0, -1], [c, s, 0], [-s, c, 0]], np.float32)  # row 0 is z
    for center, axes, half in [
        ([0.3, -0.4, 0.5], axes_a, [0.25, 0.1, 0.4]),
        ([-0.5, 0.2, 0.3], axes_b, [0.3, 0.2, 0.15]),
    ]:
        ez.add_cuboid(Cuboid(np.float32(center), axes, np.float32(half)))
        eg.add_cuboid(Cuboid(np.float32(center), _rot_eps(axes), np.float32(half)))
    pz, pg = ez.pack(), eg.pack()
    # routing really differs
    assert int(pz.zcap_mask.sum()) == 2 and int(pz.capsule_mask.sum()) == 0
    assert int(pz.zcub_mask.sum()) == 2 and int(pz.cuboid_mask.sum()) == 0
    assert int(pg.zcap_mask.shape[0]) == 0 or int(pg.zcap_mask.sum()) == 0
    assert int(pg.cuboid_mask.sum()) == 2
    return pz, pg


def test_z_fast_paths_match_general():
    spec = load_robot("panda")
    fkcc = jax.jit(make_fkcc_planner(spec))
    pz, pg = _envs()
    rng = np.random.default_rng(3)
    q = rng.uniform(spec.lower, spec.upper, size=(512, spec.dimension)).astype(
        np.float32
    )
    vz = np.asarray(fkcc(jnp.asarray(q.T)[:, :, None], pz, None, None))
    vg = np.asarray(fkcc(jnp.asarray(q.T)[:, :, None], pg, None, None))
    # the epsilon rotation can flip only knife-edge contacts; none expected
    # over 512 uniform samples
    agree = (vz == vg).mean()
    assert agree == 1.0, f"z fast path disagrees with general path: {agree}"
    assert 0.05 < vz.mean() < 0.95  # both verdicts occur — test has power


def test_z_fast_paths_brute_force():
    """Independent oracle: closest-point math in float64 numpy."""
    spec = load_robot("panda")
    from vamp_tpu.ops.fkcc_bm import make_sphere_fk_bm

    fk = make_sphere_fk_bm(spec)
    pz, _ = _envs()
    rng = np.random.default_rng(5)
    q = rng.uniform(spec.lower, spec.upper, size=(64, spec.dimension)).astype(
        np.float32
    )
    xs, ys, zs = (np.asarray(a, np.float64) for a in fk(jnp.asarray(q.T)[:, :, None], None, None))
    pts = np.stack([xs[:, :, 0], ys[:, :, 0], zs[:, :, 0]], axis=-1)  # (S, B, 3)
    rr = np.asarray(spec.sphere_radius, np.float64)[:, None]

    hit = np.zeros(pts.shape[1], bool)
    for i in range(int(pz.zcap_mask.sum())):
        p1 = np.asarray(pz.zcap_p1[i], np.float64)
        h = float(pz.zcap_h[i])
        r = float(pz.zcap_r[i])
        d = pts - p1
        t = np.clip(d[..., 2], 0.0, h)
        dd = d.copy()
        dd[..., 2] -= t
        hit |= ((dd ** 2).sum(-1) < (rr + r) ** 2).any(0)
    for i in range(int(pz.zcub_mask.sum())):
        ctr = np.asarray(pz.zcub_center[i], np.float64)
        ax = np.asarray(pz.zcub_axis[i], np.float64)
        half = np.asarray(pz.zcub_half[i], np.float64)
        d = pts - ctr
        px = d[..., 0] * ax[0] + d[..., 1] * ax[1]
        py = d[..., 1] * ax[0] - d[..., 0] * ax[1]
        e = np.stack(
            [
                np.maximum(np.abs(px) - half[0], 0),
                np.maximum(np.abs(py) - half[1], 0),
                np.maximum(np.abs(d[..., 2]) - half[2], 0),
            ],
            axis=-1,
        )
        hit |= ((e ** 2).sum(-1) < rr ** 2).any(0)

    from vamp_tpu.ops.collision import spheres_vs_zcapsules, spheres_vs_zcuboids

    centers = jnp.asarray(np.moveaxis(pts, 1, 0).astype(np.float32))  # (B, S, 3)
    radii = jnp.asarray(np.asarray(spec.sphere_radius, np.float32))
    env_hit = np.asarray(
        spheres_vs_zcapsules(centers, jnp.broadcast_to(radii, centers.shape[:-1]), pz)
        | spheres_vs_zcuboids(centers, jnp.broadcast_to(radii, centers.shape[:-1]), pz)
    )
    assert (env_hit == hit).mean() == 1.0
    assert 0.02 < hit.mean() < 0.98
