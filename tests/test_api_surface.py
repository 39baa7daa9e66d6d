"""Binding-surface parity: samplers, debug validity, pointcloud self-filter,
png heightfield (reference init_robot surface, bindings/common.hh:356-728)."""

import numpy as np
import pytest

import vamp_tpu as vamp

PANDA_HOME = np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], np.float32)


def test_xorshift_sampler_contract():
    s = vamp.panda.xorshift()
    a = s.next()
    b = s.next()
    assert a.shape == (7,)
    assert not np.allclose(a, b)
    assert np.all((a >= 0) & (a <= 1))
    s.reset()
    np.testing.assert_allclose(s.next(), a)
    s.reset()
    s.skip(1)
    np.testing.assert_allclose(s.next(), b)


def test_phs_sampler_informed():
    """PHS samples concentrate between the foci and shrink with the
    transverse diameter (reference planning/phs.hh:144-189 semantics)."""
    start = PANDA_HOME
    goal = PANDA_HOME + 0.4
    phs = vamp.ProlateHyperspheroid(start, goal)
    phs.set_transverse_diameter(phs.min_transverse * 1.05)
    sampler = vamp.panda.phs_sampler(phs)
    spec = vamp.panda.spec
    center = 0.5 * (start + goal)
    for _ in range(32):
        u = sampler.next()
        assert u.shape == (7,)
        assert np.all((u >= 0) & (u <= 1))
        q = np.asarray(spec.scale_configuration(u))
        # inside (clamp-adjusted) ellipse: distance sum to foci <= transverse
        ds = np.linalg.norm(q - start) + np.linalg.norm(q - goal)
        # clamping to joint limits can only pull points inward toward the
        # cube, but compare against the unclamped bound with slack
        assert ds <= phs.transverse * 1.5
        assert np.linalg.norm(q - center) <= phs.transverse


def test_sphere_validate_names():
    e = vamp.Environment()
    e.add_sphere(vamp.Sphere([10, 10, 10], 0.1, name="far_ball"))
    names = vamp.panda.sphere_validate(PANDA_HOME, e)
    assert len(names) == vamp.panda.n_spheres()
    assert all(n == [] for n in names)

    # a big sphere swallowing the robot base collides with some sphere
    e2 = vamp.Environment()
    e2.add_sphere(vamp.Sphere([0, 0, 0.1], 0.5, name="blob"))
    names2 = vamp.panda.sphere_validate(PANDA_HOME, e2)
    assert any("blob" in n for n in names2)


def test_filter_self_from_pointcloud():
    spheres = vamp.panda.fk(PANDA_HOME)
    on_robot = np.asarray([s.center for s in spheres[:10]], np.float32)
    far = on_robot + np.array([5.0, 0, 0], np.float32)
    pc = np.concatenate([on_robot, far])
    kept = vamp.panda.filter_self_from_pointcloud(pc, PANDA_HOME)
    assert len(kept) == len(far)
    np.testing.assert_allclose(kept, far)


def test_png_to_heightfield(tmp_path):
    from PIL import Image

    img = (np.arange(64 * 32).reshape(64, 32) % 256).astype(np.uint8)
    p = tmp_path / "hf.png"
    Image.fromarray(img, mode="L").save(p)
    hf = vamp.png_to_heightfield(p, (0, 0, 0), (1, 1, 2.0))
    assert hf.data.shape == (64, 32)
    assert hf.data.max() <= 1.0
    np.testing.assert_allclose(hf.data, np.flip(img.astype(np.float32) / 255.0, axis=0))
    # usable in an environment
    e = vamp.Environment()
    e.add_heightfield(hf)
    e.pack()
