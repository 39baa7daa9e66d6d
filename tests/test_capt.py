"""CAPT pointcloud collision: property tests vs. brute force, and
integration through fkcc/environment (SURVEY §4 implication (b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vamp_tpu.env import Environment
from vamp_tpu.ops.capt import build_capt, capt_collides_bm
from vamp_tpu.ops.fkcc_bm import make_fkcc
from vamp_tpu.robots.descriptions import load_robot


def brute_force(points, centers, radii, r_point):
    d = np.linalg.norm(points[None, :, :] - centers[:, None, :], axis=2)
    return np.any(d <= (radii[:, None] + r_point), axis=1)


@pytest.mark.parametrize("n_points", [1, 7, 64, 500])
def test_capt_matches_brute_force(n_points):
    rng = np.random.RandomState(42 + n_points)
    points = rng.uniform(-1, 1, (n_points, 3)).astype(np.float32)
    r_min, r_max, r_point = 0.01, 0.3, 0.0025
    capt = build_capt(points, r_min, r_max, r_point)

    B = 512
    centers = rng.uniform(-1.3, 1.3, (B, 3)).astype(np.float32)
    radii = rng.uniform(r_min, r_max, B).astype(np.float32)

    expected = brute_force(points, centers, radii, r_point)
    got = np.asarray(
        jax.jit(capt_collides_bm, static_argnums=())(
            capt,
            jnp.asarray(centers[:, 0])[None],
            jnp.asarray(centers[:, 1])[None],
            jnp.asarray(centers[:, 2])[None],
            jnp.asarray(radii)[None],
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_capt_through_environment_fkcc():
    """A pointcloud shell around the panda must flag collisions via fkcc."""
    rng = np.random.RandomState(0)
    # points on a sphere of radius 0.45 around the base — intersects the arm
    dirs = rng.normal(size=(800, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    cloud = (dirs * 0.45 + np.array([0, 0, 0.3])).astype(np.float32)

    e = Environment()
    build_ns = e.add_pointcloud(cloud, 0.01, 0.2, 0.0025)
    assert build_ns > 0
    env = e.pack()

    spec = load_robot("panda")
    fkcc = jax.jit(make_fkcc(spec))
    qs = jnp.asarray(
        rng.uniform(spec.lower, spec.upper, (256, 7)).astype(np.float32)
    )
    with_cloud = np.asarray(fkcc(qs, env))
    without = np.asarray(fkcc(qs, Environment().pack()))
    # the cloud can only remove validity, and must actually hit some configs
    assert np.all(~with_cloud | without)
    assert with_cloud.sum() < without.sum()


def test_capt_pad_and_stack_exact():
    """pad_capt deepening and stack_capts lane batching leave query results
    bit-identical to the per-lane trees (and to brute force)."""
    from vamp_tpu.ops.capt import build_capt, capt_collides_bm, pad_capt, stack_capts

    rng = np.random.default_rng(0)
    capts, clouds = [], []
    for n in (37, 100, 400):
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        clouds.append(pts)
        capts.append(build_capt(pts, 0.01, 0.3, 0.0025))

    S, B = 4, 50
    for c, pts in zip(capts, clouds):
        xs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
        ys = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
        zs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
        r = jnp.full((S, 1), 0.15)
        h0 = np.asarray(capt_collides_bm(c, xs, ys, zs, r))
        cp = pad_capt(c, 10, c.leaf_points.shape[1] + 7)
        h1 = np.asarray(capt_collides_bm(cp, xs, ys, zs, r))
        d = (
            (np.asarray(xs)[..., None] - pts[:, 0]) ** 2
            + (np.asarray(ys)[..., None] - pts[:, 1]) ** 2
            + (np.asarray(zs)[..., None] - pts[:, 2]) ** 2
        )
        bf = (d < (0.15 + 0.0025) ** 2).any(axis=(0, 2))
        assert np.array_equal(h0, h1)
        assert np.array_equal(h0, bf)

    st = stack_capts(capts)
    L = len(capts)
    xs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 20, L)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 20, L)).astype(np.float32))
    zs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 20, L)).astype(np.float32))
    r = jnp.full((S, 1, 1), 0.15)
    hb = np.asarray(capt_collides_bm(st, xs, ys, zs, r))
    for l in range(L):
        hl = np.asarray(
            capt_collides_bm(
                capts[l], xs[..., l], ys[..., l], zs[..., l], jnp.full((S, 1), 0.15)
            )
        )
        assert np.array_equal(hb[:, l], hl)


def test_capt_chunked_gather_matches_full(monkeypatch):
    """The S-axis streaming path (gather budget exceeded) must agree with the
    single row-gather path bit-for-bit, batched and unbatched."""
    import vamp_tpu.ops.capt as capt_mod

    rng = np.random.default_rng(5)
    pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    c = build_capt(pts, 0.01, 0.16, 0.0025)
    S, B = 13, 9
    xs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
    zs = jnp.asarray(rng.uniform(-1.2, 1.2, (S, B)).astype(np.float32))
    r = jnp.full((S, B), 0.15)
    full = np.asarray(capt_collides_bm(c, xs, ys, zs, r))
    monkeypatch.setattr(capt_mod, "_GATHER_BUDGET", 64)  # force S chunking
    chunked = np.asarray(capt_collides_bm(c, xs, ys, zs, r))
    assert np.array_equal(full, chunked)

    from vamp_tpu.ops.capt import stack_capts

    st = stack_capts([c, build_capt(pts[:150], 0.01, 0.16, 0.0025)])
    L = 2
    xsl = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 5, L)).astype(np.float32))
    ysl = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 5, L)).astype(np.float32))
    zsl = jnp.asarray(rng.uniform(-1.2, 1.2, (S, 5, L)).astype(np.float32))
    rl = jnp.full((S, 1, 1), 0.15)
    chunked_b = np.asarray(capt_collides_bm(st, xsl, ysl, zsl, rl))
    monkeypatch.setattr(capt_mod, "_GATHER_BUDGET", 16 * 1024 * 1024)
    full_b = np.asarray(capt_collides_bm(st, xsl, ysl, zsl, rl))
    assert np.array_equal(full_b, chunked_b)


@pytest.mark.parametrize("n_points", [5, 300])
def test_capt_numpy_fallback_builder(n_points, monkeypatch):
    """build_capt must produce a correct tree through the pure-numpy builder
    when the native library is unavailable (the documented degradation path —
    native/__init__.py returns None without a toolchain)."""
    import vamp_tpu.native as native

    monkeypatch.setattr(native, "native_capt_build", lambda *a, **k: None)
    rng = np.random.RandomState(7 + n_points)
    points = rng.uniform(-1, 1, (n_points, 3)).astype(np.float32)
    r_min, r_max, r_point = 0.01, 0.3, 0.0025
    capt = build_capt(points, r_min, r_max, r_point)

    B = 256
    centers = rng.uniform(-1.2, 1.2, (B, 3)).astype(np.float32)
    radii = rng.uniform(r_min, r_max, B).astype(np.float32)
    expected = brute_force(points, centers, radii, r_point)
    got = np.asarray(
        jax.jit(capt_collides_bm)(
            capt,
            jnp.asarray(centers[:, 0])[None],
            jnp.asarray(centers[:, 1])[None],
            jnp.asarray(centers[:, 2])[None],
            jnp.asarray(radii)[None],
        )
    )
    np.testing.assert_array_equal(got, expected)
