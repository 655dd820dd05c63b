import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.post.accumulate import accumulate_reprojected, firefly_clamp, reproject
from merian_quake_tpu.post.fxaa import fxaa
from merian_quake_tpu.post.svgf import SVGFParams, init_svgf_state, svgf
from merian_quake_tpu.post.taa import taa


def test_svgf_denoises_flat_region(rng):
    """A flat lit plane with iid noise must come out much smoother."""
    H, W = 64, 64
    clean = jnp.full((H, W, 3), 0.5)
    noise = jnp.asarray(rng.gamma(1.0, 0.5, (H, W, 3)).astype(np.float32))
    state = init_svgf_state(H, W)
    mv = jnp.zeros((H, W, 2))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    z = jnp.full((H, W), 100.0)
    zg = jnp.zeros((H, W, 2))
    albedo = jnp.ones((H, W, 3))
    m2 = (noise.sum(-1) / 3) ** 2
    state, out = svgf(state, noise, m2, mv, normal, z, zg, albedo)
    out = np.asarray(out)
    in_std = float(np.asarray(noise).std())
    assert out.std() < in_std * 0.25
    assert abs(out.mean() - float(noise.mean())) < 0.05  # energy preserved


def test_svgf_preserves_depth_edge(rng):
    """Two planes at different depths: filtering must not blur across."""
    H, W = 32, 64
    irr = jnp.concatenate(
        [jnp.full((H, W // 2, 3), 0.2), jnp.full((H, W // 2, 3), 0.9)], axis=1
    )
    irr = irr + jnp.asarray(rng.normal(0, 0.05, (H, W, 3)).astype(np.float32))
    z = jnp.concatenate(
        [jnp.full((H, W // 2), 50.0), jnp.full((H, W // 2), 500.0)], axis=1
    )
    state = init_svgf_state(H, W)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    state, out = svgf(
        state,
        irr,
        (irr.sum(-1) / 3) ** 2,
        jnp.zeros((H, W, 2)),
        normal,
        z,
        jnp.zeros((H, W, 2)),
        jnp.ones((H, W, 3)),
    )
    out = np.asarray(out)
    left = out[:, : W // 2 - 4].mean()
    right = out[:, W // 2 + 4 :].mean()
    assert right - left > 0.5  # edge survived


def test_accumulate_reprojected_static_and_shifted():
    H, W = 16, 16
    hist = jnp.zeros((H, W, 3))
    hl = jnp.zeros((H, W))
    one = jnp.ones((H, W, 3))
    out, n = accumulate_reprojected(hist, hl, one, jnp.zeros((H, W, 2)))
    np.testing.assert_allclose(np.asarray(out), 1.0)
    out2, n2 = accumulate_reprojected(out, n, 3 * one, jnp.zeros((H, W, 2)))
    np.testing.assert_allclose(np.asarray(out2), 2.0)  # mean of 1 and 3
    # large mv → invalid → restart
    mv = jnp.full((H, W, 2), 100.0)
    out3, n3 = accumulate_reprojected(out2, n2, 5 * one, mv)
    np.testing.assert_allclose(np.asarray(out3), 5.0)
    np.testing.assert_allclose(np.asarray(n3), 1.0)


def test_firefly_clamp():
    img = jnp.full((16, 16, 4), 0.5)
    img = img.at[8, 8, :3].set(1000.0)
    out = np.asarray(firefly_clamp(img))
    assert out[8, 8, :3].max() < 10.0
    np.testing.assert_allclose(out[2, 2, :3], 0.5, atol=1e-5)


def test_taa_converges_and_clamps():
    H, W = 16, 16
    cur = jnp.full((H, W, 3), 0.5)
    prev = jnp.full((H, W, 3), 0.9)
    out = np.asarray(taa(prev, cur, jnp.zeros((H, W, 2))))
    # history clamped into the (flat) neighborhood → equals cur
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_fxaa_smooths_staircase():
    H, W = 32, 32
    img = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        img[y, : y // 2] = 1.0  # staircase diagonal edge
    out = np.asarray(fxaa(jnp.asarray(img)))
    assert out.shape == img.shape
    # intermediate values appear along the edge
    frac_mid = ((out > 0.05) & (out < 0.95)).mean()
    assert frac_mid > 0.005
    # flat regions untouched
    np.testing.assert_allclose(out[:, -4:], 0.0, atol=1e-6)


def test_reproject_bilinear_shift():
    H, W = 8, 8
    grad = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, :, None], (H, W, 1)
    )
    mv = jnp.full((H, W, 2), 0.0).at[..., 0].set(1.0)  # sample from x+1
    out, valid = reproject(grad, mv)
    np.testing.assert_allclose(np.asarray(out[0, 3, 0]), 4.0, atol=1e-5)
