"""End-to-end renderer tests: energy conservation, goldens, convergence.

Replaces the reference's golden-image workflow (SURVEY §4.3:
scripts/combine_images.py + error_plot.py) with in-repo assertions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from merian_quake_tpu.models.procedural import get_scene
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.renderer import render_sequence

import pytest

# compile-heavy integration tier (VERDICT r4 weak #6): run with the full
# suite / preflight; the core tier is pytest -m 'not slow'
pytestmark = pytest.mark.slow


def _render(scene, w, h, spp, frames, mpl=3, seed=1337):
    cfg = RenderConfig(width=w, height=h, spp=spp, max_path_length=mpl, seed=seed)
    return render_sequence(get_scene(scene), cfg, frames=frames)


def test_furnace_energy():
    """Pixel irradiance in the furnace = E × ∫ bsdf·cos dω.

    The scalar bsdf integral for roughness 0.6 is just below 1 (diffuse
    part is (1-0.02), specular adds a little, Smith shadowing removes a
    little). Anything far off 1.0 indicates an energy bug in the BSDF or
    a weighting bug in the integrator.
    """
    state, out = _render("furnace", 64, 36, spp=8, frames=4)
    irr = np.asarray(state.accum_irradiance[..., :3])
    mean = irr.mean()
    assert 0.93 < mean < 1.02, mean
    # uniform environment → low spatial variance after averaging
    assert irr.std() < 0.25


def test_furnace_direct_and_albedo():
    state, out = _render("furnace", 32, 18, spp=1, frames=1)
    direct = np.asarray(state.accum_direct[..., :3])
    np.testing.assert_allclose(direct, 1.0, atol=1e-3)  # every pixel sees E=1
    # albedo demodulation: emissive first hits have zero gbuffer albedo
    albedo = np.asarray(state.accum_albedo[..., :3])
    np.testing.assert_allclose(albedo, 0.0, atol=1e-5)


def test_box_sanity():
    state, out = _render("box", 96, 54, spp=2, frames=4)
    hdr = np.asarray(out["hdr"])
    assert np.isfinite(hdr).all()
    assert hdr.max() > 1.0  # light visible
    ldr = np.asarray(out["ldr"])
    assert 0.05 < ldr.mean() < 0.9
    # light patch (top center) must be the brightest region
    H, W = ldr.shape[:2]
    top = ldr[: H // 6, W // 3 : 2 * W // 3].mean()
    assert top > ldr.mean()


def test_deterministic_given_seed():
    s1, o1 = _render("box", 48, 27, spp=1, frames=2, seed=7)
    s2, o2 = _render("box", 48, 27, spp=1, frames=2, seed=7)
    np.testing.assert_array_equal(
        np.asarray(o1["hdr"]), np.asarray(o2["hdr"])
    )
    s3, o3 = _render("box", 48, 27, spp=1, frames=2, seed=8)
    assert np.abs(np.asarray(o1["hdr"]) - np.asarray(o3["hdr"])).max() > 0


def test_convergence_rate():
    """relMSE between a K-frame estimate and a high-sample reference
    should drop roughly linearly in total sample count."""
    ref_state, _ = _render("box", 32, 18, spp=8, frames=24, seed=99)
    ref = np.asarray(ref_state.accum_irradiance[..., :3])

    def relmse(frames, seed):
        st, _ = _render("box", 32, 18, spp=2, frames=frames, seed=seed)
        est = np.asarray(st.accum_irradiance[..., :3])
        return ((est - ref) ** 2 / (ref**2 + 1e-2)).mean()

    e1 = relmse(2, 5)
    e2 = relmse(16, 5)
    assert e2 < e1 * 0.35, (e1, e2)  # 8× samples → ≥ ~3× lower relMSE


def test_mv_zero_for_static_camera():
    state, out = _render("box", 48, 27, spp=1, frames=1)
    mv = np.asarray(out["gbuffer"].mv)
    assert np.abs(mv).max() < 1e-2


def test_staged_frame_matches_monolithic():
    """render_frame_staged (four separately-jitted stages; exists for
    remote-compile latency, see renderer.py docstring) must be
    BIT-IDENTICAL to the monolithic render_frame — same ops, the jit
    boundaries only materialize stage outputs. Covers mcpg with AND
    without the volume pass (the two staged shapes)."""
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.render.mcpg import MCPGConfig
    from merian_quake_tpu.render.mcpg.volume import VolumeConfig
    from merian_quake_tpu.renderer import (
        init_state, render_frame, render_frame_staged,
    )

    bundle = get_scene("box")
    accel = build_accel(bundle.scene, bundle.atlas)
    for vol in (None, VolumeConfig()):
        mcfg = MCPGConfig(
            mc_adaptive_size=1 << 10, mc_static_size=1 << 8,
            lc_size=1 << 8, volume=vol,
        )
        config = RenderConfig(
            width=64, height=32, spp=1, max_path_length=3,
            integrator="mcpg",
            features=scene_features(
                bundle.scene, bundle.uniforms, bundle.atlas
            ),
        )
        s_m = init_state(config, mcfg)
        s_s = init_state(config, mcfg)
        u = bundle.uniforms
        for f in range(3):
            u = u._replace(frame=jnp.uint32(f))
            s_m, o_m = render_frame(
                accel, bundle.atlas, u, config, s_m, mcfg
            )
            s_s, o_s = render_frame_staged(
                accel, bundle.atlas, u, config, s_s, mcfg
            )
        np.testing.assert_array_equal(
            np.asarray(o_m["ldr"]), np.asarray(o_s["ldr"])
        )
        np.testing.assert_array_equal(
            np.asarray(s_m.mcpg.mc.sum_w), np.asarray(s_s.mcpg.mc.sum_w)
        )
        if vol is not None:
            np.testing.assert_array_equal(
                np.asarray(s_m.volume.dist_mc.sum_w),
                np.asarray(s_s.volume.dist_mc.sum_w),
            )
