"""Tile-major pixel layout: invariants + render equivalence."""
import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.render import layout


def test_roundtrip_and_index_of():
    W, H = 256, 16  # tiled (divisible by 128x8)
    assert layout.is_tiled(W, H)
    px, py = layout.gen_pixels(W, H)
    img = jnp.arange(H * W).reshape(H, W)
    flat = layout.image_to_flat(img, W, H)
    # flat[i] must be the pixel at (px[i], py[i])
    np.testing.assert_array_equal(
        np.asarray(flat), np.asarray(img)[np.asarray(py), np.asarray(px)]
    )
    # index_of inverts gen_pixels
    np.testing.assert_array_equal(
        np.asarray(layout.index_of(px, py, W, H)), np.arange(H * W)
    )
    # flat_to_image inverts image_to_flat
    np.testing.assert_array_equal(
        np.asarray(layout.flat_to_image(flat, W, H)), np.asarray(img)
    )


def test_fallback_scanline():
    W, H = 50, 30  # not tile-divisible
    assert not layout.is_tiled(W, H)
    px, py = layout.gen_pixels(W, H)
    np.testing.assert_array_equal(np.asarray(px)[:50], np.arange(50))
    np.testing.assert_array_equal(
        np.asarray(layout.index_of(px, py, W, H)), np.arange(H * W)
    )


def test_tiled_render_matches_scanline():
    """Tiled and scanline buffer orders must give identical images (the
    RNG is keyed on absolute pixel coords, so only the order differs)."""
    from merian_quake_tpu.models.procedural import cornell_box
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.renderer import render_sequence

    bundle = cornell_box()
    cfg = RenderConfig(width=128, height=16, spp=1, max_path_length=2)
    assert layout.is_tiled(cfg.width, cfg.height)
    st, out = render_sequence(bundle, cfg, frames=1)
    img_tiled = np.asarray(out["irradiance"])
    try:
        layout.FORCE_SCANLINE = True
        # cache-bust: max_intersections 5→6 changes the jit key without
        # changing results (the alpha loop exits data-dependently)
        cfg2 = cfg._replace(max_intersections=6)
        st2, out2 = render_sequence(bundle, cfg2, frames=1)
    finally:
        layout.FORCE_SCANLINE = False
    img_scan = np.asarray(out2["irradiance"])
    np.testing.assert_allclose(img_tiled, img_scan, atol=1e-5)
