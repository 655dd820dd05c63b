"""In-game text overlay tests (centerprint/console log rendering,
reference QuakeMessageOverlay, merian-quake.cpp:55-131)."""
import numpy as np

from merian_quake_tpu.game.font import GLYPH_H, GLYPH_W, render_text, draw_text


def test_render_text_shapes_and_glyphs():
    m = render_text("AB")
    assert m.shape == (GLYPH_H, 2 * GLYPH_W)
    assert m.sum() > 20  # both glyphs have ink
    m2 = render_text("A\nBC")
    assert m2.shape == (2 * GLYPH_H, 2 * GLYPH_W)
    # unknown chars fall back to '?'
    np.testing.assert_array_equal(
        render_text("\x01"), render_text("?")
    )
    # lowercase maps to uppercase
    np.testing.assert_array_equal(render_text("abc"), render_text("ABC"))


def test_draw_text_centered_with_outline():
    img = np.full((64, 128, 3), 0.5, np.float32)
    out = draw_text(img, "HI", cx=None, y=20, color=(1.0, 0.0, 0.0))
    assert out.shape == img.shape
    diff = np.abs(out - img).sum(axis=-1)
    ys, xs = np.nonzero(diff)
    assert len(ys) > 0
    # vertically where asked, horizontally centered
    assert ys.min() >= 19 and ys.max() <= 20 + GLYPH_H + 1
    cx = (xs.min() + xs.max()) / 2
    assert abs(cx - 64) < GLYPH_W
    # glyph pixels are the fill color, outline darker than background
    assert (out[..., 0] == 1.0).any()
    assert (out[..., 0] == 0.125).any()


def test_live_centerprint_renders_into_frame():
    """Arena-mod secret trigger: the centerprint must visibly render
    into the played frame (VERDICT r2 #8 done criterion)."""
    from merian_quake_tpu.game.mod import make_arena

    live = make_arena(dynamic_capacity=512)
    dx, dy = 256.0 - 64.0, 140.0 - 256.0
    yaw = float(np.degrees(np.arctan2(dy, dx)))
    hit = False
    for _ in range(220):
        live.step(1.0 / 30.0, forward=320.0, yaw=yaw)
        if any(k == "center" for k, _ in live.overlay_texts()):
            hit = True
            break
    assert hit, "secret centerprint never became active"
    frame = np.full((120, 160, 3), 0.3, np.float32)
    out = live.draw_overlays(frame)
    changed = np.abs(out - frame).sum(axis=-1) > 1e-6
    assert changed.sum() > 50, "overlay drew nothing"
    ys = np.nonzero(changed)[0]
    assert ys.min() >= 120 // 3 - 2  # centerprint sits in the mid third

    # expires after the hold time (walk back out of the trigger zone
    # first — standing in it re-fires the QC centerprint every 1.5 s)
    for _ in range(40):
        live.step(1.0 / 30.0, forward=-320.0, yaw=yaw)
    for _ in range(90):
        live.step(1.0 / 30.0)
    assert all(k != "center" for k, _ in live.overlay_texts())
