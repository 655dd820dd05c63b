"""HUD overlay: health/armor bars, crosshair, screen blend, liquid tint.

Port of /root/reference/src/hud/hud.comp (72 lines): draws translucent
status bars bottom-left, a crosshair at the center, mixes in the game's
screen-blend color (damage/pickup flashes), and applies a transmittance-
based tint when the camera is underwater/lava/slime using the gbuffer's
linear depth (hud.comp:32-69).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class HudState(NamedTuple):
    health: float = 100.0
    armor: float = 0.0
    screen_blend: tuple = (0.0, 0.0, 0.0, 0.0)  # rgba flash
    liquid: int = 0  # 0 none, 1 water, 2 lava, 3 slime


_LIQUID_TINT = {
    1: (0.12, 0.25, 0.45),
    2: (0.9, 0.25, 0.05),
    3: (0.2, 0.5, 0.1),
}
_LIQUID_DENSITY = {1: 0.004, 2: 0.02, 3: 0.01}


def apply_hud(ldr, linear_z, hud: HudState):
    """ldr: f32[H, W, 3]; linear_z: f32[H, W]. Returns composited image."""
    H, W = ldr.shape[:2]
    out = ldr

    # liquid tint: blend toward the tint with depth-based transmittance
    if hud.liquid in _LIQUID_TINT:
        tint = jnp.asarray(_LIQUID_TINT[hud.liquid])
        trans = jnp.exp(-_LIQUID_DENSITY[hud.liquid] * linear_z)[..., None]
        out = out * trans + tint * (1.0 - trans)

    # screen blend (damage flash etc.)
    br, bg, bb, ba = hud.screen_blend
    if ba > 0.0:
        out = out * (1.0 - ba) + jnp.asarray([br, bg, bb]) * ba

    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")

    # health bar (red→green), bottom-left (hud.comp bar layout)
    bar_w = W // 4
    bar_h = max(H // 48, 2)
    x0, y0 = W // 32, H - 3 * bar_h
    frac = jnp.clip(hud.health / 100.0, 0.0, 1.0)
    in_bar = (yy >= y0) & (yy < y0 + bar_h) & (xx >= x0) & (xx < x0 + bar_w)
    filled = in_bar & (xx < x0 + (frac * bar_w).astype(jnp.int32))
    col = jnp.asarray([1.0 - frac, frac, 0.05])
    out = jnp.where(filled[..., None], out * 0.25 + col * 0.75, out)
    out = jnp.where(
        (in_bar & ~filled)[..., None], out * 0.6 + 0.05, out
    )

    # armor bar above it
    if hud.armor > 0:
        y1 = y0 - 2 * bar_h
        afrac = jnp.clip(hud.armor / 100.0, 0.0, 1.0)
        in_ab = (yy >= y1) & (yy < y1 + bar_h) & (xx >= x0) & (xx < x0 + bar_w)
        afilled = in_ab & (xx < x0 + (afrac * bar_w).astype(jnp.int32))
        out = jnp.where(
            afilled[..., None],
            out * 0.25 + jnp.asarray([0.9, 0.75, 0.1]) * 0.75,
            out,
        )
        out = jnp.where((in_ab & ~afilled)[..., None], out * 0.6 + 0.05, out)

    # crosshair
    cx, cy = W // 2, H // 2
    arm = max(W // 160, 2)
    cross = (
        ((jnp.abs(xx - cx) <= arm) & (jnp.abs(yy - cy) == 0))
        | ((jnp.abs(yy - cy) <= arm) & (jnp.abs(xx - cx) == 0))
    )
    out = jnp.where(cross[..., None], 1.0 - out, out)
    return out
