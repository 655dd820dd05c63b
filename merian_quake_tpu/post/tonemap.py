"""Tonemapping.

Equivalent of merian's Tonemap node configured as extended Reinhard
(default_config.json:633-648): L_out = L (1 + L/white²) / (1 + L),
applied in luminance, followed by the sRGB OETF.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import color as color_ops


def tonemap_reinhard_extended(rgb, white=4.0, srgb=True):
    lum = color_ops.yuv_luminance(rgb)[..., None]
    lum = jnp.maximum(lum, 1e-8)
    l_out = lum * (1.0 + lum / (white * white)) / (1.0 + lum)
    out = jnp.clip(rgb * (l_out / lum), 0.0, 1.0)
    if srgb:
        out = color_ops.linear_to_srgb(out)
    return out
