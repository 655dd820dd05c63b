"""Temporal anti-aliasing with neighborhood clamping.

Equivalent of the TAA stage inside merian's SVGF node
(default_config.json:473-496 `svgf/taa`): reproject the previous output
along motion vectors, clamp it to the 3×3 neighborhood min/max of the
current frame (ghosting suppression), and blend.
"""
from __future__ import annotations

import jax.numpy as jnp

from .accumulate import reproject
from .svgf import _shift


def taa(prev_out, cur, mv, blend_alpha=0.1):
    """prev_out/cur: f32[H, W, 3]; mv: f32[H, W, 2]. Returns new output."""
    hist, valid = reproject(prev_out, mv, fallback=cur)
    lo = cur
    hi = cur
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(cur, dy, dx)
            lo = jnp.minimum(lo, s)
            hi = jnp.maximum(hi, s)
    hist = jnp.clip(hist, lo, hi)
    out = hist + (cur - hist) * blend_alpha
    return jnp.where(valid[..., None], out, cur)
