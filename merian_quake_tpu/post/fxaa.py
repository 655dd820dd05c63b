"""FXAA 3.11-style anti-aliasing (console quality preset).

Equivalent of merian's FXAA node (default_config.json:517-525). Operates
on LDR sRGB-ish input using luma-based edge detection and a 4-tap blend.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import color as color_ops
from .svgf import _shift


def fxaa(rgb, contrast_threshold=0.0312, relative_threshold=0.125):
    """rgb: f32[H, W, 3] in [0, 1]. Returns anti-aliased image."""
    luma = color_ops.yuv_luminance(rgb)

    l_c = luma
    l_n = _shift(luma[..., None], -1, 0)[..., 0]
    l_s = _shift(luma[..., None], 1, 0)[..., 0]
    l_e = _shift(luma[..., None], 0, 1)[..., 0]
    l_w = _shift(luma[..., None], 0, -1)[..., 0]
    l_ne = _shift(luma[..., None], -1, 1)[..., 0]
    l_nw = _shift(luma[..., None], -1, -1)[..., 0]
    l_se = _shift(luma[..., None], 1, 1)[..., 0]
    l_sw = _shift(luma[..., None], 1, -1)[..., 0]

    l_min = jnp.minimum(
        l_c, jnp.minimum(jnp.minimum(l_n, l_s), jnp.minimum(l_e, l_w))
    )
    l_max = jnp.maximum(
        l_c, jnp.maximum(jnp.maximum(l_n, l_s), jnp.maximum(l_e, l_w))
    )
    contrast = l_max - l_min
    threshold = jnp.maximum(
        contrast_threshold, relative_threshold * l_max
    )
    active = contrast >= threshold

    # blend factor from neighborhood average
    avg = (
        2.0 * (l_n + l_s + l_e + l_w) + l_ne + l_nw + l_se + l_sw
    ) / 12.0
    blend = jnp.clip(jnp.abs(avg - l_c) / jnp.maximum(contrast, 1e-8), 0.0, 1.0)
    blend = jnp.square(jnp.clip(blend * blend * (3.0 - 2.0 * blend), 0.0, 1.0))

    # edge direction: horizontal vs vertical contrast
    horiz = (
        jnp.abs(l_n + l_s - 2 * l_c) * 2
        + jnp.abs(l_ne + l_se - 2 * l_e)
        + jnp.abs(l_nw + l_sw - 2 * l_w)
    )
    vert = (
        jnp.abs(l_e + l_w - 2 * l_c) * 2
        + jnp.abs(l_ne + l_nw - 2 * l_n)
        + jnp.abs(l_se + l_sw - 2 * l_s)
    )
    is_horiz = horiz >= vert
    # pick the higher-gradient side along the edge normal
    pos_l = jnp.where(is_horiz, l_s, l_e)
    neg_l = jnp.where(is_horiz, l_n, l_w)
    pos_grad = jnp.abs(pos_l - l_c)
    neg_grad = jnp.abs(neg_l - l_c)
    pick_pos = pos_grad >= neg_grad

    pos_img = jnp.where(
        is_horiz[..., None], _shift(rgb, 1, 0), _shift(rgb, 0, 1)
    )
    neg_img = jnp.where(
        is_horiz[..., None], _shift(rgb, -1, 0), _shift(rgb, 0, -1)
    )
    neighbor = jnp.where(pick_pos[..., None], pos_img, neg_img)

    w = jnp.where(active, blend, 0.0)[..., None]
    return rgb * (1.0 - w) + neighbor * w
