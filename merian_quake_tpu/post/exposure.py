"""Automatic exposure.

Equivalent of merian's Exposure node in auto mode
(default_config.json:498-515): scales the HDR image by
key / exp(mean(log(luminance))) — the classic Reinhard log-average key.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import color as color_ops


def auto_exposure(img, key=0.18, eps=1e-4):
    """img: f32[H, W, 3or4]; returns (scaled rgb, scale)."""
    rgb = img[..., :3]
    lum = color_ops.yuv_luminance(rgb)
    log_avg = jnp.exp(jnp.mean(jnp.log(lum + eps)))
    scale = key / jnp.maximum(log_avg, eps)
    return rgb * scale, scale


def manual_exposure(img, iso_scale=1.0):
    return img[..., :3] * iso_scale, jnp.asarray(iso_scale)
