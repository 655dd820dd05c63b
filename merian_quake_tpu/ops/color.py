"""Color helpers: luminance, LDR→HDR emission boost, sRGB.

Equivalents of ``merian-shaders/color/colors_yuv.glsl`` (yuv_luminance)
and the project's ``ldr_to_hdr`` emission heuristic
(/root/reference/res/shader/raytrace.glsl:62-65).
"""
from __future__ import annotations

import jax.numpy as jnp


def yuv_luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """BT.709 luma of linear RGB [..., 3]."""
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )


def ldr_to_hdr(color: jnp.ndarray) -> jnp.ndarray:
    """Heuristic emission boost for fullbright LDR texels.

    l = clamp(mean(c)^0.1, 0, 0.99); sqrt(c) * 2 * l/(1-l)
    (raytrace.glsl:62-65).
    """
    mean = jnp.mean(color, axis=-1, keepdims=True)
    l = jnp.clip(jnp.power(jnp.maximum(mean, 0.0), 0.1), 0.0, 0.99)
    return jnp.sqrt(jnp.maximum(color, 0.0)) * 2.0 * l / (1.0 - l)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )
