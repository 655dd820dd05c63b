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


def oklch_to_rgb(lch: jnp.ndarray) -> jnp.ndarray:
    """OKLCh [..., 3] (L, C, h in radians) → linear sRGB [..., 3].

    Equivalent of merian-shaders colors_oklch.glsl (used by the MCPG
    grid debug view, mcpg.comp:237-241). Ottosson's OKLab transform.
    """
    L = lch[..., 0]
    C = lch[..., 1]
    h = lch[..., 2]
    a = C * jnp.cos(h)
    b = C * jnp.sin(h)
    l_ = L + 0.3963377774 * a + 0.2158037573 * b
    m_ = L - 0.1055613458 * a - 0.0638541728 * b
    s_ = L - 0.0894841775 * a - 1.2914855480 * b
    l3, m3, s3 = l_ ** 3, m_ ** 3, s_ ** 3
    r = 4.0767416621 * l3 - 3.3077115913 * m3 + 0.2309699292 * s3
    g = -1.2684380046 * l3 + 2.6097574011 * m3 - 0.3413193965 * s3
    bb = -0.0041960863 * l3 - 0.7034186147 * m3 + 1.7076147010 * s3
    return jnp.clip(jnp.stack([r, g, bb], axis=-1), 0.0, 1.0)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )
