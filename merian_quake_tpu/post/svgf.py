"""SVGF denoiser: temporal integration + variance-guided à-trous filter.

Equivalent of merian's SVGF node (default_config.json:473-496,675-698;
Schied et al. 2017): motion-vector reprojection with normal/depth
validity gating, temporally integrated first/second luminance moments,
spatial variance fallback for short histories, and N edge-aware à-trous
wavelet iterations with luminance/normal/depth stopping functions. All
operations are static-shape image convolutions/gathers — XLA-friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import color as color_ops
from .accumulate import reproject


class SVGFParams(NamedTuple):
    iterations: int = 5
    alpha_irr: float = 0.05
    alpha_moments: float = 0.2
    sigma_z: float = 1.0
    sigma_n: float = 128.0
    sigma_l: float = 10.0
    normal_reject_cos: float = 0.8
    depth_reject: float = 0.1  # relative depth difference gate


class SVGFState(NamedTuple):
    irr: jnp.ndarray  # f32[H, W, 3] integrated irradiance
    moments: jnp.ndarray  # f32[H, W, 2] integrated (l, l²)
    history_len: jnp.ndarray  # f32[H, W]
    normal: jnp.ndarray  # f32[H, W, 3] previous normals
    linear_z: jnp.ndarray  # f32[H, W]


def init_svgf_state(height: int, width: int) -> SVGFState:
    return SVGFState(
        irr=jnp.zeros((height, width, 3)),
        moments=jnp.zeros((height, width, 2)),
        history_len=jnp.zeros((height, width)),
        normal=jnp.zeros((height, width, 3)),
        linear_z=jnp.full((height, width), 1e30),
    )


def _shift(img, dy, dx):
    """Shift with edge clamp (static offsets)."""
    H, W = img.shape[:2]
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[ys][:, xs]


def temporal(
    state: SVGFState,
    irr: jnp.ndarray,  # f32[H,W,3] this frame's noisy irradiance
    moments_in: jnp.ndarray,  # f32[H,W] second moment from the integrator
    mv: jnp.ndarray,  # f32[H,W,2]
    normal: jnp.ndarray,
    linear_z: jnp.ndarray,
    z_grad: jnp.ndarray,
    params: SVGFParams,
):
    """Temporal reprojection + moment integration.

    Returns (new state pieces, integrated irr, variance estimate).
    """
    lum = color_ops.yuv_luminance(irr)
    mom = jnp.stack([lum, moments_in], axis=-1)

    prev_irr, valid_b = reproject(state.irr, mv)
    prev_mom, _ = reproject(state.moments, mv)
    prev_hist, _ = reproject(state.history_len[..., None], mv)
    prev_n, _ = reproject(state.normal, mv)
    prev_z, _ = reproject(state.linear_z[..., None], mv)

    # reprojection validity (merian-shaders/reprojection.glsl semantics)
    n_ok = (prev_n * normal).sum(-1) > params.normal_reject_cos
    z_scale = jnp.abs(z_grad).sum(-1) + 1e-2
    z_ok = jnp.abs(prev_z[..., 0] - linear_z) / (
        z_scale + jnp.abs(linear_z) * 1e-2 + 1e-4
    ) < params.depth_reject * 10.0
    valid = valid_b & n_ok & z_ok

    hist = jnp.where(valid, prev_hist[..., 0] + 1.0, 1.0)
    a_i = jnp.maximum(params.alpha_irr, 1.0 / hist)[..., None]
    a_m = jnp.maximum(params.alpha_moments, 1.0 / hist)[..., None]
    int_irr = jnp.where(
        valid[..., None], prev_irr + (irr - prev_irr) * a_i, irr
    )
    int_mom = jnp.where(
        valid[..., None], prev_mom + (mom - prev_mom) * a_m, mom
    )

    var_t = jnp.maximum(int_mom[..., 1] - jnp.square(int_mom[..., 0]), 0.0)
    # spatial variance fallback for short history (3×3 luminance moments)
    l1 = jnp.zeros_like(lum)
    l2 = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(lum[..., None], dy, dx)[..., 0]
            l1 = l1 + s
            l2 = l2 + s * s
    var_s = jnp.maximum(l2 / 9.0 - jnp.square(l1 / 9.0), 0.0)
    variance = jnp.where(hist < 4.0, jnp.maximum(var_t, var_s), var_t)

    new_state = SVGFState(
        irr=int_irr,
        moments=int_mom,
        history_len=hist,
        normal=normal,
        linear_z=linear_z,
    )
    return new_state, int_irr, variance


_ATROUS_H = (1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16)


def atrous_iteration(
    irr, variance, normal, linear_z, z_grad, step: int, params: SVGFParams
):
    """One edge-aware à-trous wavelet iteration with 5×5 support."""
    lum = color_ops.yuv_luminance(irr)
    # gaussian-prefiltered variance for the luminance weight
    gv = 0.0
    gw = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = (0.25 if dy == 0 else 0.125) * (0.25 if dx == 0 else 0.125) * 4
            gv = gv + w * _shift(variance[..., None], dy, dx)[..., 0]
            gw = gw + w
    sigma_l_denom = params.sigma_l * jnp.sqrt(jnp.maximum(gv / gw, 0.0)) + 1e-8

    acc_irr = jnp.zeros_like(irr)
    acc_var = jnp.zeros_like(variance)
    acc_w = jnp.zeros_like(variance)
    z_scale = jnp.abs(z_grad).sum(-1) * step + 1e-2
    for iy, dy in enumerate((-2, -1, 0, 1, 2)):
        for ix, dx in enumerate((-2, -1, 0, 1, 2)):
            h = _ATROUS_H[iy] * _ATROUS_H[ix]
            oy, ox = dy * step, dx * step
            irr_q = _shift(irr, oy, ox)
            var_q = _shift(variance[..., None], oy, ox)[..., 0]
            lum_q = _shift(lum[..., None], oy, ox)[..., 0]
            n_q = _shift(normal, oy, ox)
            z_q = _shift(linear_z[..., None], oy, ox)[..., 0]
            w_n = jnp.power(
                jnp.maximum((normal * n_q).sum(-1), 0.0), params.sigma_n
            )
            w_z = jnp.exp(
                -jnp.abs(linear_z - z_q)
                / (params.sigma_z * z_scale * (abs(dy) + abs(dx) + 1e-8) + 1e-8)
            )
            w_l = jnp.exp(-jnp.abs(lum - lum_q) / sigma_l_denom)
            w = h * w_n * w_z * w_l
            acc_irr = acc_irr + irr_q * w[..., None]
            acc_var = acc_var + var_q * w * w
            acc_w = acc_w + w
    out_irr = acc_irr / jnp.maximum(acc_w, 1e-8)[..., None]
    out_var = acc_var / jnp.maximum(acc_w * acc_w, 1e-8)
    return out_irr, out_var


def svgf_filter(
    irr, variance, normal, linear_z, z_grad, params: SVGFParams
):
    """Run `iterations` à-trous passes with doubling step size."""
    for i in range(params.iterations):
        irr, variance = atrous_iteration(
            irr, variance, normal, linear_z, z_grad, 1 << i, params
        )
    return irr


def svgf(
    state: SVGFState,
    irr,
    moments_in,
    mv,
    normal,
    linear_z,
    z_grad,
    albedo,
    params: SVGFParams = SVGFParams(),
):
    """Full SVGF: temporal + spatial filter + albedo re-modulation.

    Returns (new_state, filtered beauty rgb).
    """
    new_state, int_irr, variance = temporal(
        state, irr, moments_in, mv, normal, linear_z, z_grad, params
    )
    filtered = svgf_filter(int_irr, variance, normal, linear_z, z_grad, params)
    # merian's SVGF re-modulates albedo internally
    return new_state, filtered * jnp.maximum(albedo, 0.0)
