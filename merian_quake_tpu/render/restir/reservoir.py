"""Weighted reservoir sampling library (SoA, batched over pixels).

Port of res/shader/render_restir/restir_di.glsl +
restir_di_reservoir.glsl.h. The one-sample estimator is
<L> = f(y)/p_target · W  with W = w_sum/(M·p_target) after finalize.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops import rng as rng_ops

FLAG_VALID = 1


class Reservoir(NamedTuple):
    """ReSTIRDIReservoir SoA; sample y inlined (restir_di_reservoir.glsl.h)."""

    M: jnp.ndarray  # i32[N]
    w: jnp.ndarray  # f32[N] w_sum (RIS) or W (finalized)
    p_target: jnp.ndarray  # f32[N]
    y_pos: jnp.ndarray  # f32[N, 3]
    y_normal: jnp.ndarray  # f32[N, 3]
    y_mv: jnp.ndarray  # f32[N, 3] sample motion
    y_T: jnp.ndarray  # f32[N] sample timestamp
    y_radiance: jnp.ndarray  # f32[N, 3]
    y_flags: jnp.ndarray  # u32[N]


def reservoir_init(n: int) -> Reservoir:
    return Reservoir(
        M=jnp.zeros((n,), jnp.int32),
        w=jnp.zeros((n,)),
        p_target=jnp.zeros((n,)),
        y_pos=jnp.zeros((n, 3)),
        y_normal=jnp.zeros((n, 3)),
        y_mv=jnp.zeros((n, 3)),
        y_T=jnp.zeros((n,)),
        y_radiance=jnp.zeros((n, 3)),
        y_flags=jnp.zeros((n,), jnp.uint32),
    )


def _select_y(take, a: Reservoir, b_pos, b_normal, b_mv, b_T, b_rad, b_flags):
    t3 = take[..., None]
    return a._replace(
        y_pos=jnp.where(t3, b_pos, a.y_pos),
        y_normal=jnp.where(t3, b_normal, a.y_normal),
        y_mv=jnp.where(t3, b_mv, a.y_mv),
        y_T=jnp.where(take, b_T, a.y_T),
        y_radiance=jnp.where(t3, b_rad, a.y_radiance),
        y_flags=jnp.where(take, b_flags, a.y_flags),
    )


def add_sample(
    r: Reservoir,
    rng_state,
    mask,
    pos,
    normal,
    mv,
    T,
    radiance,
    flags,
    p_sample,
    p_target,
):
    """restir_di_reservoir_add_sample, masked per lane."""
    w = jnp.where(mask, p_target / jnp.maximum(p_sample, 1e-20), 0.0)
    new_wsum = r.w + w
    new_m = r.M + mask.astype(jnp.int32)
    rng_state, u = rng_ops.uniform(rng_state)
    take = mask & (u * new_wsum < w)
    out = r._replace(
        M=new_m,
        w=new_wsum,
        p_target=jnp.where(take, p_target, r.p_target),
    )
    out = _select_y(take, out, pos, normal, mv, T, radiance, flags)
    return rng_state, out, take


def combine_finalized(r: Reservoir, rng_state, other: Reservoir, p_target_xy, mask=None):
    """restir_di_reservoir_combine_finalized (other.w holds W)."""
    if mask is None:
        mask = jnp.ones(r.M.shape, bool)
    w = jnp.where(mask, p_target_xy * other.w * other.M.astype(jnp.float32), 0.0)
    new_m = r.M + jnp.where(mask, other.M, 0)
    new_wsum = r.w + w
    rng_state, u = rng_ops.uniform(rng_state)
    take = mask & (u * new_wsum < w)
    out = r._replace(
        M=new_m,
        w=new_wsum,
        p_target=jnp.where(take, p_target_xy, r.p_target),
    )
    out = _select_y(
        take, out, other.y_pos, other.y_normal, other.y_mv, other.y_T,
        other.y_radiance, other.y_flags,
    )
    return rng_state, out, take


def finalize(r: Reservoir) -> Reservoir:
    """w_sum → W = w_sum/(M·p_target) (eq. 6)."""
    denom = r.M.astype(jnp.float32) * r.p_target
    return r._replace(w=jnp.where(denom > 0.0, r.w / jnp.maximum(denom, 1e-30), 0.0))


def finalize_custom(r: Reservoir, numerator, denominator) -> Reservoir:
    denom = denominator * r.p_target
    return r._replace(
        w=jnp.where(denom > 0.0, r.w * numerator / jnp.maximum(denom, 1e-30), 0.0)
    )


def discard(r: Reservoir, mask) -> Reservoir:
    """restir_di_reservoir_discard on masked lanes."""
    return r._replace(
        w=jnp.where(mask, 0.0, r.w),
        y_flags=jnp.where(mask, 0, r.y_flags),
        y_radiance=jnp.where(mask[..., None], 0.0, r.y_radiance),
    )


def valid(r: Reservoir):
    return (r.y_flags & FLAG_VALID) > 0
