"""Sharded (multi-chip) variants of the denoise chain.

The beauty-path post ops are image-space: à-trous taps reach ±2·step
rows, TAA/FXAA/variance estimates ±1, and temporal reprojection follows
unbounded motion vectors. Under row-slab sharding (parallel/render.py)
the spatial taps are served by HALO EXCHANGE — each device ppermutes
its boundary rows to its mesh neighbors (SURVEY.md §5's "ring-style
neighbor exchange ... at shard edges") and then runs the SINGLE-DEVICE
op verbatim on the padded slab, cropping the halo afterwards — while
the unbounded reprojection gathers read the ALL-GATHERED previous-frame
history with global row indexing (post.accumulate.reproject y0/rows).

Bit-identity with the single-device path holds by construction:
- interior shard borders: the halo rows ARE the neighbor's true rows;
- image borders: the halo replicates the edge row, exactly the clamp
  semantics of post.svgf._shift (clamp ≡ any number of replications);
- reprojection: same bilinear gather against the same full image.
Verified by tests/test_parallel.py::test_sharded_denoise_bit_identical.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .accumulate import reproject
from .svgf import SVGFParams, SVGFState, atrous_iteration
from .taa import taa as taa_single
from . import fxaa as fxaa_mod
from ..ops import color as color_ops


class ShardCtx(NamedTuple):
    """Row-slab sharding context, valid inside shard_map."""

    axis: str  # mesh axis name
    n: int  # number of shards
    rows: int  # rows per shard
    height: int  # full image height

    @property
    def y0(self):
        return jax.lax.axis_index(self.axis) * self.rows

    def halo_pad(self, x, r: int):
        """Pad a (rows, W[, C]) slab to (rows + 2r, W[, C]).

        Interior borders receive the neighbor's true boundary rows via
        ppermute; image borders replicate the edge row (the _shift
        clamp semantics)."""
        assert r >= 1 and r <= self.rows, (r, self.rows)
        idx = jax.lax.axis_index(self.axis)
        down = [(i, i + 1) for i in range(self.n - 1)]
        up = [(i, i - 1) for i in range(1, self.n)]
        from_above = jax.lax.ppermute(x[-r:], self.axis, down)
        from_below = jax.lax.ppermute(x[:r], self.axis, up)
        edge_top = jnp.broadcast_to(x[:1], (r,) + x.shape[1:])
        edge_bot = jnp.broadcast_to(x[-1:], (r,) + x.shape[1:])
        pad_top = jnp.where(idx == 0, edge_top, from_above)
        pad_bot = jnp.where(idx == self.n - 1, edge_bot, from_below)
        return jnp.concatenate([pad_top, x, pad_bot], axis=0)

    def gather_rows(self, x):
        """(rows, W[, C]) slab → full (height, W[, C]) image on every
        device (lax.all_gather over the row axis)."""
        g = jax.lax.all_gather(x, self.axis)  # (n, rows, ...)
        return g.reshape((self.height,) + x.shape[1:])

    def gather_flat(self, x, width: int):
        """Flat (rows·W[, C]) slab buffer → full flat (H·W[, C]) buffer
        in the FULL image's flat layout (via image space, so tiled flat
        layouts stay consistent on both sides)."""
        from ..render import layout

        img = layout.flat_to_image(x, width, self.rows)
        full = self.gather_rows(img)
        return layout.image_to_flat(full, width, self.height)


def svgf_sharded(
    ctx: ShardCtx,
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
    """Sharded SVGF: gathered-history temporal + halo-exchange à-trous.

    All arrays are row slabs; ``state`` images are sharded the same
    way. Returns (new_state slabs, filtered beauty rgb slab)."""
    # ---- temporal (svgf.temporal semantics, global-row reprojection of
    # the all-gathered previous state) ----
    lum = color_ops.yuv_luminance(irr)
    mom = jnp.stack([lum, moments_in], axis=-1)
    rp = lambda img: reproject(
        ctx.gather_rows(img), mv, y0=ctx.y0, rows=ctx.rows
    )
    prev_irr, valid_b = rp(state.irr)
    prev_mom, _ = rp(state.moments)
    prev_hist, _ = rp(state.history_len[..., None])
    prev_n, _ = rp(state.normal)
    prev_z, _ = rp(state.linear_z[..., None])

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
    # 3×3 spatial variance fallback via a 1-row halo on the input lum
    lum_p = ctx.halo_pad(lum[..., None], 1)[..., 0]
    l1 = jnp.zeros_like(lum_p)
    l2 = jnp.zeros_like(lum_p)
    from .svgf import _shift

    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(lum_p[..., None], dy, dx)[..., 0]
            l1 = l1 + s
            l2 = l2 + s * s
    var_s = jnp.maximum(l2 / 9.0 - jnp.square(l1 / 9.0), 0.0)[1:-1]
    variance = jnp.where(hist < 4.0, jnp.maximum(var_t, var_s), var_t)

    new_state = SVGFState(
        irr=int_irr,
        moments=int_mom,
        history_len=hist,
        normal=normal,
        linear_z=linear_z,
    )

    # ---- à-trous iterations with per-step halo exchange; steps whose
    # 2·step halo exceeds the slab fall back to gather-and-slice (the
    # whole image is computed redundantly on every device for that
    # iteration — only reachable on very short slabs) ----
    r_max = min(2 * (1 << max(params.iterations - 1, 0)), ctx.rows)
    aux_n = ctx.halo_pad(normal, r_max)
    aux_z = ctx.halo_pad(linear_z[..., None], r_max)[..., 0]
    aux_g = ctx.halo_pad(z_grad, r_max)
    full_n = full_z = full_g = None
    out_irr, out_var = int_irr, variance
    for i in range(params.iterations):
        step = 1 << i
        r = 2 * step
        if r <= ctx.rows:
            irr_p = ctx.halo_pad(out_irr, r)
            var_p = ctx.halo_pad(out_var[..., None], r)[..., 0]
            sl = slice(r_max - r, None if r_max == r else -(r_max - r))
            irr_p, var_p = atrous_iteration(
                irr_p, var_p, aux_n[sl], aux_z[sl], aux_g[sl], step, params
            )
            out_irr = irr_p[r:-r]
            out_var = var_p[r:-r]
        else:
            if full_n is None:
                full_n = ctx.gather_rows(normal)
                full_z = ctx.gather_rows(linear_z)
                full_g = ctx.gather_rows(z_grad)
            irr_f, var_f = atrous_iteration(
                ctx.gather_rows(out_irr),
                ctx.gather_rows(out_var),
                full_n, full_z, full_g, step, params,
            )
            y0 = ctx.y0
            out_irr = jax.lax.dynamic_slice_in_dim(irr_f, y0, ctx.rows, 0)
            out_var = jax.lax.dynamic_slice_in_dim(var_f, y0, ctx.rows, 0)
    return new_state, out_irr * jnp.maximum(albedo, 0.0)


def taa_sharded(ctx: ShardCtx, prev_out, cur, mv, blend_alpha=0.1):
    """Sharded TAA: gathered-history reprojection + 1-row-halo clamp."""
    hist, valid = reproject(
        ctx.gather_rows(prev_out), mv, fallback=cur, y0=ctx.y0,
        rows=ctx.rows,
    )
    from .svgf import _shift

    cur_p = ctx.halo_pad(cur, 1)
    lo = cur_p
    hi = cur_p
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift(cur_p, dy, dx)
            lo = jnp.minimum(lo, s)
            hi = jnp.maximum(hi, s)
    hist = jnp.clip(hist, lo[1:-1], hi[1:-1])
    out = hist + (cur - hist) * blend_alpha
    return jnp.where(valid[..., None], out, cur)


def fxaa_sharded(ctx: ShardCtx, rgb, **kw):
    """Sharded FXAA: 1-row halo, then the single-device op verbatim."""
    return fxaa_mod.fxaa(ctx.halo_pad(rgb, 1), **kw)[1:-1]
