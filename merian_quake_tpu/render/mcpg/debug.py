"""MCPG debug visualizations.

Port of the 9 debug output selectors of
/root/reference/res/shader/render_mcpg/mcpg.comp:212-277 (compiled in
when the debug image connector is attached, render_mcpg.cpp:182-184).
Each view inspects the learned guiding state at the FIRST HIT of every
pixel:

  0  light cache irradiance ×5
  1  adaptive MC learned irradiance (sum_w × 0.1)
  2  adaptive MC learned direction ((vMF μ + 1)/2)
  3  adaptive MC grid cells (random OKLCh color per cell hash,
     lightness modulated by camera distance)
  4  path irradiance
  5  (luminance, second moment, 0)
  6  adaptive MC learned mean cosine (1 − acos(w_cos/sum_w)/π)
  7  adaptive MC chain length N / ML_MAX_N
  8  adaptive MC state velocity (mv)

Exposed as ``cli render --integrator mcpg --debug N``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...models.types import RenderConfig, Uniforms
from ...ops import color as color_ops, hashgrid, linalg, rng as rng_ops
from .. import layout
from ..gbuffer import GBufferOutput
from ..hit import decompress_hit
from .config import MCPGConfig, MCPGState
from . import grids
from .light_cache import lc_get

DEBUG_VIEWS = {
    0: "light cache",
    1: "MC learned irradiance",
    2: "MC learned directions",
    3: "MC grid",
    4: "irradiance",
    5: "moments",
    6: "MC learned cos",
    7: "MC N",
    8: "MC MV",
}


def render_mcpg_debug(
    selector: int,
    uniforms: Uniforms,
    config: RenderConfig,
    mcfg: MCPGConfig,
    mstate: MCPGState,
    gbuf: GBufferOutput,
    irradiance: jnp.ndarray,  # f32[H, W, 4] surface pass output
) -> jnp.ndarray:
    """One debug view as f32[H, W, 3] (mcpg.comp:212-277)."""
    W, H = config.width, config.height
    first_hit = decompress_hit(gbuf.hits)
    pos, normal = first_hit.pos, first_hit.normal
    cam_x = uniforms.cam_x
    irr = irradiance.reshape(-1, 4)[:, :3]
    m2 = irradiance.reshape(-1, 4)[:, 3]

    pxi, pyi = layout.gen_pixels(W, H)
    rng = rng_ops.seed_pixel(
        pxi, pyi, uniforms.frame, jnp.uint32(config.seed) ^ jnp.uint32(0xDEB)
    )

    if selector == 0:
        # -- show light cache --
        rng, lc_irr = lc_get(rng, mstate.lc, pos, normal, cam_x, mcfg)
        out = lc_irr * 5.0
    elif selector in (1, 2, 6, 7, 8):
        # adaptive load at the first hit (mc_adaptive_load)
        rng, buf, h = grids.adaptive_cell(rng, pos, normal, cam_x, mcfg)
        st = grids.gather_state(mstate.mc, buf.astype(jnp.int32))
        st = grids.finalize_load(st, h, uniforms.cl_time)
        if selector == 1:
            out = jnp.broadcast_to((st.sum_w * 0.1)[:, None], pos.shape)
        elif selector == 2:
            mu, _ = grids.state_vmf(st, pos, mcfg)
            out = (mu + 1.0) * 0.5
        elif selector == 6:
            have = st.sum_w > 0.0
            ratio = jnp.clip(
                st.w_cos / jnp.where(have, st.sum_w, 1.0), -1.0, 1.0
            )
            v = jnp.where(
                have,
                1.0 - jnp.clip(jnp.arccos(ratio) / jnp.pi, 0.0, 1.0),
                0.0,
            )
            out = jnp.broadcast_to(v[:, None], pos.shape)
        elif selector == 7:
            out = jnp.broadcast_to(
                (st.N.astype(jnp.float32) / mcfg.ml_max_n)[:, None], pos.shape
            )
        else:
            out = st.mv
    elif selector == 3:
        # -- MC grid: random OKLCh color per closest cell at the
        # deterministic target level (mcpg.comp:237-241) --
        level = grids.adaptive_target_level(pos, cam_x, mcfg)
        width = grids._adaptive_width_for_level(level, mcfg)
        idx = hashgrid.grid_idx_closest(pos, width[..., None])
        seed = hashgrid.hash2_grid(idx)
        s1 = rng_ops.xorshift32_raw(jnp.maximum(seed, 1).astype(jnp.uint32))
        u1 = s1.astype(jnp.float32) / 4294967296.0
        s2 = rng_ops.xorshift32_raw(s1)
        u2 = s2.astype(jnp.float32) / 4294967296.0
        dist = linalg.distance(cam_x, pos)
        L = jnp.exp(-0.001 * dist) * u1 + 0.2
        lch = jnp.stack(
            [L, jnp.full_like(L, 0.2), 2.0 * jnp.pi * u2], axis=-1
        )
        out = color_ops.oklch_to_rgb(lch)
    elif selector == 4:
        out = irr
    elif selector == 5:
        out = jnp.stack(
            [color_ops.yuv_luminance(irr), m2, jnp.zeros_like(m2)], axis=-1
        )
    else:
        raise ValueError(f"unknown debug selector {selector} "
                         f"(valid: {sorted(DEBUG_VIEWS)})")
    return layout.flat_to_image(out, W, H)
