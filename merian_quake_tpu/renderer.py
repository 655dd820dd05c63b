"""Simple frame driver: gbuffer → integrator → accumulate → post.

The minimum end-to-end slice (SURVEY.md §7 step 4). The declarative
frame graph (graph/) layers the full default_config.json pipeline on
top; this driver is the hand-wired equivalent of the reference's
default connection set for still-camera reference renders.

``frame_core`` renders an image-row slab [y0, y0+rows) so the same code
runs single-device (full image) and under ``shard_map`` with the pixel
grid sharded across a device mesh (parallel/render.py); cross-shard
terms (auto-exposure log-mean) are abstracted behind ``mean_fn``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .accel.build import AccelScene, build_accel
from .models.procedural import SceneBundle
from .models.types import RenderConfig, TextureAtlas, Uniforms
from .post.accumulate import accumulate
from .post.tonemap import tonemap_reinhard_extended
from .ops import color as color_ops
from .render.gbuffer import render_gbuffer
from .render.pt import render_pt


class FrameState(NamedTuple):
    """Device state threaded across frames (≈ the reference's history
    images held by Accumulate self-loop connections)."""

    accum_irradiance: jnp.ndarray  # f32[H, W, 4] path irradiance
    accum_direct: jnp.ndarray  # f32[H, W, 4] first-hit emission
    accum_albedo: jnp.ndarray  # f32[H, W, 4]
    iteration: jnp.ndarray  # i32[]


def init_state(config: RenderConfig) -> FrameState:
    H, W = config.height, config.width
    return FrameState(
        accum_irradiance=jnp.zeros((H, W, 4)),
        accum_direct=jnp.zeros((H, W, 4)),
        accum_albedo=jnp.zeros((H, W, 4)),
        iteration=jnp.zeros((), jnp.int32),
    )


def frame_core(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    config: RenderConfig,
    state: FrameState,
    y0=0,
    rows: int | None = None,
    mean_fn=lambda x: x,
):
    """One frame over an image-row slab. ``mean_fn`` reduces a local
    scalar mean to the global mean (lax.pmean under shard_map)."""
    rows = config.height if rows is None else rows
    gbuf = render_gbuffer(accel, atlas, uniforms, config, y0=y0, rows=rows)
    irr = render_pt(accel, atlas, uniforms, config, gbuf, y0=y0, rows=rows)
    new_state = FrameState(
        accum_irradiance=accumulate(state.accum_irradiance, irr, state.iteration),
        accum_direct=accumulate(
            state.accum_direct, gbuf.irradiance, state.iteration
        ),
        accum_albedo=accumulate(state.accum_albedo, gbuf.albedo, state.iteration),
        iteration=state.iteration + 1,
    )
    # beauty = demodulated path irradiance × albedo + direct emission
    # (the reference's add node combines the denoised renderer output
    # with gbuffer irradiance, default_config.json:118-128; SVGF
    # re-modulates albedo internally)
    beauty_hdr = (
        new_state.accum_irradiance[..., :3]
        * jnp.maximum(new_state.accum_albedo[..., :3], 0.0)
        + new_state.accum_direct[..., :3]
    )
    # auto exposure (key / log-average luminance, merian Exposure node)
    lum = color_ops.yuv_luminance(beauty_hdr)
    log_mean = mean_fn(jnp.mean(jnp.log(lum + 1e-4)))
    scale = 0.18 / jnp.maximum(jnp.exp(log_mean), 1e-4)
    ldr = tonemap_reinhard_extended(beauty_hdr * scale)
    return new_state, {
        "hdr": beauty_hdr,
        "ldr": ldr,
        "irradiance": irr,
        "gbuffer": gbuf,
    }


@partial(jax.jit, static_argnames=("config",))
def render_frame(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    config: RenderConfig,
    state: FrameState,
):
    """One full frame on a single device. Returns (new_state, outputs)."""
    return frame_core(accel, atlas, uniforms, config, state)


def render_sequence(bundle: SceneBundle, config: RenderConfig, frames: int = 1):
    """Render `frames` frames of a static scene, returning final outputs."""
    accel = build_accel(bundle.scene, bundle.atlas)
    state = init_state(config)
    uniforms = bundle.uniforms
    outputs = None
    for i in range(frames):
        uniforms = uniforms._replace(frame=jnp.uint32(i))
        state, outputs = render_frame(accel, bundle.atlas, uniforms, config, state)
    return state, outputs
