"""GBuffer pass: primary rays → first-hit data for all integrators.

Equivalent of /root/reference/res/shader/gbuffer/gbuffer.comp and its
host node (src/gbuffer/gbuffer.cpp): camera rays, first accepted hit,
outputs irradiance (= direct emission at the first hit), demodulated
albedo, motion vectors (reprojection into the previous camera), the
compressed hit buffer, and a packed gbuffer (normal, linear z, depth
gradients, z velocity) for the denoiser.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..accel.build import AccelScene
from ..models.types import RenderConfig, TextureAtlas, Uniforms
from ..ops import camera as cam_ops
from ..ops import linalg
from . import layout
from .hit import CompressedHit, compress_hit
from .trace import trace_ray


class GBufferOutput(NamedTuple):
    irradiance: jnp.ndarray  # f32[H, W, 4] direct emission at first hit
    albedo: jnp.ndarray  # f32[H, W, 4] demodulated albedo × throughput
    mv: jnp.ndarray  # f32[H, W, 2] motion vector (prev_pixel - pixel)
    hits: CompressedHit  # [H*W] compressed first hits
    normal: jnp.ndarray  # f32[H, W, 3] shading normal
    linear_z: jnp.ndarray  # f32[H, W]
    z_grad: jnp.ndarray  # f32[H, W, 2] depth gradients (ray differentials)
    z_vel: jnp.ndarray  # f32[H, W] z velocity


def render_gbuffer(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    config: RenderConfig,
    y0=0,
    rows: int | None = None,
) -> GBufferOutput:
    """``y0``/``rows``: render only image rows [y0, y0+rows) — the unit
    of pixel-grid sharding across devices (full camera frame retained:
    W/H in config define the projection; y0 may be traced)."""
    W, H = config.width, config.height
    rows = H if rows is None else rows
    pxi, pyi = layout.gen_pixels(W, rows, y0=y0)
    pxf = pxi.astype(jnp.float32)
    pyf = pyi.astype(jnp.float32)
    wi = cam_ops.ray_dir(
        pxf, pyf, W, H, uniforms.cam_u, uniforms.cam_w, uniforms.fov_tan_half
    )
    n = wi.shape[0]
    pos = jnp.broadcast_to(uniforms.cam_x, (n, 3))

    # ray-cone mip selection on the first hit (the reference's
    # ENABLE_ALBEDO_MIPMAP textureGrad path, gbuffer.comp:92-97)
    pixel_cone = 2.0 * uniforms.fov_tan_half / W
    res = trace_ray(
        accel, atlas, uniforms, pos, wi, bilinear=config.bilinear,
        pixel_cone=pixel_cone, features=config.features,
    )
    hit = res.hit

    # irradiance = emission at first hit (gbuffer.comp:104)
    irradiance = layout.flat_to_image(
        jnp.concatenate([res.contribution, jnp.ones((n, 1))], axis=-1), W, rows
    )

    # albedo zeroed where emissive, × camera throughput (gbuffer.comp:107)
    emissive = (res.contribution >= 1e-5).any(axis=-1)
    albedo = hit.albedo * jnp.where(emissive[..., None], 0.0, 1.0) * res.throughput
    albedo_img = layout.flat_to_image(
        jnp.concatenate([albedo, jnp.ones((n, 1))], axis=-1), W, rows
    )

    # motion vector: reproject prev_pos into the previous camera
    old_dir = hit.prev_pos - uniforms.prev_cam_x
    old_px, old_py, old_dz = cam_ops.project(
        old_dir, W, H, uniforms.prev_cam_u, uniforms.prev_cam_w, uniforms.fov_tan_half
    )
    mv = layout.flat_to_image(
        jnp.stack([old_px - pxf, old_py - pyf], axis=-1), W, rows
    )

    # gbuffer extras: linear z + gradients from offset-pixel ray dirs
    linear_z = linalg.distance(hit.pos, uniforms.cam_x)
    r_x = cam_ops.ray_dir(
        pxf + 1.0, pyf, W, H, uniforms.cam_u, uniforms.cam_w, uniforms.fov_tan_half
    )
    r_y = cam_ops.ray_dir(
        pxf, pyf + 1.0, W, H, uniforms.cam_u, uniforms.cam_w, uniforms.fov_tan_half
    )
    gn = hit.geo_normal
    num = linalg.dot(gn, hit.pos - uniforms.cam_x)
    zg_x = num / jnp.where(
        jnp.abs(linalg.dot(gn, r_x)) < 1e-6, 1e-6, linalg.dot(gn, r_x)
    ) - linear_z
    zg_y = num / jnp.where(
        jnp.abs(linalg.dot(gn, r_y)) < 1e-6, 1e-6, linalg.dot(gn, r_y)
    ) - linear_z
    z_vel = linalg.distance(hit.prev_pos, uniforms.prev_cam_x) - linear_z

    return GBufferOutput(
        irradiance=irradiance,
        albedo=albedo_img,
        mv=mv,
        hits=compress_hit(hit),
        normal=layout.flat_to_image(hit.normal, W, rows),
        linear_z=layout.flat_to_image(linear_z, W, rows),
        z_grad=layout.flat_to_image(jnp.stack([zg_x, zg_y], axis=-1), W, rows),
        z_vel=layout.flat_to_image(z_vel, W, rows),
    )
