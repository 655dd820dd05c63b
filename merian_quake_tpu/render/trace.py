"""Full trace + hit shading: the heart of every integrator.

Branchless JAX equivalent of /root/reference/res/shader/raytrace.glsl's
``trace_ray(throughput, contribution, hit)`` (lines 154-313): nearest
accepted hit via the accel layer, homogeneous-fog transmittance on the
throughput, procedural sky (sun glow + classic scrolling 2-layer sky or
cubemap) on miss/sky-flag hits, quake UV warp for lava/slime/tele/water,
material decode (solid color, waterfall, sprite/tele, fullbright
emission with the ldr_to_hdr boost), motion vectors from prev-frame
vertices. Every branch is a masked select over the full ray batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..accel.build import AccelScene
from ..accel.intersect import HitRecord, trace_nearest
from ..models import atlas as atlas_mod
from ..models import materials
from ..models.types import TextureAtlas, Uniforms
from ..ops import color as color_ops
from ..ops import linalg, transmittance as trans_ops, vmf
from .hit import Hit

T_MAX = materials.T_MAX


def _classic_sky(atlas: TextureAtlas, uniforms: Uniforms, w: jnp.ndarray):
    """Classic scrolling two-layer Quake sky (raytrace.glsl:36-43)."""
    st = 0.5 + jnp.stack([w[..., 0], w[..., 1]], axis=-1) / jnp.maximum(
        jnp.abs(w[..., 2]), 1e-4
    )[..., None]
    t = uniforms.cl_time * 0.12
    bck = atlas_mod.sample_bilinear(
        atlas, uniforms.sky_classic[0], st + 0.5 * t
    )
    fnt = atlas_mod.sample_bilinear(atlas, uniforms.sky_classic[1], st + t)
    tex = bck[..., :3] * (1.0 - fnt[..., 3:4]) + fnt[..., :3] * fnt[..., 3:4]
    return 10.0 * (jnp.exp2(3.5 * tex) - 1.0)


def _cubemap_sky(atlas: TextureAtlas, uniforms: Uniforms, w: jnp.ndarray):
    """Six-face skybox sample (raytrace.glsl:45-59)."""
    ax, ay, az = jnp.abs(w[..., 0]), jnp.abs(w[..., 1]), jnp.abs(w[..., 2])
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    # side: 0 rt(+x) 1 lf(-x) 2 bk(+y) 3 ft(-y) 4 up(+z) 5 dn(-z)
    side_x = jnp.where(x >= 0, 0, 1)
    side_y = jnp.where(y >= 0, 2, 3)
    side_z = jnp.where(z >= 0, 4, 5)
    side = jnp.where(
        (ax >= ay) & (ax >= az),
        side_x,
        jnp.where(ay >= az, side_y, side_z),
    )
    safe = lambda a: jnp.maximum(a, 1e-4)
    st_by_side = jnp.stack(
        [
            0.5 + 0.5 * jnp.stack([-y, -z], -1) / safe(ax)[..., None],
            0.5 + 0.5 * jnp.stack([y, -z], -1) / safe(ax)[..., None],
            0.5 + 0.5 * jnp.stack([x, -z], -1) / safe(ay)[..., None],
            0.5 + 0.5 * jnp.stack([-x, -z], -1) / safe(ay)[..., None],
            0.5 + 0.5 * jnp.stack([-y, x], -1) / safe(az)[..., None],
            0.5 + 0.5 * jnp.stack([-y, -x], -1) / safe(az)[..., None],
        ],
        axis=0,
    )
    st = jnp.take_along_axis(
        st_by_side, side[None, ..., None].astype(jnp.int32), axis=0
    )[0]
    texnum = jnp.take(uniforms.sky_cube, side)
    col = atlas_mod.sample_bilinear(atlas, jnp.maximum(texnum, 0), st)[..., :3]
    return jnp.where((texnum >= 0)[..., None], col, 0.0)


def get_sky(atlas: TextureAtlas, uniforms: Uniforms, w: jnp.ndarray):
    """Sky radiance for direction w (raytrace.glsl get_sky, :25-60)."""
    sun_glow = 0.5 * jnp.power(
        0.5 * (1.0 + linalg.dot(uniforms.sun_w, w)), 4.0
    )
    sun_disc = 5.0 * vmf.pdf(w, uniforms.sun_w, 3000.0)
    sun_color = jnp.minimum(uniforms.sun_color, materials.MAX_SUN_COLOR)
    emm = (sun_glow + sun_disc)[..., None] * sun_color
    # classic sky REPLACES the sun glow (`emm =`, raytrace.glsl:43);
    # cubemap ADDS to it (`emm +=`, :57)
    classic = uniforms.sky_classic[0] >= 0
    return jnp.where(
        classic[..., None],
        _classic_sky(atlas, uniforms, w),
        emm + _cubemap_sky(atlas, uniforms, w),
    )


def _warp_uv(uv: jnp.ndarray, cl_time, flags: jnp.ndarray) -> jnp.ndarray:
    """Quake turbulent texture warp for lava/slime/tele/water + waves.

    MERIAN_TEXTUREEFFECT_QUAKE_WARPCALC equivalent: the classic warp is
    uv' = uv + 0.125*sin(2*pi*uv.yx + time-ish) (8px amplitude over a
    64px texture). Water additionally gets a travelling wave term.
    """
    warp = (flags >= materials.WARP_FLAG_MIN) & (flags <= materials.WARP_FLAG_MAX)
    t = cl_time
    swap = uv[..., ::-1]
    warped = uv + 0.125 * jnp.sin(2.0 * jnp.pi * swap + t)
    water = flags == materials.MAT_FLAGS_WATER
    waves = 0.05 * jnp.sin(4.0 * jnp.pi * swap + 1.7 * t)
    warped = warped + jnp.where(water[..., None], waves, 0.0)
    return jnp.where(warp[..., None], warped, uv)


class TraceResult(NamedTuple):
    throughput: jnp.ndarray  # f32[N, 3] medium transmittance along segment
    contribution: jnp.ndarray  # f32[N, 3] emission found (× throughput)
    hit: Hit
    hitrec: HitRecord
    flags: jnp.ndarray  # i32[N] material flags at the hit (NONE on miss)
    t: jnp.ndarray  # f32[N] ray parameter of the hit (T_MAX on sky/miss)


def trace_ray(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    pos: jnp.ndarray,
    wi: jnp.ndarray,
    bilinear: bool = True,
    chunk: int = 128,
) -> TraceResult:
    """Trace from ``pos`` along ``wi`` and shade the hit.

    Returns throughput (fog transmittance to the hit), contribution
    (emission at the hit, already multiplied by throughput), and the
    shaded Hit. ``pos`` should already be pulled back by the caller
    (reference pulls back 1e-3 along the previous direction,
    mcpg.comp:144).
    """
    scene = accel.scene
    hr = trace_nearest(
        accel, atlas, pos, wi, 0.0, T_MAX, chunk=chunk
    )
    n = pos.shape[0]
    tri = jnp.maximum(hr.tri, 0)
    t_hit = jnp.where(hr.hit, hr.t, T_MAX)

    throughput = jnp.broadcast_to(
        trans_ops.transmittance(t_hit, uniforms.mu_t, uniforms.volume_max_t)[
            ..., None
        ],
        (n, 3),
    )

    flags = jnp.where(hr.hit, jnp.take(scene.flags, tri), materials.MAT_FLAGS_NONE)
    is_sky = jnp.logical_or(~hr.hit, flags == materials.MAT_FLAGS_SKY)

    # --- geometric data ---
    v0 = jnp.take(scene.v0, tri, axis=0)
    v1 = jnp.take(scene.v1, tri, axis=0)
    v2 = jnp.take(scene.v2, tri, axis=0)
    w0 = (1.0 - hr.u - hr.v)[..., None]
    wu = hr.u[..., None]
    wv = hr.v[..., None]
    hit_pos = v0 * w0 + v1 * wu + v2 * wv
    prev_pos = (
        jnp.take(scene.pv0, tri, axis=0) * w0
        + jnp.take(scene.pv1, tri, axis=0) * wu
        + jnp.take(scene.pv2, tri, axis=0) * wv
    )
    geo_n = linalg.normalize(jnp.cross(v2 - v0, v1 - v0))

    # --- texture coordinates (+ warp) ---
    st = jnp.take(scene.st, tri, axis=0)
    uv = st[:, 0] * w0 + st[:, 1] * wu + st[:, 2] * wv
    uv = _warp_uv(uv, uniforms.cl_time, flags)

    texnum = jnp.take(scene.texnum, tri)
    albedo_tex = atlas_mod.sample(atlas, texnum, uv, bilinear=bilinear)[..., :3]

    # --- material decode ---
    roughness = jnp.full((n,), materials.DEFAULT_ROUGHNESS)
    roughness = jnp.where(
        flags == materials.MAT_FLAGS_WATER, materials.WATER_ROUGHNESS, roughness
    )
    gloss_texnum = jnp.take(scene.gloss_texnum, tri)
    gloss = atlas_mod.sample(atlas, jnp.maximum(gloss_texnum, 0), uv, bilinear=False)[
        ..., 0
    ]
    roughness = jnp.where(gloss_texnum > 0, gloss, roughness)

    solid = flags == materials.MAT_FLAGS_SOLID
    waterfall = flags == materials.MAT_FLAGS_WATERFALL
    sprite_tele = (flags == materials.MAT_FLAGS_SPRITE) | (
        flags == materials.MAT_FLAGS_TELE
    )

    albedo = albedo_tex
    albedo = jnp.where(
        solid[..., None], jnp.take(scene.solid_albedo, tri, axis=0), albedo
    )
    albedo = jnp.where(
        sprite_tele[..., None], color_ops.ldr_to_hdr(albedo_tex), albedo
    )

    emission = jnp.zeros((n, 3))
    emission = jnp.where(
        solid[..., None], jnp.take(scene.solid_emission, tri, axis=0), emission
    )
    emission = jnp.where(waterfall[..., None], albedo_tex, emission)
    emission = jnp.where(
        sprite_tele[..., None], color_ops.ldr_to_hdr(albedo_tex), emission
    )
    # fullbright texture emission (default material only)
    fb_texnum = jnp.take(scene.fb_texnum, tri)
    fb_col = atlas_mod.sample(atlas, jnp.maximum(fb_texnum, 0), uv, bilinear=bilinear)[
        ..., :3
    ]
    fb_emission = color_ops.ldr_to_hdr(fb_col)
    default_mat = ~(solid | waterfall | sprite_tele | is_sky)
    has_fb = default_mat & (fb_texnum > 0) & (fb_emission.max(axis=-1) > 0.0)
    emission = jnp.where(has_fb[..., None], fb_emission, emission)
    albedo = jnp.where(has_fb[..., None], fb_emission, albedo)

    # --- sky ---
    sky_col = get_sky(atlas, uniforms, wi)
    albedo = jnp.where(is_sky[..., None], sky_col, albedo)
    emission = jnp.where(is_sky[..., None], sky_col, emission)
    sky_pos = pos + wi * T_MAX
    hit_pos = jnp.where(is_sky[..., None], sky_pos, hit_pos)
    prev_pos = jnp.where(is_sky[..., None], sky_pos, prev_pos)
    normal = jnp.where(is_sky[..., None], -wi, geo_n)
    geo_n = jnp.where(is_sky[..., None], -wi, geo_n)

    contribution = throughput * emission

    hit = Hit(
        pos=hit_pos,
        prev_pos=prev_pos,
        wi=wi,
        normal=normal,
        geo_normal=geo_n,
        albedo=albedo,
        roughness=roughness,
    )
    return TraceResult(
        throughput=throughput,
        contribution=contribution,
        hit=hit,
        hitrec=hr,
        flags=jnp.where(is_sky & hr.hit, materials.MAT_FLAGS_SKY, flags),
        t=jnp.where(is_sky, T_MAX, t_hit),
    )
