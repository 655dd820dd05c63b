"""SSMM kernel (port of res/shader/render_ssmm/ssmm.comp).

Defaults mirror render_ssmm.hpp:84-95. The subgroup shuffle that passes
tentative chains between lanes becomes a roll over the flattened pixel
array (statistically equivalent proposal exchange); the previous-frame
state buffer is read with motion-vector offset plus a ±15px tent-
distributed jitter, gated by an SVGF-style normal/depth compatibility
score, exactly as the reference's ``read_neighbour_state``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...accel.build import AccelScene
from ...models.types import RenderConfig, TextureAtlas, Uniforms
from ...ops import bsdf, color as color_ops, linalg, rng as rng_ops, vmf
from .. import layout
from ..gbuffer import GBufferOutput
from ..hit import decompress_hit
from ..trace import trace_ray


class SSMMConfig(NamedTuple):
    surf_bsdf_p: float = 0.15
    ml_prior_n: float = 0.2
    ml_max_n: int = 1024
    ml_min_alpha: float = 0.01
    smis_group_size: int = 5


class SSMMState(NamedTuple):
    """SSMCState SoA over pixels (ssmc_state.h:4-10)."""

    sum_tgt: jnp.ndarray  # f32[N, 3]
    sum_w: jnp.ndarray  # f32[N]
    N: jnp.ndarray  # i32[N]
    sum_len: jnp.ndarray  # f32[N]
    f: jnp.ndarray  # f32[N]


def init_ssmm_state(width: int, height: int) -> SSMMState:
    n = width * height
    return SSMMState(
        sum_tgt=jnp.zeros((n, 3)),
        sum_w=jnp.zeros((n,)),
        N=jnp.zeros((n,), jnp.int32),
        sum_len=jnp.zeros((n,)),
        f=jnp.zeros((n,)),
    )


def _state_new(n):
    return SSMMState(
        sum_tgt=jnp.zeros((n, 3)),
        sum_w=jnp.zeros((n,)),
        N=jnp.zeros((n,), jnp.int32),
        sum_len=jnp.zeros((n,)),
        f=jnp.zeros((n,)),
    )


def _sel(mask, a: SSMMState, b: SSMMState) -> SSMMState:
    pick = lambda x, y: jnp.where(mask[..., None] if x.ndim > 1 else mask, x, y)
    return SSMMState(*[pick(x, y) for x, y in zip(a, b)])


def _state_dir(s: SSMMState, x):
    tgt = s.sum_tgt / jnp.where(s.sum_w > 0.0, s.sum_w, 1.0)[..., None]
    return linalg.normalize(tgt - x)


def _state_add(s: SSMMState, x, w, direction, y, cfg: SSMMConfig) -> SSMMState:
    """mc_state_add (ssmm.comp:47-57), GLSL mutation order preserved."""
    n_new = jnp.minimum(s.N + 1, cfg.ml_max_n)
    alpha = jnp.maximum(1.0 / jnp.maximum(n_new, 1), cfg.ml_min_alpha)
    sum_w = s.sum_w + (w - s.sum_w) * alpha
    sum_tgt = s.sum_tgt + (w[..., None] * y - s.sum_tgt) * alpha[..., None]
    mid = s._replace(N=n_new, sum_w=sum_w, sum_tgt=sum_tgt)
    to = s.sum_len[..., None] * _state_dir(mid, x)
    to = to + (w[..., None] * direction - to) * alpha[..., None]
    return mid._replace(sum_len=linalg.norm(to))


def _state_vmf(s: SSMMState, x, cfg: SSMMConfig):
    r = s.sum_len / jnp.where(s.sum_w > 0.0, s.sum_w, 1.0)
    n2 = (s.N * s.N).astype(jnp.float32)
    r = jnp.clip(n2 * r / (n2 + cfg.ml_prior_n), 0.0, 0.9999999)
    return _state_dir(s, x), vmf.kappa_from_mean_cos(r)


def _state_score(s: SSMMState, x, nx, normal_img, z_img, cam_x, idx):
    """f × SVGF-style compatibility (mc_state_C, ssmm.comp:76-97)."""
    nq = jnp.take(normal_img, idx, axis=0)
    zq = jnp.take(z_img, idx)
    w_n = jnp.power(jnp.maximum(linalg.dot(nx, nq), 0.0), 64.0)
    w_d = jnp.exp(-jnp.abs(zq - linalg.distance(x, cam_x)) / 10.0)
    return s.f * w_n * w_d


def render_ssmm(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    config: RenderConfig,
    scfg: SSMMConfig,
    sstate: SSMMState,
    gbuf: GBufferOutput,
    y0=0,
    rows: int | None = None,
    shard_ctx=None,
):
    """SSMM pass over image rows [y0, y0+rows). Returns
    (irradiance[rows,W,4], new SSMMState slabs).

    Under sharding, the previous-frame state/geometry neighborhood
    reads (±15 px jitter at the mv target) come from all-gathered full
    buffers, and the lane-shuffle proposal exchange stays the EXACT
    global roll: each device passes its last flat lane to the next via
    lax.ppermute (wrapping at the mesh edge)."""
    W, H = config.width, config.height
    rows = H if rows is None else rows
    n = W * rows
    pxf, pyf = layout.gen_pixels(W, rows, y0=y0)
    rng = rng_ops.seed_pixel(pxf, pyf, uniforms.frame, config.seed)
    gf = (
        (lambda x: x)
        if shard_ctx is None
        else (lambda x: shard_ctx.gather_flat(x, W))
    )

    surf = decompress_hit(gbuf.hits)
    live = (surf.albedo >= 1e-7).any(axis=-1)
    normal_img = gf(layout.image_to_flat(gbuf.normal, W, rows))
    z_img = gf(layout.image_to_flat(gbuf.linear_z, W, rows))
    mv = layout.image_to_flat(gbuf.mv, W, rows)
    cam_x = uniforms.cam_x
    alpha_r = bsdf.roughness_to_alpha(surf.roughness)
    sstate_full = (
        sstate if shard_ctx is None else SSMMState(*[gf(x) for x in sstate])
    )

    if shard_ctx is None:
        roll_state = lambda t: SSMMState(
            *[jnp.roll(x, 1, axis=0) for x in t]
        )
    else:
        import jax

        perm = [(i, (i + 1) % shard_ctx.n) for i in range(shard_ctx.n)]

        def _roll1(x):
            recv = jax.lax.ppermute(x[-1:], shard_ctx.axis, perm)
            return jnp.concatenate([recv, x[:-1]], axis=0)

        roll_state = lambda t: SSMMState(*[_roll1(x) for x in t])

    curr = _state_new(n)
    tent = _state_new(n)
    sample_dirs, sample_weights, vmf_mus, vmf_kappas = [], [], [], []

    for s in range(config.spp):
        # subgroup shuffle → roll the tentative state one pixel over
        # (global roll; crosses shard borders via ppermute when sharded)
        tent = roll_state(tent)

        # ---- read_neighbour_state (ssmm.comp:99-121) ----
        base_x = pxf.astype(jnp.float32) + mv[:, 0]
        base_y = pyf.astype(jnp.float32) + mv[:, 1]
        bx = jnp.clip(base_x.astype(jnp.int32), 0, W - 1)
        by = jnp.clip(base_y.astype(jnp.int32), 0, H - 1)
        score_sum = _state_score(
            tent, surf.pos, surf.normal, normal_img, z_img, cam_x,
            layout.index_of(bx, by, W, H),
        )
        for _ in range(scfg.smis_group_size):
            rng, u12 = rng_ops.uniform4(rng)
            rng, u34 = rng_ops.uniform4(rng)
            rng, u56 = rng_ops.uniform4(rng)
            tentu = (
                u12[:, 0:2] + u12[:, 2:4] + u34[:, 0:2] + u34[:, 2:4]
                + u56[:, 0:2] + u56[:, 2:4]
            )
            off = jnp.floor(15.0 * (tentu - 3.0)).astype(jnp.int32)
            rng, u_rep = rng_ops.uniform(rng)
            ox = jnp.clip((base_x).astype(jnp.int32) + off[:, 0], 0, W - 1)
            oy = jnp.clip((base_y).astype(jnp.int32) + off[:, 1], 0, H - 1)
            oidx = layout.index_of(ox, oy, W, H)
            cand = SSMMState(*[jnp.take(x, oidx, axis=0) for x in sstate_full])
            other = _state_score(
                cand, surf.pos, surf.normal, normal_img, z_img, cam_x, oidx
            )
            take = (score_sum <= 0.0) | (u_rep < other / (other + score_sum))
            tent = _sel(take, cand, tent)
            score_sum = score_sum + other

        tent_valid = tent.sum_w > 0.0
        mu, kappa = _state_vmf(tent, surf.pos, scfg)
        kappa = jnp.where(tent_valid, kappa, 0.0)

        # ---- sample direction (vMF or defensive BSDF) ----
        rng, u_b = rng_ops.uniform(rng)
        use_bsdf = (kappa == 0.0) | (u_b < scfg.surf_bsdf_p)
        rng, u3 = rng_ops.uniform3(rng)
        wo_b = bsdf.sample(surf.wi, surf.normal, alpha_r, u3)
        rng, u2 = rng_ops.uniform2(rng)
        wo_g = vmf.sample(mu, jnp.maximum(kappa, 1e-6), u2)
        wo = jnp.where(use_bsdf[..., None], wo_b, wo_g)
        below = (linalg.dot(wo, surf.normal) <= 1e-3) | (
            linalg.dot(wo, surf.geo_normal) <= 1e-3
        )
        ok = live & ~(use_bsdf & below)  # bsdf below-horizon breaks out
        ok = ok & ~below

        pdf_val = jnp.where(
            use_bsdf,
            bsdf.pdf(surf.wi, wo, surf.normal, alpha_r),
            vmf.pdf(wo, mu, jnp.maximum(kappa, 1e-6)),
        )
        micro = bsdf.eval_times_cos(surf.wi, wo, surf.normal, alpha_r)

        origin = surf.pos - surf.wi * 1e-3
        res = trace_ray(
            accel, atlas, uniforms, origin, wo,
            bilinear=config.bilinear, features=config.features,
                sort_rays=True,
        )
        incident = res.contribution
        position = res.hit.pos

        direct = jnp.where(
            (ok & (pdf_val > 0.0))[..., None],
            micro[..., None] * incident / jnp.maximum(pdf_val, 1e-20)[..., None],
            0.0,
        )
        weight = jnp.where(ok[..., None], micro[..., None] * incident, 0.0)
        sample_dirs.append(jnp.where(ok[..., None], wo, 0.0))
        sample_weights.append(weight)
        vmf_mus.append(mu)
        vmf_kappas.append(kappa)

        # ---- Metropolis acceptance (ssmm.comp:196-206) ----
        tent_f = color_ops.yuv_luminance(direct)
        rng, u_acc = rng_ops.uniform(rng)
        accept = ok & ((curr.f == 0.0) | (u_acc < tent_f / jnp.maximum(curr.f, 1e-30)))
        fresh = _state_new(n)
        tent_base = _sel(accept & use_bsdf, fresh, tent)
        tent_acc = tent_base._replace(f=jnp.where(accept, tent_f, tent_base.f))
        added_acc = _state_add(tent_acc, surf.pos, tent_f, wo, position, scfg)
        # rejected vMF samples still update the tentative chain
        added_rej = _state_add(tent, surf.pos, tent_f, wo, position, scfg)
        keep_rej = ok & ~accept & ~use_bsdf
        tent = _sel(accept, added_acc, _sel(keep_rej, added_rej, tent))
        curr = _sel(accept, tent, curr)

    # ---- SMIS estimator (ssmm.comp:209-229) ----
    irr = jnp.zeros((n, 3))
    m1 = jnp.zeros((n,))
    m2 = jnp.zeros((n,))
    for s in range(config.spp):
        w_s = sample_weights[s]
        nonzero = (w_s != 0.0).any(axis=-1)
        bsdf_p = bsdf.pdf(surf.wi, sample_dirs[s], surf.normal, alpha_r)
        sum_pdf = jnp.zeros((n,))
        for t in range(config.spp):
            p_t = jnp.where(
                vmf_kappas[t] > 0.0,
                vmf.pdf(sample_dirs[s], vmf_mus[t], jnp.maximum(vmf_kappas[t], 1e-6)),
                bsdf_p,
            )
            sum_pdf = sum_pdf + p_t
        sum_pdf = (
            scfg.surf_bsdf_p * scfg.smis_group_size * bsdf_p
            + (1.0 - scfg.surf_bsdf_p) * sum_pdf
        )
        con = jnp.where(
            (nonzero & (sum_pdf > 0.0))[..., None],
            w_s / jnp.maximum(sum_pdf, 1e-30)[..., None],
            0.0,
        )
        finite = jnp.isfinite(con).all(axis=-1)
        con = jnp.where(finite[..., None], con, 0.0)
        irr = irr + con
        l = color_ops.yuv_luminance(con)
        m1 = m1 + l
        m2 = m2 + l * l

    # persist only for live pixels (ssmm.comp:232)
    new_state = _sel(live, curr, sstate)

    img = layout.flat_to_image(
        jnp.concatenate([irr, m2[..., None]], axis=-1), W, rows
    )
    return img, new_state
