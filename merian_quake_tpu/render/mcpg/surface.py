"""MCPG guided surface kernel.

Port of res/shader/render_mcpg/mcpg.comp (guided mode): per pixel and
sample, each bounce draws MC_SAMPLES Markov-chain states from the two
hash grids (adaptive w.p. mc_samples_adaptive_prob, else static),
reservoir-selects a winner by sum_w, samples the outgoing direction
defensively (BSDF w.p. surf_bsdf_p, else the winner's vMF lobe), and
MIS-combines the vMF mixture with the BSDF pdf. Paths emit light-cache
samples and Markov-chain update samples into dense masked queues (the
TPU replacement for the atomic update buffer), plus fast-recovery zero
requests for vanished lights.

RNG note: the draw ORDER differs from the GLSL (both grid cells are
always computed, branches are masked selects), so streams are not
bit-identical to the reference — only distribution-equivalent.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...accel.build import AccelScene
from ...models.types import RenderConfig, TextureAtlas, Uniforms
from ...ops import bsdf, color as color_ops, linalg, rng as rng_ops, vmf
from .. import layout
from ..gbuffer import GBufferOutput
from ..hit import Hit, decompress_hit
from ..pt import _where_hit
from ..trace import trace_ray
from .config import MCPGConfig, MCPGState
from . import grids
from .light_cache import lc_get


class UpdateQueue(NamedTuple):
    """Dense masked MC update samples (≈ MCUpdate slots, grid.h:23-35).

    PACKED at emission into one i32 matrix — apply_updates' compaction
    gather then reads one table instead of first materializing a
     15-column concat of the whole frame queue (~500 MB of pure
    bandwidth at 1080p). Integer lanes: f32 lanes canonicalize NaN
    payloads / flush denormals on TPU. Column layout (15):
    [w, target(3), mv(3), pos(3), normal(3), id, cell] — dead rows
    carry the sentinel cell (>= mc_total_size), encoding the mask.
    """

    data: jnp.ndarray  # i32[..., 15]

    _F32_COLS = {"w": 0, "target": slice(1, 4), "mv": slice(4, 7),
                 "pos": slice(7, 10), "normal": slice(10, 13)}

    @classmethod
    def build(cls, cell, id, w, target, mv, pos, normal, mask, sentinel):
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        data = jnp.concatenate(
            [
                f2i(w)[..., None],
                f2i(target),
                f2i(mv),
                f2i(pos),
                f2i(normal),
                id.astype(jnp.int32)[..., None],
                jnp.where(mask, cell, jnp.int32(sentinel))[..., None],
            ],
            axis=-1,
        )
        return cls(data=data)

    def _f(self, name):
        return jax.lax.bitcast_convert_type(
            self.data[..., self._F32_COLS[name]], jnp.float32
        )

    @property
    def w(self):
        return self._f("w")

    @property
    def target(self):
        return self._f("target")

    @property
    def mv(self):
        return self._f("mv")

    @property
    def pos(self):
        return self._f("pos")

    @property
    def normal(self):
        return self._f("normal")

    @property
    def id(self):
        return self.data[..., 13].astype(jnp.uint32)

    @property
    def cell(self):
        return self.data[..., 14]


class LCQueue(NamedTuple):
    pos: jnp.ndarray  # f32[M, 3]
    normal: jnp.ndarray
    irr: jnp.ndarray
    mask: jnp.ndarray


class ZeroQueue(NamedTuple):
    """Fast-recovery sum_w zero requests (mcpg.comp:175-178)."""

    cell: jnp.ndarray  # i32[M]
    mask: jnp.ndarray


class DistQueue(NamedTuple):
    """Distance-MC state writes from the volume pass, deferred to
    apply_updates (columns [sw, m0, m1, N, flat] — f32 bitcast in i32
    lanes; dropped rows carry the sentinel flat index). Deferral keeps
    replicated distance grids identical under sharding: every device
    applies the same gathered queue. Divergence from the reference's
    in-pass writes (volume.comp): later volume spp samples read the
    frame-START states instead of same-frame updates — one frame of
    extra lag on a state that converges over hundreds."""

    data: jnp.ndarray  # i32[M, 5]

    @classmethod
    def build(cls, sw, m0, m1, n_chain, flat, mask, sentinel):
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        return cls(
            data=jnp.stack(
                [
                    f2i(sw), f2i(m0), f2i(m1), n_chain.astype(jnp.int32),
                    jnp.where(mask, flat, jnp.int32(sentinel)),
                ],
                axis=-1,
            )
        )


class SurfaceResult(NamedTuple):
    irradiance: jnp.ndarray  # f32[rows, W, 4]
    updates: UpdateQueue
    lc_samples: LCQueue
    zeros: ZeroQueue
    dist: DistQueue | None = None  # volume pass only


def _select_state(mask, a: grids.StateSample, b: grids.StateSample):
    pick = lambda x, y: jnp.where(
        mask[..., None] if x.ndim > mask.ndim else mask, x, y
    )
    return grids.StateSample(*[pick(x, y) for x, y in zip(a, b)])


def render_mcpg_surface(
    accel: AccelScene,
    atlas: TextureAtlas,
    uniforms: Uniforms,
    config: RenderConfig,
    mcfg: MCPGConfig,
    mstate: MCPGState,
    gbuf: GBufferOutput,
    y0=0,
    rows: int | None = None,
) -> SurfaceResult:
    W, H = config.width, config.height
    rows = H if rows is None else rows
    n = W * rows
    K = mcfg.mc_samples
    spp = max(config.spp, 1)
    cam_x = uniforms.cam_x
    mc = mstate.mc
    lc = mstate.lc

    # ALL spp samples ride in ONE ray population (ns = spp·n): the
    # samples of a pixel retrace nearly the same region, so merged
    # sorted blocks are ~2x denser and the packet sweep visits ~half
    # the clusters per ray. RNG streams are seeded per (sample, pixel)
    # instead of chaining samples sequentially — distribution-
    # equivalent (see module RNG note).
    pxi, pyi = layout.gen_pixels(W, rows, y0=y0)
    ns = n * spp
    tile = (
        (lambda x: jnp.concatenate([x] * spp, axis=0))
        if spp > 1
        else (lambda x: x)
    )
    samp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), n)
    state0 = rng_ops.seed_pixel(
        tile(pxi),
        tile(pyi),
        uniforms.frame,
        jnp.uint32(config.seed) ^ (samp * jnp.uint32(0x9E3779B9)),
    )
    first_spp = samp == 0
    # one (S, 8) packed draw table (temporal reprojection pre-applied
    # table-side): each of the K×segments guide draws pays a single
    # 8-column gather instead of two 12-column ones
    mc_packed = grids.pack_states_draw(mc, uniforms.cl_time)
    from .light_cache import _pack_lc

    lc_packed = _pack_lc(lc)  # one row-gather per lc_get, not three

    first_hit = jax.tree.map(tile, decompress_hit(gbuf.hits))
    pixel_live = (first_hit.albedo >= 1e-7).any(axis=-1)

    def one_sample(rng_state):
        cur = first_hit
        throughput = jnp.ones((ns, 3))
        f = jnp.zeros((ns, 3))
        p = jnp.ones((ns,))
        done = ~pixel_live

        def segment(carry, seg_idx):
            rng_state, cur, throughput, f, p, done = carry

            # sample 0 looks up at the previous-frame position (better
            # temporal stability), later samples at the current one
            lookup_pos = jnp.where(
                first_spp[:, None], cur.prev_pos, cur.pos
            )
            lookup_level = grids.adaptive_target_level(lookup_pos, cam_x, mcfg)

            # ---- draw K guide states, reservoir-select by sum_w ----
            # STRATIFIED grid choice: the reference Bernoulli(p)-picks
            # adaptive vs static per draw (mcpg.comp:74-111), which on
            # TPU means computing BOTH grids' cell math + finalize for
            # every draw (vector selects don't skip work). Here draw
            # slots are statically assigned — floor(K·p) adaptive,
            # K−ceil(K·p) static, one Bernoulli(frac) boundary slot —
            # so all but one draw run ONE grid's math. Draws are
            # exchangeable in the reservoir and the MIS mixture, and
            # the expected adaptive count stays exactly K·p.
            # mc_samples_adaptive_prob must be a static Python float:
            # the slot split below is computed at trace time (a traced
            # value would raise a ConcretizationTypeError here). It also
            # fixes the adaptive/static counts (deterministic instead of
            # the reference's i.i.d. Bernoulli draws) — unbiased (the
            # MIS pdf uses realized scores) but a variance/correlation
            # difference to keep in mind when A/B-ing noise vs the
            # reference.
            assert isinstance(mcfg.mc_samples_adaptive_prob, float), (
                "mc_samples_adaptive_prob must be a static float"
            )
            ka_exact = K * mcfg.mc_samples_adaptive_prob
            score_sum = jnp.zeros((ns,))
            mus, kappas, scores, draw_ns = [], [], [], []
            rng_state, win = grids.new_state(rng_state)
            win_buf = jnp.full((ns,), -1, jnp.int32)
            for k in range(K):
                if k + 1 <= int(ka_exact):
                    mode = "adaptive"
                elif k >= math.ceil(ka_exact):
                    mode = "static"
                else:
                    mode = "mixed"
                if mode != "static":
                    rng_state, abuf, ahash = grids.adaptive_cell(
                        rng_state, lookup_pos, cur.normal, cam_x, mcfg,
                        target_level=lookup_level,
                    )
                if mode != "adaptive":
                    rng_state, sbuf, shash = grids.static_cell(
                        rng_state, lookup_pos, mcfg
                    )
                if mode == "adaptive":
                    adaptive = True
                    buf = abuf.astype(jnp.int32)
                elif mode == "static":
                    adaptive = False
                    buf = sbuf.astype(jnp.int32)
                else:
                    frac = ka_exact - int(ka_exact)
                    rng_state, u_grid = rng_ops.uniform(rng_state)
                    adaptive = u_grid < frac
                    buf = jnp.where(adaptive, abuf, sbuf).astype(jnp.int32)
                # dead lanes gather row 0: their results are discarded
                # anyway (everything downstream is gated on ``active``)
                # and a constant address turns the random HBM access
                # into a cached one — the gather is the draw's cost
                st = grids.gather_state_packed_draw(
                    mc_packed, jnp.where(done, 0, buf)
                )
                if mode == "adaptive":
                    st = grids.finalize_load(st, ahash, uniforms.cl_time)
                elif mode == "static":
                    st = grids.finalize_load(
                        st, shash, uniforms.cl_time, pos=cur.pos,
                        normal=cur.normal, hemisphere_check=True,
                    )
                else:
                    st_a = grids.finalize_load(st, ahash, uniforms.cl_time)
                    st_s = grids.finalize_load(
                        st, shash, uniforms.cl_time, pos=cur.pos,
                        normal=cur.normal, hemisphere_check=True,
                    )
                    st = _select_state(adaptive, st_a, st_s)
                score_sum = score_sum + st.sum_w
                rng_state, u_res = rng_ops.uniform(rng_state)
                take = u_res < st.sum_w / score_sum  # NaN-compare false
                win = _select_state(take, st, win)
                win_buf = jnp.where(take, buf, win_buf)
                mu_i, kap_i = grids.state_vmf(st, cur.pos, mcfg)
                mus.append(mu_i)
                kappas.append(kap_i)
                scores.append(st.sum_w)
                draw_ns.append(st.N)

            have_guide = score_sum > 0.0

            # ---- defensive direction sampling ----
            # per-DRAW defensive probability: immature chains (small N)
            # sample mostly BSDF — no 1/surf_bsdf_p variance tax while
            # the lobes are still learning (config surf_bsdf_trust_n).
            # The sample decision uses the realized winner's sbp; the
            # MIS pdf below mixes per-draw sbp_i over the reservoir
            # weights, which is EXACTLY the marginal sampling density
            # (round-4 fix: the r3 code put the realized winner's sbp
            # in the pdf, a small bias whenever the K drawn states'
            # maturities differed).
            def _sbp_of(n_arr):
                if mcfg.surf_bsdf_trust_n <= 0:
                    return jnp.full(n_arr.shape, mcfg.surf_bsdf_p)
                mat = n_arr.astype(jnp.float32) / (
                    n_arr.astype(jnp.float32)
                    + float(mcfg.surf_bsdf_trust_n)
                )
                return 1.0 - (1.0 - mcfg.surf_bsdf_p) * mat

            sbp = _sbp_of(win.N)
            rng_state, u_b = rng_ops.uniform(rng_state)
            use_bsdf = (~have_guide) | (u_b < sbp)
            alpha = bsdf.roughness_to_alpha(cur.roughness)
            rng_state, u3 = rng_ops.uniform3(rng_state)
            wo_b = bsdf.sample(cur.wi, cur.normal, alpha, u3)
            win_mu, win_kappa = grids.state_vmf(win, cur.pos, mcfg)
            rng_state, u2 = rng_ops.uniform2(rng_state)
            wo_g = vmf.sample(win_mu, win_kappa, u2)
            wo = jnp.where(use_bsdf[..., None], wo_b, wo_g)
            rng_state, fresh = grids.new_state(rng_state)
            mc_state = _select_state(use_bsdf, fresh, win)
            mc_idx = jnp.where(use_bsdf, -1, win_buf)

            wodotn = linalg.dot(wo, cur.normal)
            below = (wodotn <= 1e-3) | (linalg.dot(wo, cur.geo_normal) <= 1e-3)
            active = ~done & ~below

            # ---- MIS pdf (mcpg.comp:127-136): exact marginal of the
            # per-draw defensive mixture ----
            safe_sum = jnp.where(have_guide, score_sum, 1.0)
            bsdf_mix = jnp.zeros((ns,))
            guided_p = jnp.zeros((ns,))
            for mu_i, kap_i, sc_i, n_i in zip(mus, kappas, scores, draw_ns):
                sbp_i = _sbp_of(n_i)
                w_i = sc_i / safe_sum
                bsdf_mix = bsdf_mix + w_i * sbp_i
                guided_p = guided_p + w_i * (1.0 - sbp_i) * vmf.pdf(
                    wo, mu_i, kap_i
                )
            bsdf_p = bsdf.pdf(cur.wi, wo, cur.normal, alpha)
            wo_p = (
                jnp.where(have_guide, bsdf_mix, 1.0) * bsdf_p
                + jnp.where(have_guide, guided_p, 0.0)
            )

            # ---- trace next segment (dead lanes masked: they trace
            # with t_max = -1 → uniform miss at near-zero sweep cost;
            # every consumer below is already gated on ``active``) ----
            origin = cur.pos - cur.wi * 1e-3
            res = trace_ray(
                accel, atlas, uniforms, origin, wo,
                bilinear=config.bilinear, features=config.features,
                sort_rays=True, active=active,
            )
            incident = res.contribution
            has_inc = (incident > 0.0).any(axis=-1)

            rng_state, lc_irr = lc_get(
                rng_state, lc, res.hit.pos, res.hit.normal, cam_x, mcfg,
                packed=lc_packed, dead=~active,
            )
            use_inc = has_inc | (
                (not mcfg.use_light_cache_tail) and config.max_path_length == 2
            )
            lc_incident = jnp.where(
                use_inc[..., None], incident, res.throughput * lc_irr
            )

            micro = bsdf.eval_times_cos(cur.wi, wo, cur.normal, alpha)
            new_thr = throughput * micro[..., None]
            if mcfg.use_light_cache_tail:
                last = seg_idx == config.max_path_length - 2
                f_val = jnp.where(last, lc_incident, incident)
                new_f = new_thr * f_val
            else:
                new_f = new_thr * incident
            new_p = p * wo_p

            # ---- guiding updates (mcpg.comp:165-181) ----
            mc_f = color_ops.yuv_luminance(
                lc_incident * micro[..., None] / wo_p[..., None]
            )
            if mcfg.mc_update_clamp > 0.0:
                # luminance-clamped guiding updates (config knob): a
                # single low-pdf firefly cannot dominate a chain's
                # Metropolis target for hundreds of frames
                mc_f = jnp.minimum(mc_f, mcfg.mc_update_clamp)
            finite = jnp.isfinite(mc_f)
            lc_val = (
                lc_incident
                * (cur.albedo / jnp.pi)
                * (wodotn / jnp.maximum(wo_p, 10.0))[..., None]
            )
            lc_mask = active & finite

            rng_state, u_acc = rng_ops.uniform(rng_state)
            accept = u_acc * score_sum < mc_f * K  # NaN-compare false
            rng_state, fb_buf, _ = grids.adaptive_cell(
                rng_state, cur.pos, cur.normal, cam_x, mcfg
            )
            up_cell = jnp.where(mc_idx >= 0, mc_idx, fb_buf.astype(jnp.int32))
            target_mv = (res.hit.pos - res.hit.prev_pos) / uniforms.time_diff
            up_mask = active & finite & accept

            missing = grids.light_missing(mc_state, mc_f, wo, cur.pos, mcfg)
            zero_mask = (
                active
                & finite
                & ~accept
                & (mc_idx >= 0)
                & missing
                & bool(mcfg.mc_fast_recovery)
            )

            ys = (
                LCQueue(pos=cur.pos, normal=cur.normal, irr=lc_val, mask=lc_mask),
                UpdateQueue.build(
                    cell=up_cell,
                    id=mc_state.id,
                    w=mc_f,
                    target=res.hit.pos,
                    mv=target_mv,
                    pos=cur.pos,
                    normal=cur.normal,
                    mask=up_mask,
                    sentinel=mcfg.mc_total_size,
                ),
                ZeroQueue(cell=jnp.maximum(mc_idx, 0), mask=zero_mask),
            )

            # ---- commit path state on active lanes ----
            throughput = jnp.where(active[..., None], new_thr, throughput)
            f = jnp.where(active[..., None], new_f, f)
            p = jnp.where(active, new_p, p)
            throughput = jnp.where(
                active[..., None],
                throughput * res.throughput * res.hit.albedo,
                throughput,
            )
            cur = _where_hit(active, res.hit, cur)
            dead = (throughput < 1e-7).all(axis=-1) | (f > 1e-7).any(axis=-1)
            done = done | below | dead
            return (rng_state, cur, throughput, f, p, done), ys

        (rng_state, cur, throughput, f, p, done), ys = jax.lax.scan(
            segment,
            (rng_state, cur, throughput, f, p, done),
            jnp.arange(max(config.max_path_length - 1, 0)),
        )
        contrib = f / jnp.maximum(p, 1e-30)[..., None]
        ok = jnp.isfinite(contrib).all(axis=-1)
        contrib = jnp.where((ok & pixel_live)[..., None], contrib, 0.0)
        lum = color_ops.yuv_luminance(contrib)
        return rng_state, contrib, lum * lum, ys

    rng_state, contrib, l2, ys = one_sample(state0)
    if config.spp > 0:
        irr = contrib.reshape(spp, n, 3).mean(axis=0)
        m2 = l2.reshape(spp, n).mean(axis=0)
    else:
        irr = jnp.zeros((n, 3))
        m2 = jnp.zeros((n,))

    # flatten (segs, ns) queues → (M,)
    def _cat(getter):
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), getter(ys)
        )

    lcq = _cat(lambda ys: ys[0])
    upq = _cat(lambda ys: ys[1])
    zq = _cat(lambda ys: ys[2])

    img = layout.flat_to_image(
        jnp.concatenate([irr, m2[..., None]], axis=-1), W, rows
    )
    return SurfaceResult(irradiance=img, updates=upq, lc_samples=lcq, zeros=zq)
