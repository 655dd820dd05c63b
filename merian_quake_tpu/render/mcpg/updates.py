"""Two-phase Markov-chain update replay (TPU formulation).

Port of res/shader/render_mcpg/compute_updates.comp. The reference
replays ≤10 queued samples per cell sequentially (EWA chain update with
id-mismatch chain restarts), weighted-reservoir-samples one winning
state, and stochastically writes the winner into BOTH grids keeping the
incumbent with probability old.sum_w/(new+old).

TPU adaptation (no atomics, no per-cell serial loops):
- per-cell sample groups form via scatter-adds keyed on the cell index;
- the sequential EWA over k same-id samples collapses to one batched
  EWA step with effective alpha 1-(1-α)^k against the group mean
  (second-order-equivalent for the reference's k ≤ 10);
- the weighted reservoir becomes an exponential race (Efraimidis-
  Spirakis): winner = argmin(-log(u)/weight) per cell via scatter-min;
- the winner's stochastic grid writes keep the reference's replacement
  rule; duplicate-cell writers resolve by XLA scatter order (the
  reference has the same benign race between workgroups).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import linalg, rng as rng_ops
from .config import MCPGConfig, MCPGState, MCStates
from . import grids
from .light_cache import lc_update_batch
from .surface import SurfaceResult

_U32 = jnp.uint32
_BIGF = jnp.float32(3e38)


def _scatter_state(mc: MCStates, idx, st: grids.StateSample, mask) -> MCStates:
    """Masked scatter of per-sample states — TWO packed scatters
    (out-of-bounds rows drop with mode='drop')."""
    safe_idx = jnp.where(mask, idx, mc.f.shape[0])
    f_rows, i_rows = grids.pack_sample(st)
    return MCStates(
        f=mc.f.at[safe_idx].set(f_rows, mode="drop"),
        i=mc.i.at[safe_idx].set(i_rows, mode="drop"),
    )


def apply_updates(
    rng_key,
    mstate: MCPGState,
    result: SurfaceResult,
    uniforms,
    mcfg: MCPGConfig,
) -> MCPGState:
    """Applies fast-recovery zeros, light-cache samples and MC updates.

    ``rng_key``: uint32 scalar seed for this frame's replay randomness
    (≈ pcg4d16(pixel, frame, SEED) in compute_updates.comp:63).
    """
    mc = mstate.mc
    S = mcfg.mc_total_size
    upq = result.updates
    M = upq.w.shape[0]

    # per-sample rng streams for the replay phase
    rs = rng_ops.seed_pixel(
        jnp.arange(M, dtype=jnp.uint32), 0, uniforms.frame, rng_key
    )

    # ---- 1. fast-recovery zeroing (mcpg.comp:175-178) ----
    zero_idx = jnp.where(result.zeros.mask, result.zeros.cell, S)
    mc = mc._replace(f=mc.f.at[zero_idx, 3].set(0.0, mode="drop"))

    # ---- 2. light cache ----
    lcq = result.lc_samples
    rng_lc = rng_ops.seed_pixel(
        jnp.arange(lcq.mask.shape[0], dtype=jnp.uint32), 1, uniforms.frame, rng_key
    )
    _, lc, applied, merged = lc_update_batch(
        rng_lc,
        mstate.lc,
        lcq.pos,
        lcq.normal,
        lcq.irr,
        lcq.mask,
        uniforms.cam_x,
        mcfg,
    )

    # ---- 3. MC chain replay ----
    cells = jnp.where(upq.mask, upq.cell, S - 1).astype(jnp.int32)
    mask_f = upq.mask.astype(jnp.float32)
    inc = grids.gather_state(mc, cells)
    match = (inc.id == upq.id) & upq.mask
    match_f = match.astype(jnp.float32)

    # group aggregates (matching samples only) — ONE packed scatter-add
    agg_rows = jnp.concatenate(
        [
            match_f[:, None],
            (upq.w * match_f)[:, None],
            upq.w[:, None] * upq.target * match_f[:, None],
        ],
        axis=1,
    )  # (M, 5): count, w, w*target
    agg = jnp.zeros((S, 5)).at[cells].add(agg_rows)
    k_m = agg[:, 0]
    sum_w_g = agg[:, 1]
    sum_wt_g = agg[:, 2:5]
    cells_match = jnp.where(match, cells, S)  # drop non-matching writers
    mv_rep = jnp.zeros((S, 3)).at[cells_match].set(upq.mv, mode="drop")

    touched = k_m > 0.0
    kf = jnp.maximum(k_m, 1.0)
    mean_w = sum_w_g / kf
    mean_wt = sum_wt_g / kf[..., None]

    n_new = jnp.minimum(mc.N + k_m.astype(jnp.int32), mcfg.ml_max_n)
    alpha = jnp.maximum(1.0 / jnp.maximum(n_new, 1), mcfg.ml_min_alpha)
    alpha_eff = 1.0 - jnp.power(1.0 - alpha, k_m)
    upd_sum_w = mc.sum_w + (mean_w - mc.sum_w) * alpha_eff
    upd_w_tgt = mc.w_tgt + (mean_wt - mc.w_tgt) * alpha_eff[..., None]

    # cos term against the POST-update state direction (GLSL inout
    # mutation order in mc_update, compute_updates.comp:48-52: sum_w and
    # w_tgt are written BEFORE w_cos reads mc_state_dir). This is what
    # bootstraps guiding: a fresh chain's first light-find gives cos = 1
    # → mean cos ≈ 1 → a sharp vMF lobe at the light.
    #
    # All post-update per-cell fields a sample needs are packed into ONE
    # (S, 8) row so the M-row gather happens once — separate takes of
    # the same index vector each pay the full gather cost on TPU.
    upd_pack = jnp.concatenate(
        [
            upd_w_tgt,  # 0:3
            upd_sum_w[:, None],  # 3
            mv_rep,  # 4:7
            n_new.astype(jnp.float32)[:, None],  # 7
        ],
        axis=1,
    )
    g1 = jnp.take(upd_pack, cells, axis=0)  # (M, 8)
    g_wtgt, g_sumw, g_mv = g1[:, 0:3], g1[:, 3], g1[:, 4:7]
    pos_post = jnp.where(
        (g_sumw > 0.0)[..., None],
        g_wtgt / jnp.where(g_sumw == 0.0, 1.0, g_sumw)[..., None],
        g_wtgt,
    )
    dir_post = linalg.normalize(pos_post - upq.pos)
    cos_post = jnp.maximum(
        0.0, linalg.dot(linalg.normalize(upq.target - upq.pos), dir_post)
    )
    sum_wc_g = jnp.zeros((S,)).at[cells].add(upq.w * cos_post * match_f)
    mean_wc = sum_wc_g / kf
    upd_w_cos = jnp.minimum(
        mc.w_cos + (mean_wc - mc.w_cos) * alpha_eff, upd_sum_w
    )
    # fresh (id-mismatch) candidates: post-update dir points exactly at
    # the target → cos = 1
    cos_fresh = jnp.ones_like(upq.w)

    # ---- reservoir winner per cell (exponential race) ----
    rs, u_race = rng_ops.uniform(rs)
    cand_w = jnp.where(match, g_sumw, upq.w)  # post-update weight
    key = -jnp.log(jnp.maximum(u_race, 1e-12)) / jnp.maximum(cand_w, 1e-20)
    key = jnp.where(upq.mask, key, _BIGF)
    min_key = jnp.full((S,), _BIGF).at[cells].min(key)

    # winner's state per sample: reuse the packed g1 gather; id/hash come
    # from the pre-update `inc` gather (unchanged by the EWA step); only
    # w_cos and min_key need a second gather — both depend on scatters
    # that themselves consume g1, so pack the two into one take.
    g2 = jnp.take(jnp.stack([min_key, upd_w_cos], axis=1), cells, axis=0)
    is_winner = upq.mask & (key == g2[:, 0]) & (key < _BIGF)
    g_wcos = g2[:, 1]
    upd_at = grids.StateSample(
        id=inc.id,
        w_tgt=g_wtgt,
        sum_w=g_sumw,
        w_cos=g_wcos,
        mv=g_mv,
        T=jnp.full((M,), uniforms.cl_time),
        N=g1[:, 7].astype(jnp.int32),
        hash=inc.hash,
    )
    fresh_st = grids.StateSample(
        id=upq.id,
        w_tgt=upq.w[..., None] * upq.target,
        sum_w=upq.w,
        w_cos=jnp.minimum(upq.w * cos_fresh, upq.w),
        mv=upq.mv,
        T=jnp.full((M,), uniforms.cl_time),
        N=jnp.ones((M,), jnp.int32),
        hash=jnp.zeros((M,), _U32),
    )
    sel = lambda a, b: grids.StateSample(
        *[
            jnp.where(match[..., None] if x.ndim > 1 else match, x, y)
            for x, y in zip(a, b)
        ]
    )
    new_state = sel(upd_at, fresh_st)

    # ---- stochastic saves into BOTH grids (compute_updates.comp:98-121) ----
    def save(mc: MCStates, rs, which: str) -> tuple:
        if which == "static":
            rs, buf, h = grids.static_cell(rs, upq.pos, mcfg)
        else:
            rs, buf, h = grids.adaptive_cell(
                rs, upq.pos, upq.normal, uniforms.cam_x, mcfg
            )
        buf = buf.astype(jnp.int32)
        # only id and sum_w of the incumbent matter — two narrow takes.
        # (do NOT pack the id bit-cast into an f32 lane: TPU flushes
        # denormal bit patterns / canonicalizes NaN payloads even in
        # pure copies, silently corrupting integer payloads)
        old_id = jnp.take(mc.i[:, 0], buf).astype(_U32)
        old_sum_w = jnp.take(mc.f[:, 3], buf)
        rs, u_rep = rng_ops.uniform(rs)
        replace = (old_id == new_state.id) | (
            u_rep < new_state.sum_w / (new_state.sum_w + old_sum_w)
        )
        m = is_winner & replace
        st = new_state._replace(hash=h)
        return rs, _scatter_state(mc, buf, st, m)

    rs, mc = save(mc, rs, "static")
    rs, mc = save(mc, rs, "adaptive")

    return MCPGState(
        mc=mc,
        lc=lc,
        lc_updates_applied=mstate.lc_updates_applied + applied,
        lc_updates_merged=mstate.lc_updates_merged + merged,
    )
