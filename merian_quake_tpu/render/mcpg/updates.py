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
    upd_state = grids.StateSample(
        id=mc.id,
        w_tgt=upd_w_tgt,
        sum_w=upd_sum_w,
        w_cos=mc.w_cos,
        mv=mv_rep,
        T=mc.T,
        N=n_new,
        hash=mc.hash,
    )
    dir_post = grids.state_dir(
        grids.StateSample(*[jnp.take(x, cells, axis=0) for x in upd_state]),
        upq.pos,
    )
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
    w_updated_at_sample = jnp.take(upd_sum_w, cells)  # candidate weight
    cand_w = jnp.where(match, w_updated_at_sample, upq.w)
    key = -jnp.log(jnp.maximum(u_race, 1e-12)) / jnp.maximum(cand_w, 1e-20)
    key = jnp.where(upq.mask, key, _BIGF)
    min_key = jnp.full((S,), _BIGF).at[cells].min(key)
    is_winner = upq.mask & (key == jnp.take(min_key, cells)) & (key < _BIGF)

    # winner's state (per winning sample) — packed gathers
    upd_f_full = jnp.concatenate(
        [
            upd_w_tgt,
            upd_sum_w[:, None],
            upd_w_cos[:, None],
            mv_rep,
            jnp.zeros((S, 1)),  # T overridden below
        ],
        axis=1,
    )
    upd_i_full = jnp.stack(
        [mc.i[:, 0], n_new, mc.i[:, 2]], axis=1
    )
    gf = jnp.take(upd_f_full, cells, axis=0)
    gi = jnp.take(upd_i_full, cells, axis=0)
    upd_at = grids.StateSample(
        id=gi[:, 0].astype(jnp.uint32),
        w_tgt=gf[:, 0:3],
        sum_w=gf[:, 3],
        w_cos=gf[:, 4],
        mv=gf[:, 5:8],
        T=jnp.full((M,), uniforms.cl_time),
        N=gi[:, 1],
        hash=gi[:, 2].astype(jnp.uint32),
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
        old = grids.gather_state(mc, buf)
        rs, u_rep = rng_ops.uniform(rs)
        replace = (old.id == new_state.id) | (
            u_rep < new_state.sum_w / (new_state.sum_w + old.sum_w)
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
