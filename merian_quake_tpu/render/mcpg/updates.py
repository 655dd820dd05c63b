"""Two-phase Markov-chain update replay (TPU formulation, sort-based).

Port of res/shader/render_mcpg/compute_updates.comp. The reference
replays ≤10 queued samples per cell sequentially (EWA chain update with
id-mismatch chain restarts), weighted-reservoir-samples one winning
state, and stochastically writes the winner into BOTH grids keeping the
incumbent with probability old.sum_w/(new+old).

TPU adaptation (no atomics, no per-cell serial loops) — and no
duplicate-index scatter-adds either: XLA lowers those to a serialized
update loop (~140 ms per scatter for an 8.3M-row frame queue on v5e),
so per-cell sample groups are formed by ONE two-key sort instead
(~25 ms; see ops/segments.py):

- sort samples by (cell, negated reservoir race key): groups become
  contiguous segments and the race winner (Efraimidis–Spirakis:
  argmin -log(u)/weight) lands on each segment's END row;
- the sequential EWA over k same-id samples collapses to one batched
  EWA step with effective alpha 1-(1-α)^k against the group mean
  (second-order-equivalent for the reference's k ≤ 10);
- the winner's stochastic grid writes keep the reference's replacement
  rule, applied from a compacted per-touched-cell buffer (segments past
  ``update_cell_capacity`` drop, like the reference's full ≤10-slot
  queues, grid.h:23-35).

Divergences from the reference (documented):
- the race weight of a matching sample is the cell's PRE-update sum_w
  (the reference uses the evolving post-replay value; within one cell
  these differ only by the replay-order EWA drift);
- the winner's mv is the w-weighted mean of the frame's matching
  samples (reference: last replayed sample's mv);
- the replacement RNG is seeded per (cell, frame), not per sample.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import linalg, rng as rng_ops, segments
from .config import MCPGConfig, MCPGState, MCStates
from . import grids
from .light_cache import lc_update_batch
from .surface import SurfaceResult

_U32 = jnp.uint32
_BIGF = jnp.float32(3e38)


def _f2i(x):
    """f32 → i32 lanes (safe: integer lanes never canonicalize bits —
    the REVERSE direction flushes denormals/NaN payloads on TPU)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


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
    qtab = upq.data  # (M, 15) packed at emission (surface.py)
    M = qtab.shape[0]

    # ---- 1. prefix compaction: ONE 2-op sort serves BOTH queues ----
    # The raw queue is every path vertex but only ~15% of rows pass the
    # accept gate (and ~0% are zero requests) — measured on chip. The
    # sort key is the liveness CLASS only (0 live update, 1 dead, 2
    # zero request), NOT the cell: lax.sort is stable, so within each
    # class the carried row indices stay ASCENDING and the capacity-row
    # table gather below is MONOTONE — a 2M-row random gather from the
    # (M, 15) table costs ~90 ms on chip while the monotone one streams
    # (~10 ms); the cell ordering this used to provide was redone by
    # the replay's (cell, race) sort anyway. Live updates become a
    # static PREFIX and zero requests a static SUFFIX; every downstream
    # sort/gather runs at capacity rows. Overflow drops, like the
    # reference's full per-cell queues.
    live_mask = qtab[:, 14] < S
    cls = jnp.where(
        live_mask,
        jnp.int32(0),
        jnp.where(result.zeros.mask, jnp.int32(2), jnp.int32(1)),
    )
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]
    ks, ps = jax.lax.sort([cls, iota_m], num_keys=1)

    # ---- 1a. fast-recovery zeroing (mcpg.comp:175-178) from the
    # suffix (duplicate cells write the same 0.0 — benign) ----
    cap_z = int(min(M, mcfg.zero_queue_capacity))
    pz = ps[-cap_z:]
    is_zero = ks[-cap_z:] == 2
    zcells = jnp.where(
        is_zero, jnp.take(result.zeros.cell, pz), jnp.int32(S)
    )
    mc = mc._replace(f=mc.f.at[zcells, 3].set(0.0, mode="drop"))

    # ---- 1b. compacted update rows from the prefix: ONE monotone
    # (cap_u, 15) gather straight from the emission-packed table ----
    cap_u = int(min(M, mcfg.update_queue_capacity))
    pu = ps[:cap_u]
    qr = jnp.take(qtab, pu, axis=0)  # (cap_u, 15)
    w_u = _i2f(qr[:, 0])
    tgt_u = _i2f(qr[:, 1:4])
    mv_u = _i2f(qr[:, 4:7])
    pos_u = _i2f(qr[:, 7:10])
    norm_u = _i2f(qr[:, 10:13])
    id_u = qr[:, 13].astype(_U32)
    cells_u = qr[:, 14]
    live_u = cells_u < S

    # per-sample rng streams for the replay phase, seeded by the
    # ORIGINAL queue row index (compaction-invariant streams)
    rs = rng_ops.seed_pixel(pu.astype(_U32), 0, uniforms.frame, rng_key)

    # ---- 2. light cache ----
    lcq = result.lc_samples
    rng_lc = rng_ops.seed_pixel(
        jnp.arange(lcq.mask.shape[0], dtype=_U32), 1, uniforms.frame, rng_key
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

    # ---- 3. MC chain replay on the compacted rows ----
    # narrow 2-column incumbent peek (id, sum_w) — row gathers from a
    # packed table are the fast gather shape on TPU
    inc_tab = jnp.stack(
        [mc.i[:, 0], jax.lax.bitcast_convert_type(mc.f[:, 3], jnp.int32)],
        axis=1,
    )  # (S, 2) i32
    inc = jnp.take(inc_tab, jnp.minimum(cells_u, S - 1), axis=0)  # (cap_u, 2)
    inc_id = inc[:, 0].astype(_U32)
    inc_sum_w = _i2f(inc[:, 1])
    match = (inc_id == id_u) & live_u

    # reservoir race key (winner = min); sorted DESC via negation so the
    # winner is the segment-end row
    rs, u_race = rng_ops.uniform(rs)
    cand_w = jnp.where(match, inc_sum_w, w_u)
    race = -jnp.log(jnp.maximum(u_race, 1e-12)) / jnp.maximum(cand_w, 1e-20)
    key2 = jnp.where(live_u, -race, -_BIGF)

    mf = match.astype(jnp.float32)

    # sort operands are the per-row aggregation inputs ONLY plus the
    # compacted row index: winner-only columns (normal, id) are gathered
    # afterwards at the ≤capacity segment-end rows — every extra sort
    # operand pays a full O(M log M) permute pass, a cap-row gather is
    # ~free
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap_u, 1), 0)[:, 0]
    segs, cols = segments.sort_segments(
        cells_u,
        [
            w_u,
            mf,
            tgt_u[:, 0], tgt_u[:, 1], tgt_u[:, 2],
            pos_u[:, 0], pos_u[:, 1], pos_u[:, 2],
            mv_u[:, 0], mv_u[:, 1], mv_u[:, 2],
            iota_c,
        ],
        tiebreak=key2,
    )
    (w_s, m_s, tx, ty, tz, px, py, pz, mvx, mvy, mvz, idx_s) = cols
    tgt_s = jnp.stack([tx, ty, tz], axis=1)
    pos_s = jnp.stack([px, py, pz], axis=1)
    mv_s = jnp.stack([mvx, mvy, mvz], axis=1)

    # ---- compact to one row per touched cell; per-cell math runs on
    # (cap,) rows only (M-row gathers/scatters serialize on TPU) ----
    cap = int(min(S + 1, mcfg.update_cell_capacity))
    comp = segments.compact_indices(segs, cap)
    cell_c = segments.take_compact(comp, segs.cell, fill=S)
    live_c = comp.valid & (cell_c < S)
    cell_r = jnp.minimum(cell_c, S - 1)

    # segment aggregates over MATCHING samples (masked rows all carry
    # the sentinel cell and sort into the trailing dead segment)
    mw = m_s * w_s
    agg = segments.compact_sums(
        comp,
        jnp.concatenate(
            [m_s[:, None], mw[:, None], mw[:, None] * tgt_s,
             mw[:, None] * mv_s],
            axis=1,
        ),
    )  # (cap, 8): k, sum_w, sum_wt(3), sum_wmv(3)
    k_m, sum_w_g, sum_wt_g, sum_wmv_g = (
        agg[:, 0], agg[:, 1], agg[:, 2:5], agg[:, 5:8]
    )

    cur_f = jnp.take(mc.f, cell_r, axis=0)  # (cap, 9)
    cur_i = jnp.take(mc.i, cell_r, axis=0)  # (cap, 3)

    kf = jnp.maximum(k_m, 1.0)
    mean_w = sum_w_g / kf
    mean_wt = sum_wt_g / kf[..., None]
    n_new = jnp.minimum(cur_i[:, 1] + k_m.astype(jnp.int32), mcfg.ml_max_n)
    alpha = jnp.maximum(1.0 / jnp.maximum(n_new, 1), mcfg.ml_min_alpha)
    alpha_eff = 1.0 - jnp.power(1.0 - alpha, k_m)
    upd_sum_w = cur_f[:, 3] + (mean_w - cur_f[:, 3]) * alpha_eff
    upd_w_tgt = cur_f[:, 0:3] + (mean_wt - cur_f[:, 0:3]) * alpha_eff[..., None]
    mean_mv = sum_wmv_g / jnp.maximum(sum_w_g, 1e-20)[..., None]

    # cos term against the POST-update state direction (GLSL inout
    # mutation order in mc_update, compute_updates.comp:48-52: sum_w and
    # w_tgt are written BEFORE w_cos reads mc_state_dir). This
    # bootstraps guiding: a fresh chain's first light-find gives cos = 1
    # → mean cos ≈ 1 → a sharp vMF lobe at the light. The per-row
    # broadcast goes through a small (S, 4) scratch table: capacity-row
    # scatter + fast small-table gather (never an M-row row-gather).
    post_tab = segments.scatter_table(
        comp, cell_c,
        jnp.concatenate([upd_w_tgt, upd_sum_w[:, None]], axis=1), S + 1,
    )
    post = jnp.take(post_tab, jnp.minimum(segs.cell, S), axis=0)  # (M, 4)
    pos_post = jnp.where(
        (post[:, 3] > 0.0)[..., None],
        post[:, 0:3] / jnp.where(post[:, 3] == 0.0, 1.0, post[:, 3])[..., None],
        post[:, 0:3],
    )
    dir_post = linalg.normalize(pos_post - pos_s)
    cos_post = jnp.maximum(
        0.0, linalg.dot(linalg.normalize(tgt_s - pos_s), dir_post)
    )
    cos_post = jnp.where(mw > 0.0, cos_post, 0.0)
    sum_wc_g = segments.compact_sums(comp, mw * cos_post)  # (cap,)
    mean_wc = sum_wc_g / kf
    upd_w_cos = jnp.minimum(
        cur_f[:, 4] + (mean_wc - cur_f[:, 4]) * alpha_eff, upd_sum_w
    )

    # ---- winner row (the segment end) per touched cell ----
    wf = segments.take_compact(
        comp,
        jnp.stack(
            [w_s, m_s, tx, ty, tz, mvx, mvy, mvz, px, py, pz], axis=1
        ),
    )  # (cap, 11)
    # winner-only columns from the COMPACTED queue rows (cap-row gather)
    win_idx = jnp.maximum(segments.take_compact(comp, idx_s), 0)
    win_tab = jnp.concatenate(
        [_f2i(norm_u), id_u.astype(jnp.int32)[:, None]], axis=1
    )  # (cap_u, 4) i32
    win_rows = jnp.take(win_tab, win_idx, axis=0)
    norm_c = _i2f(win_rows[:, 0:3])
    win_id_s = win_rows[:, 3]
    w_c, m_c = wf[:, 0], wf[:, 1]
    tgt_c, mv_c = wf[:, 2:5], wf[:, 5:8]
    pos_c = wf[:, 8:11]

    winner_match = m_c > 0.5
    # matched winner → the post-EWA cell state; fresh winner → a new
    # chain from the sample (cos = 1 by construction, mcpg fresh path)
    win_f = jnp.where(
        winner_match[:, None],
        jnp.concatenate(
            [upd_w_tgt, upd_sum_w[:, None], upd_w_cos[:, None], mean_mv],
            axis=1,
        ),
        jnp.concatenate(
            [w_c[:, None] * tgt_c, w_c[:, None], w_c[:, None], mv_c], axis=1
        ),
    )  # (cap, 8): w_tgt3, sum_w, w_cos, mv3
    win_id = jnp.where(winner_match, cur_i[:, 0].astype(_U32), win_id_s)
    win_n = jnp.where(winner_match, n_new, 1)
    win_valid = live_c

    # save-site cells: stochastic level/jitter drawn per WINNER (the
    # reference draws them in compute_updates.comp:98-121 — per winner,
    # not per sample), so the hash math runs on cap rows, not M
    rc = rng_ops.seed_pixel(
        cell_r.astype(_U32), 3, uniforms.frame, rng_key
    )
    rc, sbuf_c, shash_c = grids.static_cell(rc, pos_c, mcfg)
    rc, abuf_c, ahash_c = grids.adaptive_cell(
        rc, pos_c, norm_c, uniforms.cam_x, mcfg
    )

    # ---- stochastic saves into BOTH grids (compute_updates.comp:98-121)
    def save(mc: MCStates, buf, site_hash, stream: int) -> MCStates:
        buf = buf.astype(jnp.int32)
        old = jnp.take(inc_tab, jnp.minimum(buf, S - 1), axis=0)
        old_id = old[:, 0].astype(_U32)
        old_sum_w = _i2f(old[:, 1])
        cell_rng = rng_ops.seed_pixel(
            buf.astype(_U32), 4 + stream, uniforms.frame, rng_key
        )
        _, u_rep = rng_ops.uniform(cell_rng)
        new_sum_w = win_f[:, 3]
        replace = win_valid & (
            (old_id == win_id)
            | (u_rep < new_sum_w / (new_sum_w + old_sum_w))
        )
        idx = jnp.where(replace, buf, S)
        f_rows = jnp.concatenate(
            [win_f, jnp.full((cap, 1), uniforms.cl_time, jnp.float32)], axis=1
        )
        i_rows = jnp.stack(
            [win_id.astype(jnp.int32), win_n, site_hash.astype(jnp.int32)],
            axis=1,
        )
        return MCStates(
            f=mc.f.at[idx].set(f_rows, mode="drop"),
            i=mc.i.at[idx].set(i_rows, mode="drop"),
        )

    mc = save(mc, sbuf_c, shash_c, 0)  # static grid
    mc = save(mc, abuf_c, ahash_c, 1)  # adaptive grid

    return MCPGState(
        mc=mc,
        lc=lc,
        lc_updates_applied=mstate.lc_updates_applied + applied,
        lc_updates_merged=mstate.lc_updates_merged + merged,
    )
