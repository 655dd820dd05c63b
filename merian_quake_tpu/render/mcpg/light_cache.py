"""Light cache: adaptive hash grid of EWA irradiance estimates.

Port of render_mcpg/light_cache.glsl. The reference serializes writers
with a per-cell spinlock whose loser samples are DROPPED (at most one
update per cell per frame; losses counted in update_canceled). On TPU
the same cadence is kept — one EWA step per cell per frame — but the
step uses the MEAN of the frame's samples for that cell instead of an
arbitrary lock winner (strictly lower estimator variance; divergence
documented). Hash-mismatch cells are re-initialized from one coarser
level, as in the reference (:72-75).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops import hashgrid, linalg, rng as rng_ops
from .config import LightCache, MCPGConfig

_U32 = jnp.uint32


def _lc_width_for_level(level, cfg: MCPGConfig):
    return cfg.lc_min_width * jnp.power(cfg.lc_power, level / cfg.lc_steps_per_unit)


def _lc_level(pos, cam_x, cfg: MCPGConfig):
    width = 2.0 * cfg.lc_tan_alpha_half * linalg.distance(cam_x, pos)
    return jnp.round(
        cfg.lc_steps_per_unit
        * jnp.log(jnp.maximum(width, cfg.lc_min_width) / cfg.lc_min_width)
        / jnp.log(cfg.lc_power)
    )


def _lc_cell(rng_state, pos, normal, level, cfg: MCPGConfig):
    rng_state, u3 = rng_ops.uniform3(rng_state)
    idx = hashgrid.grid_idx_interpolate(
        pos, _lc_width_for_level(level, cfg)[..., None], u3
    )
    lvl = level.astype(jnp.int32).astype(_U32)
    buf = hashgrid.hash_grid_normal_level(idx, normal, lvl, cfg.lc_size)
    h = hashgrid.hash2_grid_level(idx, lvl)
    return rng_state, buf, h


def _get_level(rng_state, lc: LightCache, pos, normal, level, cfg: MCPGConfig):
    rng_state, buf, h = _lc_cell(rng_state, pos, normal, level, cfg)
    irr = jnp.take(lc.irr, buf.astype(jnp.int32), axis=0)
    n = jnp.take(lc.N, buf.astype(jnp.int32))
    stored_h = jnp.take(lc.hash, buf.astype(jnp.int32))
    ok = (stored_h == h) & jnp.isfinite(irr).all(axis=-1)
    return rng_state, jnp.where(ok[..., None], irr, 0.0), jnp.where(ok, n, 0)


def lc_get(rng_state, lc: LightCache, pos, normal, cam_x, cfg: MCPGConfig):
    """light_cache_get: returns (rng, irradiance [..., 3])."""
    level = _lc_level(pos, cam_x, cfg)
    rng_state, irr, _ = _get_level(rng_state, lc, pos, normal, level, cfg)
    return rng_state, irr


def lc_update_batch(
    rng_state,
    lc: LightCache,
    pos,
    normal,
    irr,
    mask,
    cam_x,
    cfg: MCPGConfig,
):
    """Batched light_cache_update over M samples.

    pos/normal/irr: [M, 3]; mask: bool[M]. Returns
    (rng, new lc, applied_cells, merged_samples).

    Aggregation is sort-based (ops/segments.py): duplicate-index
    scatter-adds serialize on TPU (~140 ms per 8.3M-row scatter vs
    ~25 ms for the sort). Per-cell mean irradiance comes from segment
    sums; the representative sample (→ coarse-level re-init site) is
    the segment-end row — an arbitrary frame winner, like the lock.
    """
    import jax

    from ...ops import segments

    mask = mask & jnp.isfinite(irr).all(axis=-1)
    level = _lc_level(pos, cam_x, cfg)
    rng_state, buf, h = _lc_cell(rng_state, pos, normal, level, cfg)
    L = cfg.lc_size
    bi = jnp.where(mask, buf.astype(jnp.int32), L)

    segs, cols = segments.sort_segments(
        bi,
        [
            irr[:, 0], irr[:, 1], irr[:, 2],
            pos[:, 0], pos[:, 1], pos[:, 2],
            normal[:, 0], normal[:, 1], normal[:, 2],
            level,
            h.astype(jnp.int32),
        ],
    )
    (ix, iy, iz, px, py, pz, nx, ny, nz, lvl_s, h_s) = cols
    acc = segments.seg_sum(
        segs,
        jnp.stack([jnp.ones_like(ix), ix, iy, iz], axis=1),
    )  # (M, 4) per-cell count + irr sum, valid at end rows
    f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    i2f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    packed = jnp.concatenate(
        [
            f2i(acc),  # 0:4 count, sum_irr
            f2i(jnp.stack([px, py, pz, nx, ny, nz, lvl_s], axis=1)),  # 4:11
            h_s[:, None],  # 11
        ],
        axis=1,
    )
    # compact straight into per-cell slots: the sort key IS the cell
    idx = jnp.where(segs.is_end, segs.cell, L)
    cellrow = jnp.zeros((L, 12), jnp.int32).at[idx].set(
        packed, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    count = i2f(cellrow[:, 0])
    sum_irr = i2f(cellrow[:, 1:4])
    rep_pos = i2f(cellrow[:, 4:7])
    rep_norm = i2f(cellrow[:, 7:10])
    rep_level = i2f(cellrow[:, 10])
    new_hash = cellrow[:, 11].astype(_U32)

    touched = count > 0.0
    mean_irr = sum_irr / jnp.maximum(count, 1.0)[..., None]

    # cells whose stored hash mismatches: re-init from one coarser level
    mismatch = touched & (
        (lc.hash != new_hash) | ~jnp.isfinite(lc.irr).all(axis=-1)
    )
    # per-CELL rng stream for the coarse-level jitter (sample streams are
    # per-M; this lookup is per-L)
    cell_rng = rng_ops.seed_pixel(
        jnp.arange(L, dtype=jnp.uint32), 2, 0, rng_state[0]
    )
    _, coarse_irr, coarse_n = _get_level(
        cell_rng, lc, rep_pos, rep_norm, rep_level + 1.0, cfg
    )
    base_irr = jnp.where(mismatch[..., None], coarse_irr, lc.irr)
    base_n = jnp.where(mismatch, coarse_n, lc.N)

    new_n = jnp.minimum(base_n + 1, cfg.lc_max_n)
    alpha = jnp.maximum(1.0 / jnp.maximum(new_n, 1), cfg.lc_min_alpha)
    new_irr = base_irr + (mean_irr - base_irr) * alpha[..., None]

    out = LightCache(
        hash=jnp.where(touched, new_hash, lc.hash),
        irr=jnp.where(touched[..., None], new_irr, lc.irr),
        N=jnp.where(touched, new_n, lc.N),
    )
    applied = touched.sum().astype(_U32)
    merged = (mask.sum() - touched.sum()).astype(_U32)
    return rng_state, out, applied, merged
