"""MC hash-grid addressing, state load/finalize, vMF lobe derivation.

Faithful port of render_mcpg/mc.glsl semantics:
- adaptive grid: camera-distance-scaled exponential level with stochastic
  level offset (-log2(1-u)) and stochastic trilinear cell jitter, normal
  bucket in the hash (mc.glsl:60-111),
- static grid: fixed-width cells, hemisphere check on load (:114-157),
- 16-bit verification hash → collision resets the state (:90-96),
- temporal target reprojection w_tgt += sum_w·(cl_time - T)·mv (:94),
- vMF lobe: direction to weighted target, kappa from regularized mean
  cosine with a distance-based ML prior (:19-49).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import hashgrid, linalg, rng as rng_ops, vmf
from .config import MCPGConfig, MCStates

_U32 = jnp.uint32


class StateSample(NamedTuple):
    """A gathered MCState per ray (all arrays [...])."""

    id: jnp.ndarray
    w_tgt: jnp.ndarray  # [..., 3]
    sum_w: jnp.ndarray
    w_cos: jnp.ndarray
    mv: jnp.ndarray  # [..., 3]
    T: jnp.ndarray
    N: jnp.ndarray
    hash: jnp.ndarray


def new_state(rng_state):
    """mc_state_new(): fresh chain with random id (mc.glsl:12)."""
    rng_state, u = rng_ops.uniform(rng_state)
    shape = u.shape
    z3 = jnp.zeros(shape + (3,))
    return rng_state, StateSample(
        id=(u * 4294967295.0).astype(_U32),
        w_tgt=z3,
        sum_w=jnp.zeros(shape),
        w_cos=jnp.zeros(shape),
        mv=z3,
        T=jnp.zeros(shape),
        N=jnp.zeros(shape, jnp.int32),
        hash=jnp.zeros(shape, _U32),
    )


def state_pos(s: StateSample) -> jnp.ndarray:
    return jnp.where(
        (s.sum_w > 0.0)[..., None], s.w_tgt / jnp.where(s.sum_w == 0.0, 1.0, s.sum_w)[..., None], s.w_tgt
    )


def state_dir(s: StateSample, pos: jnp.ndarray) -> jnp.ndarray:
    return linalg.normalize(state_pos(s) - pos)


def state_prior(s: StateSample, pos: jnp.ndarray, cfg: MCPGConfig) -> jnp.ndarray:
    d2 = jnp.sum(jnp.square(pos - state_pos(s)), axis=-1)
    return jnp.maximum(1e-4, cfg.dir_guide_prior / jnp.maximum(d2, 1e-12))


def state_mean_cos(s: StateSample, pos, cfg: MCPGConfig) -> jnp.ndarray:
    n2 = (s.N * s.N).astype(jnp.float32)
    r = jnp.clip(
        s.w_cos / jnp.where(s.sum_w == 0.0, 1.0, s.sum_w), 0.0, 0.9999999
    )
    return n2 * r / (n2 + state_prior(s, pos, cfg))


def state_vmf(s: StateSample, pos, cfg: MCPGConfig):
    """Returns (mu [...,3], kappa [...]) — mc_state_get_vmf."""
    mu = state_dir(s, pos)
    kappa = jnp.minimum(
        vmf.kappa_from_mean_cos(state_mean_cos(s, pos, cfg)), cfg.kappa_max
    )
    return mu, kappa


def light_missing(s: StateSample, mc_f, wo, pos, cfg: MCPGConfig):
    """mc_light_missing (mc.glsl:28-41): learned light vanished?"""
    big_f = mc_f > 1e-3 * s.sum_w
    cos = linalg.dot(wo, state_dir(s, pos))
    aligned = cos >= 0.9 + 0.1 * state_mean_cos(s, pos, cfg)
    return (~big_f) & aligned


# ---------------- adaptive grid addressing ----------------


def _adaptive_width_for_level(level, cfg: MCPGConfig):
    return cfg.mc_adaptive_min_width * jnp.power(
        cfg.mc_adaptive_power, level / cfg.mc_adaptive_steps_per_unit
    )


def adaptive_target_level(pos, cam_x, cfg: MCPGConfig):
    width = 2.0 * cfg.mc_adaptive_tan_alpha_half * linalg.distance(cam_x, pos)
    return jnp.round(
        cfg.mc_adaptive_steps_per_unit
        * jnp.log(jnp.maximum(width, cfg.mc_adaptive_min_width) / cfg.mc_adaptive_min_width)
        / jnp.log(cfg.mc_adaptive_power)
    )


def adaptive_cell(rng_state, pos, normal, cam_x, cfg: MCPGConfig,
                  target_level=None):
    """Stochastic adaptive cell for pos: (rng, buffer_index, hash16).

    ``target_level`` may be precomputed (it is deterministic in pos) and
    reused across the K guide draws — the stochastic level offset and
    trilinear jitter still differ per draw."""
    rng_state, u_level = rng_ops.uniform(rng_state)
    if target_level is None:
        target_level = adaptive_target_level(pos, cam_x, cfg)
    level = target_level + jnp.floor(
        -jnp.log2(jnp.maximum(1.0 - u_level, 1e-7))
    )
    level = level.astype(jnp.int32)
    rng_state, u3 = rng_ops.uniform3(rng_state)
    idx = hashgrid.grid_idx_interpolate(
        pos, _adaptive_width_for_level(level.astype(jnp.float32), cfg)[..., None], u3
    )
    buf = hashgrid.hash_grid_normal_level(
        idx, normal, level.astype(_U32), cfg.mc_adaptive_size,
        tile_bits=cfg.grid_tile_bits,
    )
    h = hashgrid.hash2_grid_level(idx, level.astype(_U32))
    return rng_state, buf, h


def static_cell(rng_state, pos, cfg: MCPGConfig):
    """Static cell: (rng, buffer_index [offset past adaptive], hash16)."""
    rng_state, u3 = rng_ops.uniform3(rng_state)
    idx = hashgrid.grid_idx_interpolate(pos, cfg.mc_static_width, u3)
    buf = hashgrid.hash_grid(
        idx, cfg.mc_static_size, tile_bits=cfg.grid_tile_bits
    ) + _U32(cfg.mc_adaptive_size)
    h = hashgrid.hash2_grid(idx)
    return rng_state, buf, h


def gather_state(mc: MCStates, idx) -> StateSample:
    """Two packed gathers instead of 8 per-field gathers."""
    idx = idx.astype(jnp.int32)
    gf = jnp.take(mc.f, idx, axis=0)
    gi = jnp.take(mc.i, idx, axis=0)
    return StateSample(
        id=gi[..., 0].astype(jnp.uint32),
        w_tgt=gf[..., 0:3],
        sum_w=gf[..., 3],
        w_cos=gf[..., 4],
        mv=gf[..., 5:8],
        T=gf[..., 8],
        N=gi[..., 1],
        hash=gi[..., 2].astype(jnp.uint32),
    )


def pack_states_draw(mc: MCStates, cl_time) -> jnp.ndarray:
    """(S, 8) i32 GUIDE-DRAW table with the temporal target reprojection
    (mc.glsl:94, w_tgt += sum_w·(cl_time−T)·mv) PRE-APPLIED over the
    whole table once per frame instead of per gathered row per draw:
    the K×segments guide draws then gather 8 columns instead of 12 and
    skip the per-lane reprojection FMA. Rows that a load later finds
    invalid (hash mismatch / hemisphere) keep the reprojected w_tgt —
    harmless: finalize zeroes their sum_w, so they carry zero reservoir
    score and zero MIS weight. Tombstoned rows (sum_w < 0) are NOT
    reprojected (the clamp below), matching the reference's load order
    where finalize zeroes sum_w before the reprojection FMA
    (mc.glsl:123-135). Columns: [w_tgt(3), sum_w, w_cos (f32 bits), id,
    N, hash]."""
    w_tgt = (
        mc.f[:, 0:3]
        + (jnp.maximum(mc.f[:, 3], 0.0) * (cl_time - mc.f[:, 8]))[:, None]
        * mc.f[:, 5:8]
    )
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(w_tgt, jnp.int32),
            jax.lax.bitcast_convert_type(mc.f[:, 3:5], jnp.int32),
            mc.i,
        ],
        axis=1,
    )


# tables at or above this row count use the sorted-gather path (the
# production guide table is 33.6M rows, the light cache 4M)
SORTED_GATHER_MIN_ROWS = 1 << 21


def sorted_row_gather(tab: jnp.ndarray, idx) -> jnp.ndarray:
    """Row gather via sort → monotone gather → unsort.

    Random row gathers against multi-hundred-MB tables run ~8× slower
    than against small ones (measured ~48 ns/row vs ~6 at the 33.6M-row
    production guide table — HBM locality): sorting the indices first
    turns the gather into a monotone stream, and the two bracketing
    sorts (2-op forward, columns carried back) cost far less than the
    latency they remove. Exact: same rows, same order."""
    m = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    si, pos = jax.lax.sort([idx.astype(jnp.int32), iota], num_keys=1)
    rows = jnp.take(tab, si, axis=0)
    back = jax.lax.sort(
        [pos] + [rows[:, c] for c in range(rows.shape[1])], num_keys=1
    )
    return jnp.stack(back[1:], axis=1)


def gather_rows(tab: jnp.ndarray, idx) -> jnp.ndarray:
    """Row gather, auto-selecting the sorted path for huge flat tables
    (1-D index only — the hot guide-draw/light-cache shape)."""
    import os

    # OPT-IN (MQ_SORTED_GATHER=1): measured inconclusive-to-negative at
    # production scale — the bracketing sorts' cost and compile-time
    # growth offset the locality gain; XLA's gather did not clearly
    # speed up on sorted indices. Kept for further experiments.
    if (
        tab.shape[0] >= SORTED_GATHER_MIN_ROWS
        and idx.ndim == 1
        and idx.shape[0] >= 4096
        and os.environ.get("MQ_SORTED_GATHER")
    ):
        return sorted_row_gather(tab, idx)
    return jnp.take(tab, idx.astype(jnp.int32), axis=0)


def gather_state_packed_draw(packed: jnp.ndarray, idx) -> StateSample:
    """gather against a pack_states_draw table. mv/T come back ZERO, so
    finalize_load's reprojection is a structural no-op (already applied
    table-side); the winner threads id/N/sum_w/w_cos/w_tgt onward —
    exactly the fields the update/fast-recovery paths read."""
    g = gather_rows(packed, idx)
    gf = jax.lax.bitcast_convert_type(g[..., 0:5], jnp.float32)
    z3 = jnp.zeros(gf.shape[:-1] + (3,))
    return StateSample(
        id=g[..., 5].astype(jnp.uint32),
        w_tgt=gf[..., 0:3],
        sum_w=gf[..., 3],
        w_cos=gf[..., 4],
        mv=z3,
        T=jnp.zeros(gf.shape[:-1]),
        N=g[..., 6],
        hash=g[..., 7].astype(jnp.uint32),
    )


def pack_sample(st: StateSample):
    """StateSample (per-ray) → packed (M, 9) f32 + (M, 3) i32 rows."""
    f = jnp.concatenate(
        [
            st.w_tgt,
            st.sum_w[..., None],
            st.w_cos[..., None],
            st.mv,
            st.T[..., None],
        ],
        axis=-1,
    )
    i = jnp.stack(
        [st.id.astype(jnp.int32), st.N, st.hash.astype(jnp.int32)], axis=-1
    )
    return f, i


def finalize_load(
    s: StateSample,
    expected_hash,
    cl_time,
    pos=None,
    normal=None,
    hemisphere_check: bool = False,
) -> StateSample:
    """Collision/validity reset + temporal target reprojection
    (mc_adaptive_finalize_load / mc_static_finalize_load).

    Documented deviation vs mc.glsl:123-135 when fed a
    ``pack_states_draw`` table (whose reprojection is pre-applied): the
    static-grid hemisphere check evaluates the direction toward the
    REPROJECTED w_tgt, and hash-mismatch rows keep the reprojected
    w_tgt (the reference leaves both un-reprojected). Harmless: those
    rows carry sum_w = 0 → zero reservoir score and zero MIS weight —
    only a deterministic tie-break difference for moving states near
    the hemisphere boundary."""
    invalid = (s.sum_w < 0.0) | (s.hash != expected_hash)
    if hemisphere_check:
        invalid = invalid | (linalg.dot(normal, state_dir(s, pos)) <= 0.0)
    sum_w = jnp.where(invalid, 0.0, s.sum_w)
    w_tgt = s.w_tgt + (sum_w * (cl_time - s.T))[..., None] * s.mv
    return s._replace(sum_w=sum_w, w_tgt=w_tgt)
