"""Sort-based segmented reductions — the TPU substitute for
duplicate-heavy scatter aggregation.

The reference applies Markov-chain / light-cache updates with device
atomics (atomicAdd queue cursors, spinlocks: render_mcpg/mc.glsl:159-203,
light_cache.glsl:54-84). TPUs have no general atomics, and the XLA
fallback — `.at[cells].add(rows)` with millions of duplicate indices —
serializes: measured on a v5e chip, ONE (8.3M,16)→(147k,16) scatter-add
costs ~140 ms and a narrow (8.3M,) one ~56 ms, while a 16-column two-key
sort of the same rows costs ~25 ms and a cumsum ~11 ms.

So aggregation here is: sort samples by cell, find segment boundaries,
reduce with cumulative ops, and read per-cell results at each segment's
END row. A secondary sort key places a chosen "winner" row at the
segment end (weighted-reservoir selection via the Efraimidis–Spirakis
exponential race: winner = min over the segment of -log(u)/weight — we
sort by the NEGATED race key ascending so the winner lands last).

All outputs are full-M arrays (static shapes); per-cell results are
valid at rows where ``is_end`` and garbage elsewhere — consumers mask
scatters with ``is_end`` (and `mode="drop"` sentinels).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

_I32_MAX = jnp.int32(2147483647)


class Segments(NamedTuple):
    """Sorted segment structure over M rows.

    ``cell`` is ascending; rows whose input cell was the sentinel (any
    value >= the live-cell range chosen by the caller) sort last and
    form ordinary (ignorable) segments.
    """

    cell: jnp.ndarray  # i32[M] ascending
    is_start: jnp.ndarray  # bool[M] first row of its segment
    is_end: jnp.ndarray  # bool[M] last row of its segment
    start_idx: jnp.ndarray  # i32[M] row index of my segment's first row
    end_idx: jnp.ndarray  # i32[M] row index of my segment's last row
    seg_id: jnp.ndarray  # i32[M] 0-based segment ordinal (dense)


def sort_segments(
    cell: jnp.ndarray,
    values: Sequence[jnp.ndarray],
    tiebreak: jnp.ndarray | None = None,
) -> tuple[Segments, list[jnp.ndarray]]:
    """Sort rows by (cell, tiebreak) ascending and build Segments.

    ``values``: 1-D (M,) arrays carried through the sort (f32/i32/u32 —
    multi-column data must be passed column-wise; `lax.sort` carries any
    number of operands in one pass and column count barely moves the
    cost). With a ``tiebreak`` key, the row with the LARGEST tiebreak in
    each segment ends up at the segment end (`is_end` row) — pass the
    negated reservoir race key to make the winner readable there.
    """
    m = cell.shape[0]
    cell = cell.astype(jnp.int32)
    ops = [cell]
    if tiebreak is not None:
        ops.append(tiebreak)
    ops.extend(values)
    out = jax.lax.sort(ops, num_keys=2 if tiebreak is not None else 1)
    cell_s = out[0]
    vals_s = list(out[(2 if tiebreak is not None else 1):])

    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cell_s[:-1]])
    nxt = jnp.concatenate([cell_s[1:], jnp.full((1,), -1, jnp.int32)])
    is_start = cell_s != prev
    is_end = cell_s != nxt
    start_idx = jax.lax.cummax(jnp.where(is_start, iota, 0))
    end_idx = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(is_end, iota, _I32_MAX)))
    )
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return (
        Segments(
            cell=cell_s,
            is_start=is_start,
            is_end=is_end,
            start_idx=start_idx,
            end_idx=end_idx,
            seg_id=seg_id,
        ),
        vals_s,
    )


def seg_sum(segs: Segments, cols: jnp.ndarray) -> jnp.ndarray:
    """Per-segment totals, broadcast to every row of the segment.

    ``cols``: f32[M] or f32[M, K]. One cumsum + two packed gathers.
    """
    squeeze = cols.ndim == 1
    if squeeze:
        cols = cols[:, None]
    cum = jnp.cumsum(cols, axis=0)
    ex = cum - cols  # exclusive prefix
    at_end = jnp.take(cum, segs.end_idx, axis=0, indices_are_sorted=True)
    at_start = jnp.take(ex, segs.start_idx, axis=0, indices_are_sorted=True)
    tot = at_end - at_start
    return tot[:, 0] if squeeze else tot


def broadcast_from_end(segs: Segments, cols: jnp.ndarray) -> jnp.ndarray:
    """Read each row's segment-end value (one sorted gather)."""
    return jnp.take(cols, segs.end_idx, axis=0, indices_are_sorted=True)


def compact_ends(
    segs: Segments, cols: jnp.ndarray, capacity: int, fill=0
) -> jnp.ndarray:
    """Pack the per-segment end rows into a dense (capacity, K) buffer
    indexed by ``seg_id``. Segments beyond ``capacity`` are DROPPED
    (callers size capacity as a per-frame touched-cell budget — the
    reference's fixed ≤10-slot update queue drops overflow the same
    way, grid.h:23-35). Indices are sorted and unique by construction.
    """
    idx = jnp.where(segs.is_end, segs.seg_id, capacity)
    out = jnp.full((capacity,) + cols.shape[1:], fill, cols.dtype)
    return out.at[idx].set(
        cols, mode="drop", indices_are_sorted=True, unique_indices=True
    )
