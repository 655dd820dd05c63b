"""Woop unit-triangle intersection: precompute + Pallas MXU kernel.

Each triangle stores the affine map M = [e1 e2 n]^-1, b = -M·v0 that
takes world points to (u, v, signed-dist) barycentric space (Woop et
al., "Watertight Ray/Triangle Intersection", JCGT 2013 — the affine
variant). A ray's transformed origin/direction are then SIX K=4/K=3
dot products per (triangle, ray) pair — batched over a (C, B) tile
they become ONE dot_general on the MXU.

Scheduling is a TPU-native packet traversal (replaces the reference's
per-ray Vulkan ray-query BVH walk, raytrace.glsl:69-119):

1. XLA-side, each ray block gets a conservative entry parameter
   t_enter[block, cluster] from an interval-slab test of the block's
   origin/direction bounding boxes against the cluster AABB
   (packet-frustum culling; +inf = unreachable), then sorts ITS OWN
   near-to-far visit order (te ascending).
2. One pallas grid step per RAY BLOCK: the cluster loop runs inside
   the kernel as a while_loop that TERMINATES at the first cluster
   whose t_enter exceeds the block's horizon
   t̂ = max_r min(best_t_r, t_max_r) — te is ascending and t̂ only
   shrinks, so every later cluster is farther: an exact early-out,
   like a BVH walk without divergent per-ray stacks. Small scenes
   (≤ RESIDENT_MAX_TRIS) keep the whole table VMEM-resident; larger
   ones stream each cluster's w rows HBM→VMEM through a 4-slot
   prefetch pipeline (a single copy in flight leaves the sweep DMA-
   latency-bound at ~4 µs/visit — measured, compute fully hidden).

The epilogue is division-free (hit tests on dz-premultiplied
barycentrics); winner u/v are NOT tracked per tile — exact t/u/v are
recomputed once per ray from the winning triangle's vertices, O(rays)
instead of O(ray×cluster pairs).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.types import CLUSTER_SIZE

BIG = 3e38
_INF = jnp.float32(np.inf)

# largest triangle count whose packed Woop table (96 B/tri) is kept
# fully VMEM-resident during the sweep (~6 MB of the ~16 MB VMEM);
# larger scenes run the PARTITIONED resident sweep (_sweep_parts):
# ≤ this many triangles per part, parts chained through per-ray best-t
RESIDENT_MAX_TRIS = 65536


def _part_tris() -> int:
    """Per-part triangle budget for _sweep_parts (test/tuning knob)."""
    return int(os.environ.get("MQ_PART_TRIS", "0")) or RESIDENT_MAX_TRIS


def build_woop(
    v0, v1, v2, candidate, chunk: int = CLUSTER_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Host precompute: (w[3T, 8] packed rows, updated candidate).

    Returned w has kernel layout (3T, 8): per CLUSTER_SIZE chunk, the
    chunk's row-0 vectors, then row-1, then row-2 (each [A | b] in
    columns 0-3). Front-facing by the reference's convention
    (n_ref = cross(v2-v0, v1-v0), hit iff d·n_ref < 0) ⇔ dz > 0.
    Non-candidate triangles get all-zero rows (dz ≡ 0 → never front-
    facing), so candidacy is baked in and needs no kernel input.
    """
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v2 = np.asarray(v2, np.float64)
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)  # columns e1 e2 n
    det = np.linalg.det(m)
    ok = np.abs(det) > 1e-12
    cand = np.asarray(candidate, bool) & ok
    m_safe = np.where(ok[:, None, None], m, np.eye(3)[None])
    inv = np.linalg.inv(m_safe)  # (T, 3, 3) rows of M
    b = -np.einsum("tij,tj->ti", inv, v0)
    t = v0.shape[0]
    c = chunk
    assert t % c == 0, (t, c)
    # rows (T, 3, 4): per-triangle affine rows [A | b]
    rows = np.concatenate([inv, b[:, :, None]], axis=2).astype(np.float32)
    rows = np.where(cand[:, None, None], rows, 0.0)
    # kernel layout (3T, 8): per chunk j the row range [3cj, 3c(j+1)) is
    # [row0s (c); row1s (c); row2s (c)], columns 0-3 used, 4-7 zero
    blocks = rows.reshape(t // c, c, 3, 4).transpose(0, 2, 1, 3)
    w = np.zeros((3 * t, 8), np.float32)
    w[:, :4] = blocks.reshape(3 * t, 4)
    return w, cand


def bake_candidacy(w: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """Zero the w rows of non-candidate triangles (layout-aware)."""
    t = cand.shape[0]
    c = CLUSTER_SIZE
    mask = np.broadcast_to(
        np.asarray(cand, bool).reshape(t // c, 1, c), (t // c, 3, c)
    ).reshape(3 * t)
    return np.where(mask[:, None], w, 0.0).astype(np.float32)


def _kernel_stream(
    order_ref, te_ref, cb_ref, rays_ref, w_hbm, t0_ref, i0_ref, out_ref,
    idx_ref, wbuf, sems, slot_cid, *, chunk, max_visits=None,
    start_visit=0, simple=False, anyhit=False, fastdiv=False,
):
    """Per-ray-block streaming sweep (one grid step per ray block).

    The cluster loop runs INSIDE the kernel: clusters are visited in
    this block's own near-to-far order (te ascending, precomputed
    XLA-side). Round-4 rework: each candidate cluster is first tested
    by the FOLDED per-ray slab gate (same (8, B/8) full-VPU-utilization
    gate as the resident kernel) and only reach-passing tiles are
    streamed HBM→VMEM — the round-3 version streamed every within-
    horizon cluster and was pure DMA latency (~4 µs/visit). Passing
    tiles ride an ns-slot ring with depth = ns-1 copies in flight
    (software pipeline: issuing item q computes item q-depth), so the
    per-tile DMA latency is amortized across the ring. The loop goes
    dead at the first cluster whose conservative entry parameter
    exceeds the block's horizon t̂ = max_r min(best_t_r, t_max_r) — te
    is ascending, so every later cluster is farther: an EXACT
    early-out, like a BVH walk without divergent per-ray stacks.

    The gate uses the limit/horizon as of the last computed tile
    (compute lags issue by `depth` items) — stale limits are LARGER,
    so gating stays conservative and results exact.
    """
    out_ref[0, :] = t0_ref[0, :]
    idx_ref[0, :] = i0_ref[0, :]
    t_max = rays_ref[7, :]
    horizon0 = jnp.max(jnp.minimum(out_ref[0, :], t_max))

    # te/order live in SMEM: per-visit metadata reads are plain scalar
    # loads. (A VMEM masked-reduce per lookup was measured at ~2 µs of
    # serialized VPU→scalar latency per visit — it dominated the sweep.)
    def te_at(j):
        return te_ref[0, 0, j]

    def cid_at(j):
        return order_ref[0, 0, j]

    def cb_at(j, c):
        # visit-ordered cluster bounds, SMEM scalar load
        return cb_ref[0, c, j]

    B = rays_ref.shape[1]
    rays_all = rays_ref[:]
    rhs_full = jnp.concatenate(
        [
            jnp.concatenate(
                [rays_all[0:3], jnp.ones_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
            jnp.concatenate(
                [rays_all[3:6], jnp.zeros_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
        ],
        axis=1,
    )  # (8, 2B)

    # per-ray slab-gate ingredients (same (1, B) row gate as the
    # resident kernel — a folded (8, B/8) variant measured slower)
    o3 = rays_all[0:3]
    d3 = rays_all[3:6]
    tiny = jnp.where(d3 >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    inv_d = 1.0 / jnp.where(jnp.abs(d3) < 1e-20, tiny, d3)

    def reach_any(j):
        # gate straight off out_ref: out only changes when a tile
        # computes, so the limit is always current
        limit = jnp.minimum(out_ref[0:1, :], t_max[None, :])
        limit = limit * 1.002 + 0.05
        tn = jnp.zeros_like(limit)
        tf = limit
        for c in range(3):
            t1 = (cb_at(j, c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
            t2 = (cb_at(j, 3 + c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        return jnp.max(jnp.where(tn <= tf, 1.0, 0.0)) > 0.0

    # w is streamed TRANSPOSED, (8, 3T): the cluster slice cuts the
    # LANE dimension in 3C-wide chunks (3C = 384/192 — multiples of
    # the 128 tiling), which is the alignment manual DMAs require
    # (a (3C, 8) slice has an 8-wide minor dim and Mosaic rejects it)
    c3 = wbuf.shape[-1]

    def start_copy(j, slot: int):
        pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(cid_at(j) * c3, c3)],
            wbuf.at[slot],
            sems.at[slot],
        ).start()

    def wait_copy(slot: int):
        pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(0, c3)], wbuf.at[slot], sems.at[slot]
        ).wait()

    nc = te_ref.shape[-1] if max_visits is None else min(
        max_visits, te_ref.shape[-1]
    )
    ns = wbuf.shape[0]  # ring slots
    depth = ns - 1  # issued-but-uncomputed items kept in flight
    j0 = start_visit

    def compute_item(q):
        """Wait slot q%ns and run its tile (cluster id from slot_cid).

        Slot indices are kept STATIC (ns branches per site): dynamic
        leading-dim indexing of VMEM scratch / semaphore arrays crashes
        the Mosaic compiler."""
        slot_q = jax.lax.rem(q, ns)
        for slot in range(ns):
            @pl.when(slot_q == slot)
            def _(slot=slot):
                wait_copy(slot)
                _intersect_tile(
                    rays_ref, wbuf[slot], out_ref, idx_ref,
                    slot_cid[slot], simple=simple, anyhit=anyhit,
                    fastdiv=fastdiv, rhs=rhs_full, C=chunk,
                )

    def issue_item(j, q):
        slot_q = jax.lax.rem(q, ns)
        for slot in range(ns):
            @pl.when(slot_q == slot)
            def _(slot=slot):
                slot_cid[slot] = cid_at(j)
                start_copy(j, slot)

    # main loop over candidate clusters j (te ascending). Carry:
    # issued = number of gate-passing items issued so far; computed
    # lags by min(depth, issued-computed). Items are computed when a
    # new issue would need their slot, and in the drain.
    def cond(carry):
        j, issued, computed, horizon, live = carry
        return live

    def body(carry):
        j, issued, computed, horizon, live = carry
        gate = reach_any(j)

        # before reusing slot issued%ns, compute the item that holds it
        need_compute = gate & (issued - computed >= depth)

        @pl.when(need_compute)
        def _():
            compute_item(computed)

        computed2 = computed + need_compute.astype(jnp.int32)
        horizon2 = jnp.max(jnp.minimum(out_ref[0, :], t_max))

        @pl.when(gate)
        def _():
            issue_item(j, issued)

        issued2 = issued + gate.astype(jnp.int32)
        next_live = (j + 1 < nc) & (te_at(j + 1) <= horizon2)
        return j + 1, issued2, computed2, horizon2, next_live

    j_f, issued_f, computed_f, _, _ = jax.lax.while_loop(
        cond, body,
        (
            jnp.int32(j0), jnp.int32(0), jnp.int32(0), horizon0,
            (j0 < nc) & (te_at(j0) <= horizon0),
        ),
    )

    # ---- drain issued-but-uncomputed items so no semaphore leaks
    # into the next grid step ----
    for k in range(depth):
        q = computed_f + k
        @pl.when(q < issued_f)
        def _(q=q):
            compute_item(q)


def _kernel_resident(
    order_ref, te_ref, cb_ref, rays_ref, w_ref, t0_ref, i0_ref, out_ref,
    idx_ref,
    *, max_visits=None, start_visit=0, simple=False, group=1,
    anyhit=False, percull=True, fastdiv=False, subgate=1, compact=0,
):
    """Per-ray-block sweep with the WHOLE Woop table resident in VMEM.

    For scenes whose packed table fits on-chip (≤ RESIDENT_MAX_TRIS,
    ~96 B/triangle) the streaming kernel's per-visit HBM→VMEM copy is
    pure waste: measured 4.1 µs/visit at ray_block 2048 with the DMA
    latency fully exposed (matmul-only and full-epilogue variants time
    IDENTICALLY — the sweep is DMA-bound, not compute-bound). Here the
    (nc, 8, 3C) table is copied in once by the pipeline (constant index
    map → stays resident across grid steps) and each visit just
    dynamic-slices its cluster — per-visit cost drops to the compute.

    ``percull``: per-ray exact slab reachability gate before each tile.
    The XLA-side interval cull is conservative over the whole bundle
    (fat frustums of sorted bounce blocks reach many clusters no single
    ray can enter before its own best_t); here each visit first slab-
    tests every ray individually against the cluster AABB with per-ray
    limit min(best_t, t_max) — ~25 VPU ops on (1, B) rows vs the tile's
    22-op epilogue on (C, B) — and skips the whole tile when NO ray can
    reach. Exact: a hit that improves best_t must enter the AABB before
    the ray's limit, so a skipped tile can never change the result.
    """
    out_ref[0, :] = t0_ref[0, :]
    idx_ref[0, :] = i0_ref[0, :]
    t_max = rays_ref[7, :]
    # warm start: a prior partial sweep's best_t tightens the horizon
    # BEFORE the first visit, collapsing this block's te-prefix
    horizon0 = jnp.max(jnp.minimum(out_ref[0, :], t_max))

    # per-visit metadata (entry parameter, cluster id, cluster bounds)
    # comes from SMEM scalar tables: each lookup is one scalar load.
    # The previous VMEM lane-masked reduces cost ~2 µs of serialized
    # VPU→scalar latency per visit — 2.6× the whole tile compute.
    def te_at(j):
        return te_ref[0, 0, j]

    def cid_at(j):
        return order_ref[0, 0, j]

    # loop-invariant matmul rhs, hoisted out of the visit loop (the
    # per-visit concat was ~64 VREG copies per executed tile)
    B = rays_ref.shape[1]
    rays_all = rays_ref[:]
    rhs_full = jnp.concatenate(
        [
            jnp.concatenate(
                [rays_all[0:3], jnp.ones_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
            jnp.concatenate(
                [rays_all[3:6], jnp.zeros_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
        ],
        axis=1,
    )  # (8, 2B)

    if percull:
        # loop-invariant per-ray slab ingredients (d == 0 clamped to a
        # tiny signed value: inv stays finite, products overflow to
        # ±inf, never NaN)
        o3 = rays_ref[0:3, :]
        d3 = rays_ref[3:6, :]
        tiny = jnp.where(d3 >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
        inv_d = 1.0 / jnp.where(jnp.abs(d3) < 1e-20, tiny, d3)

        def cb_at(j, c):
            # visit-ordered cluster bounds, SMEM scalar load
            return cb_ref[0, c, j]

        def reach_row(j):
            # small slack on the per-ray limit: the tile's committed t
            # comes from the MXU's reduced-precision matmul and can sit
            # a little below the exact slab entry — without slack ~1 ppm
            # of rays lose their boundary-grazing winner (measured)
            limit = jnp.minimum(out_ref[0:1, :], t_max[None, :])
            limit = limit * 1.002 + 0.05
            tn = jnp.zeros_like(limit)
            tf = limit
            for c in range(3):
                t1 = (cb_at(j, c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
                t2 = (cb_at(j, 3 + c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
                tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            return jnp.where(tn <= tf, 1.0, 0.0)  # (1, B)

    nc = te_ref.shape[-1] if max_visits is None else min(
        max_visits, te_ref.shape[-1]
    )
    j0 = start_visit

    if not percull:
        def reachable(j):
            return True
    else:
        def reachable(j):
            # NOTE (round 4): a folded (8, B/8) gate variant was built
            # and measured 45% SLOWER than this (1, B) row gate at
            # rb=4096 — Mosaic lays (1, B) rows out as dense 1-D
            # vectors, so the fold bought no utilization and paid
            # concat + lax.cond overhead. Keep the row gate.
            return jnp.max(reach_row(j)) > 0.0

    # ``group`` clusters are swept per loop iteration: the loop's fixed
    # scalar cost (carry sync, horizon/te reduces) measured ~0.6 µs —
    # comparable to the whole tile compute at small ray blocks — so it
    # is amortized over G visits. Exit granularity coarsens to G (the
    # sweep may overshoot the horizon by up to G-1 near clusters).
    def cond(carry):
        j, horizon, live = carry
        return live

    def body(carry):
        j, horizon, live = carry
        for g in range(group):
            jg = j + g
            cid = cid_at(jg)
            in_range = (jg < nc) & (te_at(jg) <= horizon) if group > 1 \
                else True
            if percull and subgate > 1:
                # sub-block gating: the per-ray reach row is already
                # computed for the whole-tile gate; splitting the tile
                # into ``subgate`` column slices and gating each on its
                # own any-reach skips the matmul+epilogue for ray
                # sub-ranges no ray of which can improve its hit
                # (measured: only ~70% of 512-sub-blocks of a reachable
                # tile are themselves reachable on sorted bounce rays)
                row = reach_row(jg)
                bsz = row.shape[1]
                sz = bsz // subgate
                for s2 in range(subgate):
                    sub_any = jnp.max(row[0, s2 * sz:(s2 + 1) * sz]) > 0.0
                    gate = sub_any if in_range is True else (
                        in_range & sub_any
                    )

                    @pl.when(gate)
                    def _(cid=cid, s2=s2):
                        _intersect_tile(
                            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                            simple=simple, anyhit=anyhit, fastdiv=fastdiv,
                            col0=s2 * sz, ncol=sz,
                        )
            elif percull and compact > 0 and not anyhit:
                # compacted visit (see _intersect_tile_compact): tiles
                # where ≤``compact`` rays reach run at C×compact pairs;
                # denser tiles (the genuinely useful ones) run full
                row = reach_row(jg)
                cnt = jnp.sum(row)
                gate_c = (cnt > 0.0) & (cnt <= float(compact))
                gate_f = cnt > float(compact)
                if group > 1:
                    gate_c = gate_c & in_range
                    gate_f = gate_f & in_range

                @pl.when(gate_c)
                def _(cid=cid, row=row):
                    _intersect_tile_compact(
                        rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                        row, compact, simple=simple, fastdiv=fastdiv,
                    )

                @pl.when(gate_f)
                def _(cid=cid):
                    _intersect_tile(
                        rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                        simple=simple, anyhit=anyhit, fastdiv=fastdiv,
                    )
            else:
                gate = in_range & reachable(jg) if percull else in_range
                if gate is True:
                    _intersect_tile(
                        rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                        simple=simple, anyhit=anyhit, fastdiv=fastdiv,
                        rhs=rhs_full,
                    )
                else:
                    @pl.when(gate)
                    def _(cid=cid):
                        _intersect_tile(
                            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                            simple=simple, anyhit=anyhit, fastdiv=fastdiv,
                            rhs=rhs_full,
                        )
        horizon2 = jnp.max(jnp.minimum(out_ref[0, :], t_max))
        next_live = (j + group < nc) & (te_at(j + group) <= horizon2)
        return j + group, horizon2, next_live

    jax.lax.while_loop(
        cond, body,
        (jnp.int32(j0), horizon0, (j0 < nc) & (te_at(j0) <= horizon0)),
    )


def _kernel_resident_nodes(
    order_ref, te_ref, nodeb_ref, cb_ref, rays_ref, w_ref, t0_ref,
    i0_ref, out_ref, idx_ref,
    *, nodes_per, nc, simple=False, anyhit=False, fastdiv=False,
    compact=0,
):
    """Resident sweep with ONE interior node level over the clusters
    (round-5; VERDICT r4 #1 — the in-kernel hierarchy).

    The cluster order is the cluster-aligned median-split from
    build_accel, so ``nodes_per`` CONSECUTIVE clusters form a spatially
    tight subtree; their union AABB is the interior node (computed
    XLA-side, tight by construction — min/max over member boxes, not a
    fat Morton cell like the round-4 supercluster attempt). The visit
    list is node-ordered (te ascending at NODE level, 16x shorter than
    the flat cluster list), and the while loop pays the per-visit
    ~25-op reach gate + fixed scalar cost ONCE per node: an unreachable
    node skips all ``nodes_per`` member clusters for the price the flat
    sweep paid per cluster. Reachable nodes descend to the same
    per-cluster exact reach gates as the flat kernel (cluster bounds in
    identity order, SMEM), so results are bit-identical to the flat
    sweep: a node's box contains its members' boxes, hence a skipped
    node can contain no cluster any ray reaches within its limit, and
    member visits commit through the same strict-improvement min.
    Replaces the log-time role of the reference's per-ray BVH walk
    (raytrace.glsl:95-119) with a two-level packet descent.
    """
    out_ref[0, :] = t0_ref[0, :]
    idx_ref[0, :] = i0_ref[0, :]
    t_max = rays_ref[7, :]
    horizon0 = jnp.max(jnp.minimum(out_ref[0, :], t_max))

    def te_at(j):
        return te_ref[0, 0, j]

    def nid_at(j):
        return order_ref[0, 0, j]

    B = rays_ref.shape[1]
    rays_all = rays_ref[:]
    rhs_full = jnp.concatenate(
        [
            jnp.concatenate(
                [rays_all[0:3], jnp.ones_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
            jnp.concatenate(
                [rays_all[3:6], jnp.zeros_like(rays_all[0:1]),
                 rays_all[4:8]], axis=0
            ),
        ],
        axis=1,
    )  # (8, 2B)

    o3 = rays_ref[0:3, :]
    d3 = rays_ref[3:6, :]
    tiny = jnp.where(d3 >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    inv_d = 1.0 / jnp.where(jnp.abs(d3) < 1e-20, tiny, d3)

    def reach_row_tab(tab_at, j):
        # per-ray slab reach against box j of a bounds table (same
        # slack story as _kernel_resident.reach_row)
        limit = jnp.minimum(out_ref[0:1, :], t_max[None, :])
        limit = limit * 1.002 + 0.05
        tn = jnp.zeros_like(limit)
        tf = limit
        for c in range(3):
            t1 = (tab_at(j, c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
            t2 = (tab_at(j, 3 + c) - o3[c : c + 1, :]) * inv_d[c : c + 1, :]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        return jnp.where(tn <= tf, 1.0, 0.0)  # (1, B)

    def nodeb_at(j, c):
        # node bounds in VISIT order (per-block gather, like the flat
        # kernel's cb): one SMEM scalar load
        return nodeb_ref[0, c, j]

    def cb_at(cid, c):
        # cluster bounds in IDENTITY order (shared across blocks)
        return cb_ref[0, c, cid]

    nn = te_ref.shape[-1]

    def cond(carry):
        j, horizon, live = carry
        return live

    def body(carry):
        j, horizon, live = carry
        node_gate = jnp.max(reach_row_tab(nodeb_at, j)) > 0.0

        @pl.when(node_gate)
        def _():
            nid = nid_at(j)
            for k in range(nodes_per):
                cid = nid * nodes_per + k
                in_rng = cid < nc
                row = reach_row_tab(cb_at, cid)
                if compact > 0 and not anyhit:
                    cnt = jnp.sum(row)
                    gate_c = in_rng & (cnt > 0.0) & (cnt <= float(compact))
                    gate_f = in_rng & (cnt > float(compact))

                    @pl.when(gate_c)
                    def _(cid=cid, row=row):
                        _intersect_tile_compact(
                            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                            row, compact, simple=simple, fastdiv=fastdiv,
                        )

                    @pl.when(gate_f)
                    def _(cid=cid):
                        _intersect_tile(
                            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                            simple=simple, anyhit=anyhit,
                            fastdiv=fastdiv, rhs=rhs_full,
                        )
                else:
                    gate = in_rng & (jnp.max(row) > 0.0)

                    @pl.when(gate)
                    def _(cid=cid):
                        _intersect_tile(
                            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
                            simple=simple, anyhit=anyhit,
                            fastdiv=fastdiv, rhs=rhs_full,
                        )

        horizon2 = jnp.max(jnp.minimum(out_ref[0, :], t_max))
        next_live = (j + 1 < nn) & (te_at(j + 1) <= horizon2)
        return j + 1, horizon2, next_live

    jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), horizon0, (0 < nn) & (te_at(0) <= horizon0)),
    )


def _intersect_tile_compact(
    rays_ref, w, out_ref, idx_ref, cluster_id, row, ncomp,
    simple=False, fastdiv=False,
):
    """Visit a tile with the reaching rays COMPACTED onto ``ncomp``
    MXU columns (round-3 pair-waste fix): within a visited tile
    typically <10-20% of the block's rays can actually reach the
    cluster (docs/perf_notes_r2.md), yet the full tile tests all
    B×C pairs. Here the per-ray reach row (already computed for the
    tile gate) builds a one-hot selection matrix P via a lane
    prefix-sum, the reaching rays are gathered onto ncomp columns with
    ONE matmul (exact: P entries are 0/1, one nonzero per column), the
    Woop tile runs at C×ncomp pairs instead of C×B, and winners
    scatter back through Pᵀ. Caller guarantees count(row) ≤ ncomp.
    """
    div = _fast_div if fastdiv else (lambda n, d: n / d)
    B = rays_ref.shape[1]
    # exclusive per-lane rank among reaching rays. Mosaic has no cumsum
    # primitive → log-shift prefix sum via pltpu.roll + lane masking
    # (~log2(B) roll/where/add rounds on a (1, B) row)
    incl = row
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    s = 1
    while s < B:
        sh = pltpu.roll(incl, s, 1)
        incl = incl + jnp.where(lane >= s, sh, 0.0)
        s *= 2
    rank = (incl - row).astype(jnp.int32)  # (1, B) exclusive rank
    # iota must be integer on Mosaic (f32 iota fails verification)
    slot = jax.lax.broadcasted_iota(jnp.int32, (ncomp, B), 0)
    P = jnp.where((rank == slot) & (row > 0.0), 1.0, 0.0)  # (ncomp, B)
    dotn = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )
    rc = dotn(rays_ref[:], P, ((1,), (1,)))  # (8, ncomp) compacted rays
    best0 = dotn(out_ref[0:1, :], P, ((1,), (1,)))  # (1, ncomp)
    # unselected columns come back all-zero: kill them via t_max = -1
    colsel = dotn(jnp.ones((1, B), jnp.float32), P, ((1,), (1,)))
    t_min, t_max = rc[6:7], jnp.where(colsel > 0.0, rc[7:8], -1.0)

    o_aug = jnp.concatenate(
        [rc[0:3], jnp.ones_like(rc[0:1]), rc[4:8]], axis=0
    )
    d_aug = jnp.concatenate(
        [rc[3:6], jnp.zeros_like(rc[0:1]), rc[4:8]], axis=0
    )
    rhs = jnp.concatenate([o_aug, d_aug], axis=1)  # (8, 2*ncomp)
    big = jax.lax.dot_general(
        w, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    C = w.shape[1] // 3
    nc2 = ncomp
    u0 = big[0:C, 0:nc2]
    v0 = big[C : 2 * C, 0:nc2]
    z0 = big[2 * C : 3 * C, 0:nc2]
    du = big[0:C, nc2 : 2 * nc2]
    dv = big[C : 2 * C, nc2 : 2 * nc2]
    dz = big[2 * C : 3 * C, nc2 : 2 * nc2]
    z0n = -z0
    U = u0 * dz - z0 * du
    V = v0 * dz - z0 * dv
    if simple:
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(U, V), dz - U - V),
            jnp.minimum(dz - 1e-12, t_max * dz - z0n),
        )
        ok = (m >= 0.0) & (z0n > 0.0)
        t = div(z0n, jnp.where(ok, dz, 1.0))
    else:
        front = dz > 1e-12
        ok = (
            front
            & (U >= 0.0)
            & (V >= 0.0)
            & (U + V <= dz)
            & (z0n > t_min * dz)
            & (z0n <= t_max * dz)
        )
        t = div(z0n, jnp.where(front, dz, 1.0))
    t_m = jnp.where(ok, t, BIG)
    best_t = jnp.minimum(jnp.min(t_m, axis=0), best0[0, :])  # (ncomp,)
    arg = jnp.argmin(t_m, axis=0)

    # scatter winners back through Pᵀ (one nonzero per P column →
    # exact); idx rides as integer-valued f32 (tri ids < 2^24)
    t_back = dotn(best_t[None, :], P, ((1,), (0,)))  # (1, B)
    a_back = dotn(arg.astype(jnp.float32)[None, :], P, ((1,), (0,)))
    better = (row > 0.0) & (t_back < out_ref[0:1, :])
    out_ref[0, :] = jnp.where(better, t_back, out_ref[0:1, :])[0, :]
    idx_ref[0, :] = jnp.where(
        better,
        cluster_id * C + a_back.astype(jnp.int32),
        idx_ref[0:1, :],
    )[0, :]


def _fast_div(num, den):
    """num/den via the VPU's approximate reciprocal + 2 Newton steps.

    The tile's per-pair divide is the single most expensive epilogue op
    (XLA lowers f32 div to a long multi-pass sequence); two Newton
    refinements of the bf16-accurate hardware reciprocal bring the
    relative error to ~2^-30 — below f32 ulp for this use (the winner's
    exact t/u/v are recomputed per ray afterwards anyway).
    """
    r = pl.reciprocal(den, approx=True)
    r = r * (2.0 - den * r)
    r = r * (2.0 - den * r)
    return num * r


def _intersect_tile(rays_ref, w, out_ref, idx_ref, cluster_id,
                    simple=False, anyhit=False, fastdiv=False,
                    col0=0, ncol=None, rhs=None, C=None):
    div = _fast_div if fastdiv else (lambda n, d: n / d)
    if ncol is None:
        rays = rays_ref[:]  # (8, B)
    else:
        rays = rays_ref[:, col0:col0 + ncol]  # (8, ncol) sub-block
    # w: (8, 3C) TRANSPOSED row blocks [row0s | row1s | row2s] along
    # lanes, rows 0-3 used. ``C`` is passed explicitly when w carries
    # lane padding past 3C (the streaming path pads each cluster block
    # to a 128-multiple for DMA alignment); the pad rows of the matmul
    # output are simply never sliced.
    t_min, t_max = rays[6:7], rays[7:8]  # (1, B)

    B = rays.shape[1]
    if rhs is None:
        o_aug = jnp.concatenate(
            [rays[0:3], jnp.ones_like(rays[0:1]), rays[4:8]], axis=0
        )
        d_aug = jnp.concatenate(
            [rays[3:6], jnp.zeros_like(rays[0:1]), rays[4:8]], axis=0
        )
        # rows 4..7 of the augmented vectors are garbage — the matching
        # w columns are zero, so they do not contribute.
        rhs = jnp.concatenate([o_aug, d_aug], axis=1)  # (8, 2B)

    # ONE matmul per tile: (8, 3C)ᵀ @ (8, 2B) → (3C, 2B) on the MXU
    big = jax.lax.dot_general(
        w, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if C is None:
        C = w.shape[1] // 3
    u0 = big[0:C, 0:B]
    v0 = big[C : 2 * C, 0:B]
    z0 = big[2 * C : 3 * C, 0:B]
    du = big[0:C, B : 2 * B]
    dv = big[C : 2 * C, B : 2 * B]
    dz = big[2 * C : 3 * C, B : 2 * B]

    # division-free hit test: multiply the u/v/t conditions through by
    # dz > 0 (front-facing) — exact sign decisions, no per-pair divides
    z0n = -z0
    U = u0 * dz - z0 * du  # u·dz ≥ 0  ⇔  u ≥ 0
    V = v0 * dz - z0 * dv
    if anyhit:
        # occlusion-only epilogue (visibility/shadow rays): no divide,
        # no argmin, no winner bookkeeping — ONE min-tree per pair and
        # a column max. An occluded ray writes best_t = 0, collapsing
        # its horizon contribution so fully-occluded blocks die at the
        # next te check. t_min is a positive offset, so the ≥ tests
        # are safe against MXU-flushed z0 == 0 (rejected by tmin·dz).
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(U, V), dz - U - V),
            jnp.minimum(
                jnp.minimum(dz - 1e-12, z0n - t_min * dz),
                t_max * dz - z0n,
            ),
        )
        occluded = jnp.max(m, axis=0) >= 0.0  # (B,) any pair hit
        if ncol is None:
            out_ref[0, :] = jnp.where(occluded, 0.0, out_ref[0, :])
        else:
            out_ref[0, col0:col0 + ncol] = jnp.where(
                occluded, 0.0, out_ref[0, col0:col0 + ncol]
            )
        return
    if simple:
        # static-zero t_min: a strict z0n > 0 replaces the t_min
        # compare. Strictness matters: the MXU's reduced-precision f32
        # matmul flushes small plane distances to EXACTLY 0.0, and a
        # ≥-test would commit those as t=0 hits that win every min
        # (measured: ~0.07% of a random trace corrupted). The VPU
        # epilogue is the sweep's wall (~70% of per-pair cost), so the
        # remaining conjunction folds into one min-tree: 22 ops vs 25.
        m = jnp.minimum(
            jnp.minimum(jnp.minimum(U, V), dz - U - V),
            jnp.minimum(dz - 1e-12, t_max * dz - z0n),
        )
        ok = (m >= 0.0) & (z0n > 0.0)
        t = div(z0n, jnp.where(ok, dz, 1.0))
    else:
        front = dz > 1e-12
        ok = (
            front
            & (U >= 0.0)
            & (V >= 0.0)
            & (U + V <= dz)
            & (z0n > t_min * dz)
            & (z0n <= t_max * dz)
        )
        t = div(z0n, jnp.where(front, dz, 1.0))
    t_m = jnp.where(ok, t, BIG)

    best_t = jnp.min(t_m, axis=0)
    arg = jnp.argmin(t_m, axis=0)
    # (a packed i32 min-reduce with the row index in t's low mantissa
    # bits was tried and measured SLOWER than min+argmin — the extra
    # bitcast/mask passes over the (C, B) tile outweigh the saving)

    if ncol is None:
        osl = isl = slice(None)
    else:
        osl = isl = slice(col0, col0 + ncol)
    better = best_t < out_ref[0, osl]
    out_ref[0, osl] = jnp.where(better, best_t, out_ref[0, osl])
    idx_ref[0, isl] = jnp.where(
        better, cluster_id * C + arg.astype(jnp.int32), idx_ref[0, isl]
    )


def _slab_te_lanes(rays, cb_at, c, limit=None):
    """Per-lane slab entry parameter against cluster ``c`` (static id).

    rays: (8, B) VMEM block; cb_at(c, k): SMEM scalar loads of the
    cluster bounds table (rows lo.xyz, hi.xyz). Returns (1, B) f32:
    max(t_enter, 0) where the ray's [0, limit] interval intersects the
    box, else +inf. ``limit`` defaults to the per-ray t_max row (dead
    rays with t_max < 0 produce +inf for every cluster).
    """
    o3 = rays[0:3, :]
    d3 = rays[3:6, :]
    tiny = jnp.where(d3 >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    inv_d = 1.0 / jnp.where(jnp.abs(d3) < 1e-20, tiny, d3)
    if limit is None:
        limit = rays[7:8, :]
    tn = jnp.zeros_like(limit)
    tf = limit
    for k in range(3):
        t1 = (cb_at(c, k) - o3[k : k + 1, :]) * inv_d[k : k + 1, :]
        t2 = (cb_at(c, 3 + k) - o3[k : k + 1, :]) * inv_d[k : k + 1, :]
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
    return jnp.where(tn <= tf, tn, jnp.float32(np.inf))


def _kernel_target_keys(cb_ref, rays_ref, key_ref, *, nc):
    """Per-ray TOP-3 nearest-reachable-cluster sort key (one grid step
    per ray block): walk every cluster's AABB, keep the three smallest
    entry parameters per lane, and pack their cluster ids into
    (c1 << 22) | (c2 << 14) | (c3 << 6). Rays sorted by this key are
    grouped by the clusters they actually need, so sorted blocks'
    reachable-cluster unions collapse (measured ~7-14x tighter than
    origin-Morton grouping on city bounce populations). Lanes with
    fewer than three reachable clusters carry the 0xFF sentinel (sorts
    after real targets); XLA adds the Morton tail + dead-ray bit.
    """
    rays = rays_ref[:]
    B = rays.shape[1]

    def cb_at(c, k):
        return cb_ref[0, k, c]

    inf_row = jnp.full((1, B), np.inf, jnp.float32)
    t1, t2, t3 = inf_row, inf_row, inf_row
    sent = jnp.full((1, B), 0xFF, jnp.int32)
    c1 = c2 = c3 = sent
    for c in range(nc):
        te = _slab_te_lanes(rays, cb_at, c)
        cc = jnp.full((1, B), c, jnp.int32)
        b1 = te < t1
        b2 = te < t2
        b3 = te < t3
        t3n = jnp.where(b3, jnp.where(b2, t2, te), t3)
        c3n = jnp.where(b3, jnp.where(b2, c2, cc), c3)
        t2n = jnp.where(b2, jnp.where(b1, t1, te), t2)
        c2n = jnp.where(b2, jnp.where(b1, c1, cc), c2)
        t1 = jnp.where(b1, te, t1)
        c1 = jnp.where(b1, cc, c1)
        t2, t3, c2, c3 = t2n, t3n, c2n, c3n
    key_ref[0, :] = ((c1 << 22) | (c2 << 14) | (c3 << 6))[0, :]


def _kernel_te_union(cb_ref, rays_ref, te_ref, *, nc, nc_pad):
    """EXACT per-block union entry parameters (one grid step per ray
    block of ALREADY target-key-sorted rays): te[b, c] = min over the
    block's lanes of the lane's own slab entry into c (+inf where no
    lane reaches). Replaces the conservative interval-frustum cull
    (_cull_t_enter) — with target-grouped blocks this is the block's
    true reachable set, so the packet sweep's visit list shrinks to
    the clusters some ray actually needs."""
    rays = rays_ref[:]

    def cb_at(c, k):
        return cb_ref[0, k, c]

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, nc_pad), 1)
    acc = jnp.full((1, nc_pad), np.inf, jnp.float32)
    for c in range(nc):
        te = _slab_te_lanes(rays, cb_at, c)
        m = jnp.min(te)
        acc = jnp.where(iota == c, jnp.minimum(acc, m), acc)
    te_ref[0, 0, :] = acc[0, :]


def _target_keys(rays, cluster_lo, cluster_hi, ray_block, interpret=False):
    """Pallas driver for _kernel_target_keys → i32[n] packed c1c2c3."""
    n = rays.shape[1]
    nb = n // ray_block
    nc = cluster_lo.shape[0]
    cb = jnp.concatenate(
        [
            jnp.asarray(cluster_lo, jnp.float32).T,
            jnp.asarray(cluster_hi, jnp.float32).T,
            jnp.zeros((2, nc), jnp.float32),
        ],
        axis=0,
    )[None]  # (1, 8, nc)
    out = pl.pallas_call(
        functools.partial(_kernel_target_keys, nc=nc),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, nc), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ray_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=interpret,
    )(cb, rays)
    return out[0]


def _te_union(rays, cluster_lo, cluster_hi, ray_block, interpret=False):
    """Pallas driver for _kernel_te_union → f32[nb, nc] exact union te."""
    n = rays.shape[1]
    nb = n // ray_block
    nc = cluster_lo.shape[0]
    nc_pad = ((nc + 127) // 128) * 128
    cb = jnp.concatenate(
        [
            jnp.asarray(cluster_lo, jnp.float32).T,
            jnp.asarray(cluster_hi, jnp.float32).T,
            jnp.zeros((2, nc), jnp.float32),
        ],
        axis=0,
    )[None]
    out = pl.pallas_call(
        functools.partial(_kernel_te_union, nc=nc, nc_pad=nc_pad),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, nc), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ray_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        # (nb, 1, nc_pad) with trailing dims equal to the array dims —
        # satisfies the TPU (8, 128) block-divisibility rule for any nb
        out_specs=pl.BlockSpec((1, 1, nc_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, nc_pad), jnp.float32),
        interpret=interpret,
    )(cb, rays)
    return out[:, 0, :nc]


def _cull_t_enter(rays, cluster_lo, cluster_hi, ray_block, subdiv: int = 4):
    """Conservative (ray-block × cluster) entry parameter.

    Interval slab test over the whole ray bundle (packet-tracing
    style): for a block with origin box O, direction box D and max
    parameter t̂, each axis k with sign-consistent directions bounds
    the parameter interval during which ANY bundle ray can be inside
    the cluster slab:

        t_enter_k ≥ (c_lo − O_hi)/D_hi   (fastest approach from the
        t_exit_k  ≤ (c_hi − O_lo)/D_lo    nearest origin, etc.)

    (mirrored for negative direction intervals; sign-mixed axes give
    no constraint). Returns f32[nb, nc]: max(t_enter, 0) when the
    interval intersection with [0, t̂] is non-empty, else +inf. This
    captures the frustum correlation axis-aligned reach boxes miss;
    incoherent blocks degrade gracefully toward the dense sweep.

    ``subdiv``: the test runs on ``subdiv`` consecutive SUB-bundles per
    block and min-reduces their entries. Each sub-bundle's interval
    boxes are tighter than the fat block frustum, so the min is a
    LATER (tighter) conservative entry than the whole-block test —
    strictly fewer visited clusters, still exact (the min over a cover
    of the block's rays lower-bounds every ray's own entry). The extra
    XLA-side cost is ~subdiv× of a few ms.
    """
    n = rays.shape[1]
    if subdiv > 1 and ray_block % subdiv == 0:
        sub = _cull_t_enter(
            rays, cluster_lo, cluster_hi, ray_block // subdiv, subdiv=1
        )  # (nb*subdiv, nc)
        nb = n // ray_block
        return sub.reshape(nb, subdiv, -1).min(axis=1)
    nb = n // ray_block
    r = rays.reshape(8, nb, ray_block)
    o_lo = r[0:3].min(axis=2).T[:, None]  # (nb, 1, 3)
    o_hi = r[0:3].max(axis=2).T[:, None]
    d_lo = r[3:6].min(axis=2).T[:, None]
    d_hi = r[3:6].max(axis=2).T[:, None]
    t_hat = r[7].max(axis=1)[:, None, None]  # (nb, 1, 1)
    c_lo = cluster_lo[None]  # (1, nc, 3)
    c_hi = cluster_hi[None]

    pos = d_lo > 1e-12  # all-positive direction interval
    neg = d_hi < -1e-12
    mixed = ~(pos | neg)

    safe_hi = jnp.where(pos, d_hi, 1.0)
    safe_lo = jnp.where(pos, jnp.maximum(d_lo, 1e-12), 1.0)
    t_in_pos = (c_lo - o_hi) / safe_hi
    t_out_pos = (c_hi - o_lo) / safe_lo

    safe_lo_n = jnp.where(neg, d_lo, -1.0)
    safe_hi_n = jnp.where(neg, jnp.minimum(d_hi, -1e-12), -1.0)
    t_in_neg = (c_hi - o_lo) / safe_lo_n
    t_out_neg = (c_lo - o_hi) / safe_hi_n

    t_in = jnp.where(pos, t_in_pos, jnp.where(neg, t_in_neg, 0.0))
    t_out = jnp.where(pos, t_out_pos, jnp.where(neg, t_out_neg, jnp.inf))
    # mixed axes: constrain only by the static slab overlap with the
    # origin box extended by t̂·|D| in both directions
    reach_lo_m = o_lo + t_hat * jnp.minimum(d_lo, 0.0)
    reach_hi_m = o_hi + t_hat * jnp.maximum(d_hi, 0.0)
    slab_ok_m = (reach_lo_m <= c_hi) & (reach_hi_m >= c_lo)
    t_out = jnp.where(mixed & ~slab_ok_m, -jnp.inf, t_out)

    t_enter = jnp.maximum(t_in.max(axis=-1), 0.0)  # (nb, nc)
    t_exit = jnp.minimum(t_out.min(axis=-1), t_hat[..., 0])
    return jnp.where(t_enter <= t_exit, t_enter, _INF)


def _cull_t_enter_exact(rays, cluster_lo, cluster_hi, ray_block, init_t=None,
                        chunk_clusters: int = 16):
    """EXACT (ray-block × cluster) entry parameter.

    Replaces the interval-arithmetic bundle test (_cull_t_enter) for
    the sorted bounce path: te[b, c] = min over the block's rays of the
    ray's OWN slab entry into cluster c, where each ray is bounded by
    its OWN limit min(t_max, init_t)·slack — not the bundle's t̂. A
    cluster enters a block's visit list only if SOME ray individually
    reaches it, so fat-frustum conservatism disappears (measured ~3×
    fewer visits on 1080p bounce populations); the in-kernel horizon
    early-out and per-visit reach gate then operate on the same
    (smaller) list. Dead rays (t_max ≤ 0) have negative limits and
    never contribute. Chunked over clusters to bound the (n, K)
    intermediate at ~250 MB."""
    n = rays.shape[1]
    nb = n // ray_block
    o = rays[0:3]  # (3, n)
    d = rays[3:6]
    tiny = jnp.where(d >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)
    limit = rays[7]
    if init_t is not None:
        limit = jnp.minimum(limit, init_t)
    # same slack as the kernel's per-ray reach gate: the committed t
    # comes from the MXU's reduced-precision matmul
    limit = limit * 1.002 + 0.05
    nc = cluster_lo.shape[0]
    outs = []
    for c0 in range(0, nc, chunk_clusters):
        k = min(chunk_clusters, nc - c0)
        lo = cluster_lo[c0 : c0 + k].T  # (3, k)
        hi = cluster_hi[c0 : c0 + k].T
        t1 = (lo[:, None, :] - o[:, :, None]) * inv_d[:, :, None]
        t2 = (hi[:, None, :] - o[:, :, None]) * inv_d[:, :, None]
        tn = jnp.maximum(jnp.minimum(t1, t2).max(axis=0), 0.0)  # (n, k)
        tf = jnp.minimum(jnp.maximum(t1, t2).min(axis=0), limit[:, None])
        te = jnp.where(tn <= tf, tn, _INF)
        outs.append(te.reshape(nb, ray_block, k).min(axis=1))
    return jnp.concatenate(outs, axis=1)  # (nb, nc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_block", "chunk", "interpret", "resident", "max_visits",
        "start_visit", "simple", "group", "anyhit", "percull", "fastdiv",
        "subgate", "exact_cull", "target_cull", "compact", "node_clusters",
    ),
)
def intersect_woop_packed(
    rays, w, cluster_lo, cluster_hi,
    ray_block: int = 2048, chunk: int = CLUSTER_SIZE,
    interpret: bool = False, resident: bool | None = None,
    init=None, max_visits: int | None = None, start_visit: int = 0,
    simple: bool = False, group: int = 1, anyhit: bool = False,
    percull: bool = True, fastdiv: bool | None = None, subgate: int = 1,
    exact_cull: bool = False, target_cull: bool = False,
    compact: int = 0, node_clusters: int = 0,
):
    n = rays.shape[1]
    t = w.shape[0] // 3
    nb, nc = n // ray_block, t // chunk
    if resident is None:
        resident = t <= RESIDENT_MAX_TRIS
    if node_clusters > 1 and not (resident and nc > node_clusters):
        node_clusters = 0  # hierarchy only pays on resident many-cluster
    if fastdiv is None:
        # the approx-reciprocal epilogue is a TPU-only lowering win;
        # interpret/CPU paths keep the exact divide
        fastdiv = (not interpret) and jax.default_backend() == "tpu"
        if os.environ.get("MQ_WOOP_NOFASTDIV"):
            fastdiv = False
    if init is None:
        t0 = jnp.full((1, n), BIG, jnp.float32)
        i0 = jnp.full((1, n), -1, jnp.int32)
    else:
        t0, i0 = init
    if node_clusters > 1:
        # ---- interior-node mode (round 5): visit list at NODE level,
        # per-cluster descent in-kernel (_kernel_resident_nodes) ----
        assert 128 % node_clusters == 0, node_clusters
        P = node_clusters
        nn = -(-nc // P)
        pad_c = nn * P - nc
        lo_p = jnp.concatenate(
            [jnp.asarray(cluster_lo, jnp.float32),
             jnp.full((pad_c, 3), 3e37, jnp.float32)]
        ) if pad_c else jnp.asarray(cluster_lo, jnp.float32)
        hi_p = jnp.concatenate(
            [jnp.asarray(cluster_hi, jnp.float32),
             jnp.full((pad_c, 3), -3e37, jnp.float32)]
        ) if pad_c else jnp.asarray(cluster_hi, jnp.float32)
        node_lo = lo_p.reshape(nn, P, 3).min(axis=1)
        node_hi = hi_p.reshape(nn, P, 3).max(axis=1)
        if target_cull:
            te_n = _te_union(rays, node_lo, node_hi, ray_block,
                             interpret=interpret)
        else:
            te_n = _cull_t_enter(rays, node_lo, node_hi, ray_block)
        iota_n = jnp.broadcast_to(
            jnp.arange(nn, dtype=jnp.int32)[None, :], te_n.shape
        )
        te_s, order = jax.lax.sort([te_n, iota_n], num_keys=1, dimension=1)
        nn_pad = ((nn + 127) // 128) * 128
        te_s = jnp.pad(
            te_s, ((0, 0), (0, nn_pad - nn)), constant_values=np.inf
        )[:, None, :]
        order = jnp.pad(order, ((0, 0), (0, nn_pad - nn)))[:, None, :]
        nodeb_vals = jnp.concatenate(
            [node_lo.T, node_hi.T, jnp.zeros((2, nn), jnp.float32)],
            axis=0,
        )  # (8, nn)
        nodeb = jnp.take(nodeb_vals, order[:, 0, :], axis=1)
        nodeb = nodeb.transpose(1, 0, 2)  # (nb, 8, nn_pad)
        nc_pad = ((nc + 127) // 128) * 128
        cb_id = jnp.concatenate(
            [
                jnp.asarray(cluster_lo, jnp.float32).T,
                jnp.asarray(cluster_hi, jnp.float32).T,
                jnp.zeros((2, nc), jnp.float32),
            ],
            axis=0,
        )
        cb_id = jnp.pad(cb_id, ((0, 0), (0, nc_pad - nc)))[None]
        w_res = w.T.reshape(8, nc, 3 * chunk).transpose(1, 0, 2)
        out, idx = pl.pallas_call(
            functools.partial(
                _kernel_resident_nodes,
                nodes_per=P, nc=nc, simple=simple, anyhit=anyhit,
                fastdiv=fastdiv, compact=compact,
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, nn_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, nn_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, nn_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, nc_pad), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, 8, 3 * chunk), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
            interpret=interpret,
        )(order, te_s, nodeb, cb_id, rays, w_res, t0, i0)
        return out, idx
    if target_cull:
        # EXACT per-block union te from the Pallas cull kernel — the
        # rays must already be target-key-sorted (intersect_woop)
        te = _te_union(rays, cluster_lo, cluster_hi, ray_block,
                       interpret=interpret)
    elif exact_cull and not os.environ.get("MQ_NO_EXACT_CULL"):
        te = _cull_t_enter_exact(
            rays, cluster_lo, cluster_hi, ray_block,
            init_t=None if init is None else t0[0],
        )
    else:
        te = _cull_t_enter(rays, cluster_lo, cluster_hi, ray_block)
    if os.environ.get("MQ_WOOP_NOCULL"):
        # perf-anatomy knob: defeat culling so the sweep visits exactly
        # nb*nc tiles (gives an exact per-visit cost measurement)
        te = jnp.zeros_like(te)

    # PER-BLOCK near-to-far visit order: sort each block's te row
    # ascending, carrying the cluster id. The kernel walks this order
    # and exits at the first te beyond its horizon (exact early-out).
    iota = jnp.broadcast_to(
        jnp.arange(nc, dtype=jnp.int32)[None, :], te.shape
    )
    te_s, order = jax.lax.sort([te, iota], num_keys=1, dimension=1)
    nc_pad = ((nc + 127) // 128) * 128
    te_s = jnp.pad(
        te_s, ((0, 0), (0, nc_pad - nc)), constant_values=np.inf
    )
    order = jnp.pad(order, ((0, 0), (0, nc_pad - nc)))
    # (nb, 1, nc_pad): trailing block dims equal the array dims, which
    # satisfies the TPU (8, 128) block-divisibility rule for any nb
    te_s = te_s[:, None, :]
    order = order[:, None, :]

    common = dict(
        grid=(nb,),
        out_specs=[
            pl.BlockSpec(
                (1, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )
    # per-visit scalar metadata rides in SMEM (scalar loads in-kernel)
    spec_order = pl.BlockSpec(
        (1, 1, nc_pad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    spec_te = pl.BlockSpec(
        (1, 1, nc_pad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    spec_rays = pl.BlockSpec(
        (8, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    spec_init = pl.BlockSpec(
        (1, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    if resident:
        # whole table VMEM-resident: (nc, 8, 3C), constant index map →
        # copied in once and reused by every grid step
        w_res = w.T.reshape(8, nc, 3 * chunk).transpose(1, 0, 2)
        # per-block VISIT-ORDERED cluster bounds (rows: lo.xyz, hi.xyz,
        # 0, 0) for the in-kernel per-ray reachability gate
        cb_vals = jnp.concatenate(
            [
                jnp.asarray(cluster_lo, jnp.float32).T,
                jnp.asarray(cluster_hi, jnp.float32).T,
                jnp.zeros((2, nc), jnp.float32),
            ],
            axis=0,
        )  # (8, nc)
        cb = jnp.take(cb_vals, order[:, 0, :], axis=1)  # (8, nb, nc_pad)
        cb = cb.transpose(1, 0, 2)  # (nb, 8, nc_pad)
        spec_cb = pl.BlockSpec(
            (1, 8, nc_pad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        out, idx = pl.pallas_call(
            functools.partial(
                _kernel_resident,
                max_visits=max_visits, start_visit=start_visit,
                simple=simple, group=group, anyhit=anyhit, percull=percull,
                fastdiv=fastdiv, subgate=subgate, compact=compact,
            ),
            in_specs=[
                spec_order, spec_te, spec_cb, spec_rays,
                pl.BlockSpec(
                    (nc, 8, 3 * chunk), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                spec_init, spec_init,
            ],
            **common,
        )(order, te_s, cb, rays, w_res, t0, i0)
        return out, idx
    # per-block VISIT-ORDERED cluster bounds for the in-kernel gate
    cb_vals = jnp.concatenate(
        [
            jnp.asarray(cluster_lo, jnp.float32).T,
            jnp.asarray(cluster_hi, jnp.float32).T,
            jnp.zeros((2, nc), jnp.float32),
        ],
        axis=0,
    )  # (8, nc)
    cb = jnp.take(cb_vals, order[:, 0, :], axis=1)  # (8, nb, nc_pad)
    cb = cb.transpose(1, 0, 2)  # (nb, 8, nc_pad)
    spec_cb = pl.BlockSpec(
        (1, 8, nc_pad), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    n_slots = 8  # ring slots: depth-7 software pipeline hides DMA latency
    # each cluster's streamed block is padded on the lane axis to a
    # 128-multiple: manual DMA slices must be tile-aligned (Mosaic
    # rejects the raw 3C = 192 slice that CLUSTER_SIZE = 64 produces)
    c3 = 3 * chunk
    c3p = ((c3 + 127) // 128) * 128
    wt = w.T  # (8, 3T)
    if c3p != c3:
        wt = jnp.pad(
            wt.reshape(8, nc, c3), ((0, 0), (0, 0), (0, c3p - c3))
        ).reshape(8, nc * c3p)
    out, idx = pl.pallas_call(
        functools.partial(
            _kernel_stream,
            chunk=chunk, max_visits=max_visits, start_visit=start_visit,
            simple=simple, anyhit=anyhit, fastdiv=fastdiv,
        ),
        in_specs=[
            spec_order, spec_te, spec_cb, spec_rays,
            pl.BlockSpec(memory_space=pl.ANY),  # w stays in HBM
            spec_init, spec_init,
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 8, c3p), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SMEM((n_slots,), jnp.int32),
        ],
        **common,
    )(order, te_s, cb, rays, wt, t0, i0)
    return out, idx


def _sweep_parts(
    rays, w, cluster_lo, cluster_hi, kw, init=None, anyhit=False,
):
    """Partitioned RESIDENT sweep for tables too large for VMEM.

    Round-5 replacement for the per-visit HBM→VMEM streaming path
    (docs/perf_notes_r4.md measured it ~4 µs/visit, pure DMA latency):
    the cluster table is split into parts of ≤ RESIDENT_MAX_TRIS
    triangles, and each part runs the RESIDENT kernel — its (nc_p, 8,
    3C) Woop slab rides the pallas pipeline's constant index map, so
    the whole part is copied HBM→VMEM ONCE per sweep (a few MB) instead
    of once per (ray-block, cluster) visit (tens of GB at map scale).
    Parts chain through the per-ray best-t: part p+1 starts with part
    p's committed t as its init, so its horizon/reach gates already
    exclude everything the earlier parts resolved. Exact: min over
    parts = global min; the winner index is taken from the LAST part
    that strictly improved the ray's t (the kernel only overwrites on
    strict improvement, so "out < t_prev ⇔ this part won" holds).
    """
    nc = cluster_lo.shape[0]
    chunk = kw["chunk"]
    ncp = max(1, _part_tris() // chunk)
    kw = dict(kw)
    kw["resident"] = True
    n_pad = rays.shape[1]
    t_cur = None
    idx_cur = None
    if init is not None:
        t_cur, idx_cur = init
    for c0 in range(0, nc, ncp):
        k = min(ncp, nc - c0)
        w_p = w[3 * chunk * c0 : 3 * chunk * (c0 + k)]
        init_p = (
            None
            if t_cur is None
            else (t_cur, jnp.full((1, n_pad), -1, jnp.int32))
        )
        out, idx = intersect_woop_packed(
            rays, w_p, cluster_lo[c0 : c0 + k], cluster_hi[c0 : c0 + k],
            init=init_p, anyhit=anyhit, **kw,
        )
        if anyhit:
            t_cur = out
            idx_cur = idx
            continue
        glob = jnp.where(idx >= 0, idx + c0 * chunk, idx)
        idx_cur = glob if idx_cur is None else jnp.where(
            idx >= 0, glob, idx_cur
        )
        t_cur = out
    return t_cur, idx_cur


def _sort_keys(accel, o, d):
    """Bounce-ray binning key: direction octant + dominant-axis pair
    (high bits, so every sorted block has sign-consistent directions
    with a shared dominant axis — measured ~25% fewer cluster visits
    per block than octant alone at small blocks) then origin Morton
    code (locality)."""
    lo = accel.world_lo
    ext = jnp.maximum(accel.world_hi - lo, 1e-3)
    q = jnp.clip((o - lo) / ext * 255.0, 0.0, 255.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    ad = jnp.abs(d)
    fine = (
        (ad[:, 0] > ad[:, 2]).astype(jnp.uint32)
        | ((ad[:, 1] > ad[:, 2]).astype(jnp.uint32) << 1)
    )
    return (
        (octant << jnp.uint32(26))
        | (fine << jnp.uint32(24))
        | (morton & jnp.uint32(0xFFFFFF))
    )


def _recompute_tuv(accel, o, d, t_approx, tri):
    """Exact (t, u, v) at the committed hit, from the winning triangle's
    vertices — O(rays) instead of tracking per-tile winners through the
    sweep (the kernel's t carries the winner row in its low mantissa
    bits, so it is ≤2^-16-relative coarse; this replaces it exactly)."""
    vattr = jnp.take(accel.tri_attr[:, 0:9], jnp.maximum(tri, 0), axis=0)
    v0, v1, v2 = vattr[:, 0:3], vattr[:, 3:6], vattr[:, 6:9]
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = jnp.cross(e1, e2)
    dn = jnp.sum(d * nrm, axis=-1)
    t = jnp.sum((v0 - o) * nrm, axis=-1) / jnp.where(
        jnp.abs(dn) > 1e-20, dn, 1.0
    )
    p = o + t[:, None] * d
    q = p - v0
    d00 = jnp.sum(e1 * e1, axis=-1)
    d01 = jnp.sum(e1 * e2, axis=-1)
    d11 = jnp.sum(e2 * e2, axis=-1)
    d20 = jnp.sum(q * e1, axis=-1)
    d21 = jnp.sum(q * e2, axis=-1)
    denom = d00 * d11 - d01 * d01
    inv = 1.0 / jnp.where(jnp.abs(denom) > 1e-18, denom, 1.0)
    u = (d11 * d20 - d01 * d21) * inv
    v = (d00 * d21 - d01 * d20) * inv
    hit = tri >= 0
    return (
        jnp.where(hit, t, t_approx),
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
    )


def _world_exit_clamp(accel, o, d, t_max_b):
    """Clamp per-ray t_max to the world-AABB exit parameter.

    Any hit lies inside the scene box, so t_exit bounds it EXACTLY —
    but the sweep's horizon logic doesn't know that: a single sky ray
    (no hit) otherwise holds its whole block's horizon at T_MAX and
    forces the sweep through every cluster along the bundle. With the
    clamp, sky-heavy blocks exit after the clusters before their rays
    LEAVE the scene (outdoor bounce populations: most of the sweep).
    The small slack absorbs f32 slab rounding; geometry ON the box
    surface (sky quads) stays inside the clamped range.
    """
    lo = jnp.asarray(accel.world_lo)
    hi = jnp.asarray(accel.world_hi)
    tiny = jnp.where(d >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)
    t1 = (lo[None, :] - o) * inv_d
    t2 = (hi[None, :] - o) * inv_d
    t_exit = jnp.maximum(t1, t2).min(axis=1)
    # origins outside the box (shouldn't happen) keep their t_max
    t_exit = jnp.where(t_exit > 0.0, t_exit * 1.001 + 0.1, jnp.float32(BIG))
    return jnp.minimum(t_max_b, t_exit)


def _pack_rays(o, d, t_min_b, t_max_b, ray_block):
    """(8, n_padded) ray matrix for intersect_woop_packed."""
    n = o.shape[0]
    pad = (-n) % ray_block
    o_p, d_p = o, d
    if pad:
        o_p = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d_p = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min_b = jnp.concatenate([t_min_b, jnp.zeros((pad,))])
        t_max_b = jnp.concatenate([t_max_b, jnp.full((pad,), -1.0)])
    return jnp.concatenate(
        [o_p.T, d_p.T, t_min_b[None], t_max_b[None]], axis=0
    )


def intersect_woop(
    accel, o, d, t_min, t_max, ray_block=4096, interpret=False,
    sort_rays=False, resident=None, chunk=None, phase1_visits=0,
    fine=None, simple=None, group=None, init_t=None, subgate=None,
    exact_cull=None, world_clamp=True, target_cull=False, compact=None,
    node_clusters=None,
):
    """HitRecord-compatible Woop-kernel intersection. Requires the accel
    to carry `woop_w` (see build_accel). ``sort_rays`` bins incoherent
    (bounce) rays for packet coherence: with a proxy table present the
    bin key is the PROXY-PREDICTED HIT ENDPOINT + direction (see
    _endpoint_sort_keys) and the main sweep is warm-started with the
    proxy's per-ray nearest-t upper bound; otherwise direction octant +
    origin Morton. Sorts/permutes are ~free on TPU relative to a trace.

    ``init_t``: optional per-ray ALREADY-INFLATED upper bound on the
    committed t (internal: carried through the sorted path's recursion).

    ``phase1_visits`` > 0 runs the sweep in TWO rounds: round 1 visits
    only each block's first K nearest clusters, round 2 resumes at K
    warm-started with round-1 hits (exact same results — min is
    idempotent, te ascending). MEASURED A WASH on one trace (the
    dynamic horizon already prunes identically), so it is off by
    default; the warm-start/max_visits plumbing it rides on is used to
    resume sweeps across separate calls."""
    from .intersect import HitRecord

    n = o.shape[0]
    if os.environ.get("MQ_WOOP_RB"):
        # perf-anatomy knob: override the ray-block size
        ray_block = int(os.environ["MQ_WOOP_RB"])
    if os.environ.get("MQ_TRACE_NOSORT"):
        # perf-anatomy knob: skip the coherence sort entirely
        sort_rays = False
    if simple is None:
        # a static ZERO t_min compiles the lean epilogue (the strict
        # z0n > 0 replaces the t_min compare and the hit conjunction
        # folds into one min-tree; see _intersect_tile). t_max is read
        # per-ray either way, so traced t_max (masked dead paths) still
        # qualifies; only the alpha re-trace's traced t_min stays
        # general.
        simple = isinstance(t_min, (int, float)) and float(t_min) == 0.0
    if subgate is None:
        subgate = int(os.environ.get("MQ_WOOP_SUBGATE", "1"))
    if compact is None:
        # compacted visits (MXU one-hot gather of reaching rays, see
        # _intersect_tile_compact); 0 disables
        compact = int(os.environ.get("MQ_WOOP_COMPACT", "0"))
    if node_clusters is None:
        # interior node level over the clusters (round 5, VERDICT r4
        # #1). CHIP-MEASURED A LOSS on sorted bounce populations at
        # BOTH scales (headline 335 -> 511 ms, map-part 1677 -> 2091 ms,
        # docs/perf_notes_r5.md): with target/octant-sorted blocks the
        # reachable node set is dense, so the node gate is overhead and
        # the in-node descent loses the flat sweep's per-cluster
        # near-to-far order + horizon exit granularity. Default OFF;
        # kept (exactness-tested) for sparse/incoherent workloads.
        node_clusters = int(os.environ.get("MQ_NODE_CLUSTERS", "0"))
    if group is None:
        # grouped visits amortize the while-loop's fixed scalar cost
        # over G tiles, at G-coarse exit granularity — measured a wash
        # to a small LOSS at ray_block ≥ 1024 on chip, so default off;
        # the plumbing stays for small-block experiments
        group = 1
    if (
        fine is None
        and not sort_rays
        and getattr(accel, "woop_w_fine", None) is not None
        and os.environ.get("MQ_FINE_PRIMARY")
    ):
        # round-5 re-measure (scripts/gbuffer_anatomy_r5.py, chip):
        # coherent primary packets on the COARSE table now beat the
        # fine table (125.4 vs 149.8 ms at 1080p/17k tris) — the
        # round-2 fine-table win predates the per-visit reach gates +
        # SMEM metadata rework, which closed the culling gap while the
        # fine table still pays 4x the visit fixed costs. Opt-in via
        # MQ_FINE_PRIMARY (or fine=True) for re-measurement.
        fine = True
    if fine and getattr(accel, "woop_w_fine", None) is not None:
        accel = accel._replace(
            woop_w=accel.woop_w_fine,
            cluster_lo=accel.cluster_lo_fine,
            cluster_hi=accel.cluster_hi_fine,
        )
        ray_block = min(ray_block, 1024)
        fine = False  # resolved; recursive sorted path keeps the swap
    if chunk is None:
        # the packing granularity is whatever the table was built with
        chunk = (accel.woop_w.shape[0] // 3) // accel.cluster_lo.shape[0]
    # keep scalar bounds scalar through the sort (no permute needed)
    t_min_s = jnp.asarray(t_min, jnp.float32)
    t_max_s = jnp.asarray(t_max, jnp.float32)
    if world_clamp and os.environ.get("MQ_WORLD_CLAMP"):
        # per-ray world-exit clamp (see _world_exit_clamp); exact, but
        # measured a small LOSS on chip (1146 vs 1134 ms): Quake-style
        # scenes enclose the view with sky GEOMETRY, so rays always
        # commit a finite best_t and the horizon is never held at T_MAX
        # — the clamp only pays its per-ray cost + the extra sort
        # operand. Opt-in for open/unenclosed scenes.
        t_max_s = _world_exit_clamp(
            accel, o, d, jnp.broadcast_to(t_max_s, (n,))
        )
    t_all = accel.woop_w.shape[0] // 3
    # target-key scheduling (round 3): bounce rays are sorted by their
    # TOP-3 nearest reachable clusters (Pallas per-ray cull) instead of
    # direction-octant + origin Morton, and the packet sweep's visit
    # lists come from the EXACT per-block union te (_kernel_te_union).
    # Rays grouped by the clusters they actually need collapse the
    # block unions (~7-14x tighter on city bounce populations).
    use_target_key = (
        sort_rays
        and n >= ray_block
        and t_all <= RESIDENT_MAX_TRIS
        and accel.cluster_lo.shape[0] <= 256
        and bool(os.environ.get("MQ_TARGET_KEY"))
    )
    if sort_rays and n >= ray_block:
        # permutes are done by CARRYING the data through lax.sort, not
        # by argsort + take: an n-row gather serializes on TPU
        # (~27 ns/row) while one extra sort operand is ~free. Forward:
        # sort by the coherence key carrying (o, d, bounds, iota);
        # backward: sort by the carried iota carrying the hit record.
        # NOTE on proxy warm-starting this path (tried, reverted): a
        # pre-sweep of the largest-triangle table gives valid per-ray
        # nearest-t bounds, but (a) binning by predicted ENDPOINT
        # spreads ray ORIGINS across the map, collapsing the packet
        # frustum cull (measured 2.5x SLOWER), and (b) with origin-
        # binned blocks the per-ray bounds cannot shrink the block's
        # reachable-cluster union, so the sweep does the same visits
        # (measured a wash minus the proxy cost). The proxy table IS
        # used by the any-hit path, where per-ray short-circuiting
        # needs no block cooperation.
        if use_target_key:
            t_max_b0 = jnp.broadcast_to(t_max_s, (n,))
            rays_tmp = _pack_rays(
                o, d, jnp.zeros((n,)), t_max_b0, ray_block
            )
            key = _target_keys(
                rays_tmp, accel.cluster_lo, accel.cluster_hi,
                ray_block, interpret=interpret,
            )[:n].astype(jnp.uint32)
            # coarse Morton tail keeps same-target rays spatially packed
            morton6 = (_sort_keys(accel, o, d) & jnp.uint32(0xFFFFFF)) >> 18
            key = key | morton6
            if t_max_s.ndim:
                key = key | ((t_max_s <= 0.0).astype(jnp.uint32) << 30)
        else:
            key = _sort_keys(accel, o, d)
            if t_max_s.ndim:
                # masked (dead-path) rays, t_max ≤ 0: a high key bit
                # packs them into dedicated trailing blocks whose
                # horizon starts negative — the sweep loop never takes
                # an iteration there
                key = key | ((t_max_s <= 0.0).astype(jnp.uint32) << 29)
        key = key.astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        ops = [key, iota, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
               d[:, 2]]
        nb = 8
        if t_min_s.ndim:
            ops.append(t_min_s)
        if t_max_s.ndim:
            ops.append(t_max_s)
        if init_t is not None:
            ops.append(init_t)
        out = jax.lax.sort(ops, num_keys=1)
        pos = out[1]
        o_s = jnp.stack(out[2:5], axis=1)
        d_s = jnp.stack(out[5:8], axis=1)
        if t_min_s.ndim:
            t_min_s = out[nb]
            nb += 1
        if t_max_s.ndim:
            t_max_s = out[nb]
            nb += 1
        init_t_s = out[nb] if init_t is not None else None
        hr = intersect_woop(
            accel, o_s, d_s, t_min_s, t_max_s, ray_block=ray_block,
            interpret=interpret, sort_rays=False, resident=resident,
            chunk=chunk, phase1_visits=phase1_visits, fine=False,
            simple=simple, group=group, init_t=init_t_s, subgate=subgate,
            world_clamp=False, target_cull=use_target_key, compact=compact,
            node_clusters=node_clusters,
            # exact per-ray union cull: measured a net LOSS on chip
            # (the (N, nc) slab traffic outweighs the gated visits it
            # removes — the per-visit reach gate already skips their
            # tiles); opt-in for small-nc experiments
            exact_cull=bool(os.environ.get("MQ_EXACT_CULL"))
            if exact_cull is None else exact_cull,
        )
        # un-sort: sort by original position carrying the results. tri
        # must NOT ride bit-cast in an f32 lane: TPU canonicalizes NaN
        # payloads and flushes denormal bit patterns even through pure
        # copies, corrupting small/negative indices.
        back = jax.lax.sort(
            [pos, hr.t, hr.u, hr.v, hr.tri], num_keys=1
        )
        return HitRecord(t=back[1], tri=back[4], u=back[2], v=back[3])
    t_min_b = jnp.broadcast_to(t_min_s, (n,))
    t_max_b = jnp.broadcast_to(t_max_s, (n,))
    rays = _pack_rays(o, d, t_min_b, t_max_b, ray_block)
    kw = dict(
        ray_block=ray_block, chunk=chunk, interpret=interpret,
        resident=resident, simple=simple, group=group, subgate=subgate,
        exact_cull=bool(exact_cull), target_cull=bool(target_cull),
        compact=int(compact or 0), node_clusters=int(node_clusters or 0),
    )
    t = accel.woop_w.shape[0] // 3
    init = None
    if init_t is not None:
        pad = (-n) % ray_block
        t0v = init_t
        if pad:
            t0v = jnp.concatenate([t0v, jnp.full((pad,), BIG)])
        init = (t0v[None], jnp.full((1, rays.shape[1]), -1, jnp.int32))
    if (
        resident is None
        and t > _part_tris()
        and not os.environ.get("MQ_NO_PART_RESIDENT")
    ):
        out, idx = _sweep_parts(
            rays, accel.woop_w, accel.cluster_lo, accel.cluster_hi,
            kw, init=init,
        )
    elif phase1_visits and t // chunk > 2 * phase1_visits:
        init = intersect_woop_packed(
            rays, accel.woop_w, accel.cluster_lo, accel.cluster_hi,
            max_visits=phase1_visits, init=init, **kw,
        )
        out, idx = intersect_woop_packed(
            rays, accel.woop_w, accel.cluster_lo, accel.cluster_hi,
            init=init, start_visit=phase1_visits, **kw,
        )
    else:
        out, idx = intersect_woop_packed(
            rays, accel.woop_w,
            accel.cluster_lo, accel.cluster_hi, init=init, **kw,
        )
    t, tri = out[0, :n], idx[0, :n]
    t, u, v = _recompute_tuv(accel, o, d, t, tri)
    return HitRecord(t=t, tri=tri, u=u, v=v)


def intersect_woop_any(
    accel, o, d, t_min, t_max, ray_block=4096, interpret=False,
    sort_rays=False, resident=None, chunk=None,
):
    """Occlusion-only (any-hit) sweep: bool[n] `occluded`.

    The TPU replacement for the reference's visibility ray queries
    (restir_di.glsl / raytrace.glsl occlusion paths): no divide, no
    argmin, no winner bookkeeping in the epilogue, and an occluded ray
    collapses its horizon contribution to 0, so a fully occluded block
    exits after its first hit cluster. Uses ``accel.woop_w_shadow``
    (sky + alpha-tested triangles zeroed — sky passes light by the
    reference's convention, raytrace.glsl:122-145; alpha triangles are
    resolved exactly by the caller on a separate alpha-only table) and
    falls back to the full table when absent. ``t_min`` must be a
    positive scalar offset (shadow-ray epsilon).
    """
    w = getattr(accel, "woop_w_shadow", None)
    if w is None:
        w = accel.woop_w
    n = o.shape[0]
    if chunk is None:
        chunk = (w.shape[0] // 3) // accel.cluster_lo.shape[0]
    t_max_s = jnp.asarray(t_max, jnp.float32)
    if sort_rays and n >= ray_block:
        key = _sort_keys(accel, o, d).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        ops = [key, iota, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
               d[:, 2]]
        if t_max_s.ndim:
            ops.append(t_max_s)
        out = jax.lax.sort(ops, num_keys=1)
        pos = out[1]
        o_s = jnp.stack(out[2:5], axis=1)
        d_s = jnp.stack(out[5:8], axis=1)
        t_max_in = out[8] if t_max_s.ndim else t_max_s
        occ = intersect_woop_any(
            accel, o_s, d_s, t_min, t_max_in, ray_block=ray_block,
            interpret=interpret, sort_rays=False, resident=resident,
            chunk=chunk,
        )
        back = jax.lax.sort([pos, occ.astype(jnp.float32)], num_keys=1)
        return back[1] > 0.5
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_b = jnp.broadcast_to(t_max_s, (n,))
    pad = (-n) % ray_block
    o_p, d_p = o, d
    if pad:
        o_p = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d_p = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min_b = jnp.concatenate([t_min_b, jnp.zeros((pad,))])
        t_max_b = jnp.concatenate([t_max_b, jnp.full((pad,), -1.0)])
    rays = jnp.concatenate(
        [o_p.T, d_p.T, t_min_b[None], t_max_b[None]], axis=0
    )
    init = None
    if getattr(accel, "woop_w_proxy", None) is not None:
        # proxy pre-pass (valid here too: proxy triangles are opaque
        # non-sky — genuine occluders). Rays it occludes start phase 2
        # with best_t = 0, so their tiles are all reach-gated off.
        pt, _ = intersect_woop_packed(
            rays, accel.woop_w_proxy, accel.cluster_lo_proxy,
            accel.cluster_hi_proxy, ray_block=ray_block,
            chunk=CLUSTER_SIZE, interpret=interpret, resident=True,
            anyhit=True,
        )
        init = (pt, jnp.full((1, rays.shape[1]), -1, jnp.int32))
    if (
        resident is None
        and w.shape[0] // 3 > _part_tris()
        and not os.environ.get("MQ_NO_PART_RESIDENT")
    ):
        out, _ = _sweep_parts(
            rays, w, accel.cluster_lo, accel.cluster_hi,
            dict(ray_block=ray_block, chunk=chunk, interpret=interpret,
                 node_clusters=int(
                     os.environ.get("MQ_NODE_CLUSTERS", "0"))),
            init=init, anyhit=True,
        )
    else:
        out, _ = intersect_woop_packed(
            rays, w, accel.cluster_lo, accel.cluster_hi,
            ray_block=ray_block, chunk=chunk, interpret=interpret,
            resident=resident, anyhit=True, init=init,
            node_clusters=int(os.environ.get("MQ_NODE_CLUSTERS", "0")),
        )
    return out[0, :n] == 0.0
