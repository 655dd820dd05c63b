"""Wavefront regrouping traversal: per-ray exact cluster scheduling.

The packet sweep (woop.py) visits, per 2048-ray block, the UNION of the
clusters its rays can reach — measured ~34 visits/block on 1080p bounce
populations where an individual ray only needs ~2-4 clusters: ~90% of
the (cluster × ray) pair tests are packet-union waste. This module
replaces the per-block frustum heuristics with exact per-ray
scheduling, the TPU analogue of a wavefront ray scheduler:

  round r:
    1. every live ray picks its NEXT cluster: the (te, c)-lexicographic
       minimum over clusters whose conservative slab entry te lies
       beyond the ray's progress cursor and below its pruning limit
       min(best_t, t_max)·slack — an exact bound: a hit inside a
       cluster can't precede the ray's own slab entry;
    2. rays sort by target cluster (data carried through lax.sort —
       random gathers serialize on TPU, extra sort operands are ~1.2 ms
       each at 8M rows);
    3. one Pallas sweep: per 2048-ray block, the (block, cluster) runs
       of the sorted order — typically 1-2 per block instead of 34 —
       each as one MXU tile. Rays tested against a neighbor's cluster
       (same block) take a free extra test; min-update keeps it exact.
  Rays whose next-entry exceeds their limit go dead (sentinel key) and
  sort to the back, where blocks have zero visits.

After ``rounds`` sorted rounds (most rays finish in 1-2), the few
stragglers are finished by the legacy packet sweep warm-started with
the rounds' best_t — exactness never depends on the round budget.

This is scheduling only: the per-tile math is woop._intersect_tile
verbatim, and the committed winner's exact t/u/v are recomputed per ray
by the caller (woop._recompute_tuv), matching the reference's
raytrace.glsl:69-119 semantics at packet-sweep throughput.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .woop import BIG, _intersect_tile, intersect_woop_packed

_INF = jnp.float32(np.inf)


def _inv_dir(d):
    """Safe per-axis reciprocal direction (same clamp as woop.percull)."""
    tiny = jnp.where(d >= 0.0, jnp.float32(1e-20), jnp.float32(-1e-20))
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)


def _next_target(o, inv_d, limit, tp_te, tp_c, cl_lo, cl_hi):
    """Per-ray lexicographic-next cluster: min (te_c, c) > (tp_te, tp_c)
    with te_c ≤ limit. Returns (te, c) — c = nc when no candidate.

    te_c is the exact slab entry parameter of THIS ray into cluster c's
    AABB (clamped to ≥ 0), so pruning on it is exact per ray — no
    packet frustum conservatism."""
    nc = cl_lo.shape[0]
    n = o.shape[0]

    def body(c, carry):
        bte, bc = carry
        lo = jax.lax.dynamic_slice_in_dim(cl_lo, c, 1, 0)[0]
        hi = jax.lax.dynamic_slice_in_dim(cl_hi, c, 1, 0)[0]
        t1 = (lo[None, :] - o) * inv_d
        t2 = (hi[None, :] - o) * inv_d
        tn = jnp.maximum(jnp.minimum(t1, t2).max(axis=1), 0.0)
        tf = jnp.minimum(jnp.maximum(t1, t2).min(axis=1), limit)
        te = jnp.where(tn <= tf, tn, _INF)
        after = (te > tp_te) | ((te == tp_te) & (c > tp_c))
        better = after & (te < bte)
        return jnp.where(better, te, bte), jnp.where(better, c, bc)

    bte, bc = jax.lax.fori_loop(
        0, nc, body, (jnp.full((n,), _INF), jnp.full((n,), nc, jnp.int32))
    )
    return bte, bc


def _kernel_grouped(
    starts_ref, counts_ref, vcid_ref, rays_ref, w_ref, t0_ref, i0_ref,
    out_ref, idx_ref, *, simple, fastdiv,
):
    """One grid step per ray block: sweep the block's visit-list runs.

    No horizon/te logic in-kernel — scheduling is already exact per ray
    on the XLA side; the kernel just executes (cluster, block) tiles."""
    i = pl.program_id(0)
    out_ref[0, :] = t0_ref[0, :]
    idx_ref[0, :] = i0_ref[0, :]
    start = starts_ref[0, i]
    count = counts_ref[0, i]

    def cond(v):
        return v < count

    def body(v):
        cid = vcid_ref[0, start + v]
        _intersect_tile(
            rays_ref, w_ref[cid], out_ref, idx_ref, cid,
            simple=simple, fastdiv=fastdiv,
        )
        return v + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _build_visits(key_s, nc, ray_block, cap):
    """(starts, counts, vcid) visit lists from block-sorted keys.

    A visit is a maximal run of equal live keys within one ray block:
    runs ≤ nb + nc (keys globally ascending), so ``cap`` = nb + nc + pad
    is exact, not a truncation."""
    n = key_s.shape[0]
    nb = n // ray_block
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), key_s[:-1]])
    live = key_s < nc
    head = live & ((key_s != prev) | (iota % ray_block == 0))
    pos = jnp.where(head, iota, jnp.int32(n))
    pos_s = jax.lax.sort([pos], num_keys=1)[0][:cap]
    valid = pos_s < n
    vcid = jnp.where(
        valid, jnp.take(key_s, jnp.where(valid, pos_s, 0)), 0
    ).astype(jnp.int32)
    head_cum = jnp.cumsum(head.astype(jnp.int32))
    ends = head_cum[ray_block - 1 :: ray_block]  # inclusive cum at block end
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    counts = ends - starts
    return starts, counts, vcid


@functools.partial(
    jax.jit,
    static_argnames=("ray_block", "chunk", "interpret", "rounds", "simple",
                     "fastdiv"),
)
def intersect_grouped(
    rays, w, cluster_lo, cluster_hi,
    ray_block: int = 2048, chunk: int = 128, interpret: bool = False,
    rounds: int = 3, init=None, simple: bool = True, fastdiv: bool = True,
):
    """Full exact intersection: grouped rounds + legacy straggler finish.

    ``rays``: (8, N) packed woop layout (o3, d3, t_min, t_max).
    ``w``: (3T, 8) packed table; the resident (nc, 8, 3C) layout is
    derived here (a cheap device transpose, fused by XLA). Returns
    (t[1, N], tri[1, N]) like intersect_woop_packed, in the original
    ray order."""
    if init is None:
        t0 = jnp.full((1, rays.shape[1]), BIG, jnp.float32)
        i0 = jnp.full((1, rays.shape[1]), -1, jnp.int32)
    else:
        t0, i0 = init
    n = rays.shape[1]
    nc = cluster_lo.shape[0]
    w_res = w.T.reshape(8, nc, 3 * chunk).transpose(1, 0, 2)
    nb = n // ray_block
    cap = ((nb + nc + 128) + 127) // 128 * 128
    nb_pad = (nb + 127) // 128 * 128

    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    tmn, tmx = rays[6], rays[7]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    best = t0[0]
    tri = i0[0]

    def limit_of(best, tmx):
        # slack absorbs the MXU-reduced-precision committed t (same
        # margin as woop.percull's reach gate)
        return jnp.minimum(best, tmx) * 1.002 + 0.05

    def targets(ox, oy, oz, dx, dy, dz, best, tmx, tp_te, tp_c):
        o = jnp.stack([ox, oy, oz], axis=1)
        inv_d = _inv_dir(jnp.stack([dx, dy, dz], axis=1))
        return _next_target(
            o, inv_d, limit_of(best, tmx), tp_te, tp_c, cluster_lo,
            cluster_hi,
        )

    te, key = targets(
        ox, oy, oz, dx, dy, dz, best, tmx,
        jnp.full((n,), -1.0), jnp.full((n,), -1, jnp.int32),
    )

    def round_body(r, carry):
        (key, te, ox, oy, oz, dx, dy, dz, tmn, tmx, iota, best, tri) = carry
        out = jax.lax.sort(
            [key, te, ox, oy, oz, dx, dy, dz, tmn, tmx,
             iota, best, tri],
            num_keys=1,
        )
        (key, te, ox, oy, oz, dx, dy, dz, tmn, tmx, iota, best, tri) = out
        starts, counts, vcid = _build_visits(key, nc, ray_block, cap)
        starts = jnp.pad(starts, (0, nb_pad - nb))[None]
        counts = jnp.pad(counts, (0, nb_pad - nb))[None]
        vcid = vcid[None]
        rays_s = jnp.stack([ox, oy, oz, dx, dy, dz, tmn, tmx], axis=0)

        spec_init = pl.BlockSpec(
            (1, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_t, out_i = pl.pallas_call(
            functools.partial(
                _kernel_grouped, simple=simple, fastdiv=fastdiv
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, nb_pad), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nb_pad), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, cap), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, ray_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, 8, 3 * chunk), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                spec_init, spec_init,
            ],
            out_specs=[spec_init, spec_init],
            out_shape=[
                jax.ShapeDtypeStruct((1, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
            interpret=interpret,
        )(starts, counts, vcid, rays_s, w_res, best[None], tri[None])
        best, tri = out_t[0], out_i[0]

        te2, key2 = targets(ox, oy, oz, dx, dy, dz, best, tmx, te, key)
        return (key2, te2, ox, oy, oz, dx, dy, dz, tmn, tmx, iota, best,
                tri)

    carry = (key, te, ox, oy, oz, dx, dy, dz, tmn, tmx, iota, best, tri)
    # fori with early-exit semantics via all-dead rounds being ~free
    # (every block's visit count is 0) — a while_loop would re-check
    # any(live) host-side anyway; rounds is small and static.
    carry = jax.lax.fori_loop(0, rounds, round_body, carry)
    (key, te, ox, oy, oz, dx, dy, dz, tmn, tmx, iota, best, tri) = carry

    # ---- straggler finish, in the LAST ROUND'S order (stragglers are
    # grouped by their last target cluster — coherent blocks; finished
    # rays mask to t_max = -1 and form zero-visit blocks). Skipped
    # entirely (lax.cond) when every ray is done. ----
    need = key < nc

    def finish(args):
        ox, oy, oz, dx, dy, dz, tmn, tmx, best, tri = args
        rays_f = jnp.stack(
            [ox, oy, oz, dx, dy, dz, tmn,
             jnp.where(need, tmx, -1.0)],
            axis=0,
        )
        ft, fi = intersect_woop_packed(
            rays_f, w, cluster_lo, cluster_hi,
            ray_block=ray_block, chunk=chunk, interpret=interpret,
            resident=True, simple=simple,
            init=(jnp.where(need, best, BIG)[None],
                  jnp.where(need, tri, -1)[None]),
        )
        return (jnp.where(need, ft[0], best),
                jnp.where(need, fi[0], tri))

    best, tri = jax.lax.cond(
        jnp.any(need),
        finish,
        lambda args: (args[8], args[9]),
        (ox, oy, oz, dx, dy, dz, tmn, tmx, best, tri),
    )

    # original-order restore
    back = jax.lax.sort([iota, best, tri], num_keys=1)
    return back[1][None], back[2][None]
