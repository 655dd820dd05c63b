"""Woop unit-triangle intersection: precompute + Pallas MXU kernel.

Each triangle stores the affine map M = [e1 e2 n]^-1, b = -M·v0 that
takes world points to (u, v, signed-dist) barycentric space (Woop et
al., "Watertight Ray/Triangle Intersection", JCGT 2013 — the affine
variant). A ray's transformed origin/direction are then SIX K=4/K=3
dot products per (triangle, ray) pair — batched over a (C, B) tile
they become dot_generals that run on the MXU, leaving only ~15
elementwise VPU ops of epilogue (vs ~45 for Möller-Trumbore).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.types import CLUSTER_SIZE

BIG = 3e38


def build_woop(v0, v1, v2, candidate) -> tuple[np.ndarray, np.ndarray]:
    """Host precompute: (w[12, T] packed rows, updated candidate).

    Returned w has kernel layout (3T, 8): per CLUSTER_SIZE chunk, the
    chunk's row-0 vectors, then row-1, then row-2 (each [A | b] in
    columns 0-3). Front-facing by the reference's convention
    (n_ref = cross(v2-v0, v1-v0), hit iff d·n_ref < 0) ⇔ dz > 0.
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
    c = CLUSTER_SIZE
    assert t % c == 0, (t, c)
    # rows (T, 3, 4): per-triangle affine rows [A | b]
    rows = np.concatenate([inv, b[:, :, None]], axis=2).astype(np.float32)
    # kernel layout (3T, 8): per chunk j the row range [3cj, 3c(j+1)) is
    # [row0s (c); row1s (c); row2s (c)], columns 0-3 used, 4-7 zero
    blocks = rows.reshape(t // c, c, 3, 4).transpose(0, 2, 1, 3)
    w = np.zeros((3 * t, 8), np.float32)
    w[:, :4] = blocks.reshape(3 * t, 4)
    return w, cand


def _kernel(mask_ref, rays_ref, w_ref, cand_ref, out_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = jnp.full_like(out_ref[0, :], BIG)
        out_ref[1, :] = jnp.zeros_like(out_ref[1, :])
        out_ref[2, :] = jnp.zeros_like(out_ref[2, :])
        out_ref[3, :] = jnp.zeros_like(out_ref[3, :])
        idx_ref[0, :] = jnp.full_like(idx_ref[0, :], -1)

    # bit-packed reachability word from SMEM (scalar prefetch)
    word = mask_ref[i, j // 32]
    reach = (word >> (j % 32)) & 1

    @pl.when(reach > 0)
    def _():
        _intersect_tile(rays_ref, w_ref, cand_ref, out_ref, idx_ref, j)


def _intersect_tile(rays_ref, w_ref, cand_ref, out_ref, idx_ref, j):
    rays = rays_ref[:]  # (8, B)
    w = w_ref[:]  # (3C, 8) row blocks [row0s; row1s; row2s], cols 0-3 used
    cand = cand_ref[:]  # (1, C)
    t_min, t_max = rays[6:7], rays[7:8]  # (1, B)

    B = rays.shape[1]
    o_aug = jnp.concatenate([rays[0:3], jnp.ones_like(rays[0:1]), rays[4:8]], axis=0)
    d_aug = jnp.concatenate([rays[3:6], jnp.zeros_like(rays[0:1]), rays[4:8]], axis=0)
    # rows 4..7 of the augmented vectors are garbage — the matching w
    # columns are zero, so they do not contribute.
    rhs = jnp.concatenate([o_aug, d_aug], axis=1)  # (8, 2B)

    # ONE matmul per tile: (3C, 8) @ (8, 2B) → (3C, 2B) on the MXU
    # (K padded to the register depth; zero columns are free).
    big = jax.lax.dot_general(
        w, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    C = cand.shape[1]
    u0 = big[0:C, 0:B]
    v0 = big[C : 2 * C, 0:B]
    z0 = big[2 * C : 3 * C, 0:B]
    du = big[0:C, B : 2 * B]
    dv = big[C : 2 * C, B : 2 * B]
    dz = big[2 * C : 3 * C, B : 2 * B]

    front = dz > 1e-12
    inv_dz = 1.0 / jnp.where(front, dz, 1.0)
    t = -z0 * inv_dz
    u = u0 + t * du
    v = v0 + t * dv
    ok = (
        front
        & (cand.T > 0.5)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t <= t_max)
    )
    t_m = jnp.where(ok, t, BIG)

    best_t = jnp.min(t_m, axis=0)
    arg = jnp.argmin(t_m, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
    sel = row == arg[None, :]
    best_u = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
    best_v = jnp.sum(jnp.where(sel, v, 0.0), axis=0)

    better = best_t < out_ref[0, :]
    out_ref[0, :] = jnp.where(better, best_t, out_ref[0, :])
    out_ref[1, :] = jnp.where(better, best_u, out_ref[1, :])
    out_ref[2, :] = jnp.where(better, best_v, out_ref[2, :])
    idx_ref[0, :] = jnp.where(
        better, j * C + arg.astype(jnp.int32), idx_ref[0, :]
    )


def _cull_mask(rays, cluster_lo, cluster_hi, ray_block):
    """Conservative (ray-block × cluster) reachability mask.

    Interval slab test over the whole ray bundle (packet-tracing
    style): for a block with origin box O, direction box D and max
    parameter t̂, each axis k with sign-consistent directions bounds
    the parameter interval during which ANY bundle ray can be inside
    the cluster slab:

        t_enter_k ≥ (c_lo − O_hi)/D_hi   (fastest approach from the
        t_exit_k  ≤ (c_hi − O_lo)/D_lo    nearest origin, etc.)

    (mirrored for negative direction intervals; sign-mixed axes give
    no constraint). The cluster is reachable iff the intersection of
    the per-axis intervals with [0, t̂] is non-empty — this captures
    the frustum correlation that axis-aligned reach boxes miss. This
    is the tile-granular second level of the structure — hierarchy at
    block granularity instead of a divergent per-ray stack walk.
    Incoherent blocks degrade gracefully toward the dense sweep.
    """
    n = rays.shape[1]
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
    t_out = jnp.where(
        pos, t_out_pos, jnp.where(neg, t_out_neg, jnp.inf)
    )
    # mixed axes: constrain only by the static slab overlap with the
    # origin box extended by t̂·|D| in both directions
    reach_lo_m = o_lo + t_hat * jnp.minimum(d_lo, 0.0)
    reach_hi_m = o_hi + t_hat * jnp.maximum(d_hi, 0.0)
    slab_ok_m = (reach_lo_m <= c_hi) & (reach_hi_m >= c_lo)
    t_out = jnp.where(mixed & ~slab_ok_m, -jnp.inf, t_out)

    t_enter = jnp.maximum(t_in.max(axis=-1), 0.0)  # (nb, nc)
    t_exit = jnp.minimum(t_out.min(axis=-1), t_hat[..., 0])
    m = t_enter <= t_exit
    # bit-pack along clusters → i32 words for SMEM scalar prefetch
    nb2, nc = m.shape
    nw = (nc + 31) // 32
    pad = nw * 32 - nc
    mp = jnp.pad(m, ((0, 0), (0, pad))).reshape(nb2, nw, 32)
    bits = (mp.astype(jnp.int32) << jnp.arange(32, dtype=jnp.int32)).sum(-1)
    return bits  # (nb, nw) int32


@functools.partial(jax.jit, static_argnames=("ray_block", "chunk", "interpret"))
def intersect_woop_packed(
    rays, w, cand, cluster_lo=None, cluster_hi=None,
    ray_block: int = 2048, chunk: int = CLUSTER_SIZE,
    interpret: bool = False,
):
    n = rays.shape[1]
    t = w.shape[0] // 3
    grid = (n // ray_block, t // chunk)
    if cluster_lo is not None:
        mask = _cull_mask(rays, cluster_lo, cluster_hi, ray_block)
    else:
        nb, nc = grid
        mask = jnp.full((nb, (nc + 31) // 32), -1, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, j, m: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * chunk, 8), lambda i, j, m: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j, m: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, ray_block), lambda i, j, m: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, j, m: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    out, idx = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(mask, rays, w, cand)
    return out, idx


def _sort_keys(accel, o, d):
    """Bounce-ray binning key: direction octant (high bits, so every
    sorted block has sign-consistent directions — exactly what the
    interval slab culling needs) then origin Morton code (locality)."""
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
    return (octant << jnp.uint32(24)) | (morton & jnp.uint32(0xFFFFFF))


def intersect_woop(
    accel, o, d, t_min, t_max, ray_block=2048, interpret=False,
    sort_rays=False,
):
    """HitRecord-compatible Woop-kernel intersection. Requires the accel
    to carry `woop_w`/`woop_cand` (see build_accel). ``sort_rays`` bins
    incoherent (bounce) rays by direction octant + origin Morton so the
    block culling mask stays effective; sorts/permutes are ~free on TPU
    relative to one trace."""
    from .intersect import HitRecord

    n = o.shape[0]
    # keep scalar bounds scalar through the sort (no permute needed)
    t_min_s = jnp.asarray(t_min, jnp.float32)
    t_max_s = jnp.asarray(t_max, jnp.float32)
    if sort_rays and n >= ray_block:
        perm = jnp.argsort(_sort_keys(accel, o, d))
        # ONE packed permute of the ray data instead of per-field takes
        od = jnp.take(jnp.concatenate([o, d], axis=1), perm, axis=0)
        o, d = od[:, 0:3], od[:, 3:6]
        if t_min_s.ndim:
            t_min_s = jnp.take(t_min_s, perm)
        if t_max_s.ndim:
            t_max_s = jnp.take(t_max_s, perm)
        hr = intersect_woop(
            accel, o, d, t_min_s, t_max_s, ray_block=ray_block,
            interpret=interpret, sort_rays=False,
        )
        # un-sort with one packed f32 gather + one i32 gather. tri must
        # NOT ride bit-cast in an f32 lane: TPU canonicalizes NaN
        # payloads and flushes denormal bit patterns even through pure
        # copies, corrupting small/negative indices. A scatter
        # .at[perm].set is 4x slower than inverse argsort + gather
        # on TPU (measured), so gathers it is.
        inv = jnp.argsort(perm)
        packed = jnp.take(
            jnp.stack([hr.t, hr.u, hr.v], axis=1), inv, axis=0
        )
        return HitRecord(
            t=packed[:, 0],
            tri=jnp.take(hr.tri, inv),
            u=packed[:, 1],
            v=packed[:, 2],
        )
    t_min = jnp.broadcast_to(t_min_s, (n,))
    t_max = jnp.broadcast_to(t_max_s, (n,))
    pad = (-n) % ray_block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min = jnp.concatenate([t_min, jnp.zeros((pad,))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0)])
    rays = jnp.concatenate([o.T, d.T, t_min[None], t_max[None]], axis=0)
    out, idx = intersect_woop_packed(
        rays, accel.woop_w, accel.woop_cand,
        cluster_lo=accel.cluster_lo, cluster_hi=accel.cluster_hi,
        ray_block=ray_block, interpret=interpret,
    )
    return HitRecord(t=out[0, :n], tri=idx[0, :n], u=out[1, :n], v=out[2, :n])
