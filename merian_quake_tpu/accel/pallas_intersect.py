"""Pallas TPU ray-triangle intersection kernel.

The XLA formulation of the dense sweep materializes (rays × chunk)
intermediates in HBM and runs ~100× below the VPU roofline. This kernel
keeps the whole working set in VMEM: the grid is
(ray_blocks, tri_chunks); each step intersects a (B-ray, C-triangle)
tile laid out lanes-over-rays / sublanes-over-triangles — (C, B) ops on
the VPU — and folds a running nearest-hit into the per-ray-block output
(the TPU grid is sequential, so accumulation across the chunk dimension
is race-free).

Data layout (packed on the host once per accel build / per frame):
- rays:  f32[8, N]  rows = ox oy oz dx dy dz t_min t_max
- tris:  f32[16, T] rows = v0 v1 v2 (xyz each), candidate flag
- out:   f32[4, N]  rows = t u v (w unused), i32[1, N] triangle index
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.types import CLUSTER_SIZE

BIG = 3e38
DET_EPS = 1e-9


def _kernel(rays_ref, tris_ref, out_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = jnp.full_like(out_ref[0, :], BIG)
        out_ref[1, :] = jnp.zeros_like(out_ref[1, :])
        out_ref[2, :] = jnp.zeros_like(out_ref[2, :])
        out_ref[3, :] = jnp.zeros_like(out_ref[3, :])
        idx_ref[0, :] = jnp.full_like(idx_ref[0, :], -1)

    rays = rays_ref[:]  # (8, B)
    tris = tris_ref[:]  # (16, C)
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]  # (1, B)
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    t_min, t_max = rays[6:7], rays[7:8]

    C = tris.shape[1]
    v0x, v0y, v0z = tris[0:1].T, tris[1:2].T, tris[2:3].T  # (C, 1)
    v1x, v1y, v1z = tris[3:4].T, tris[4:5].T, tris[5:6].T
    v2x, v2y, v2z = tris[6:7].T, tris[7:8].T, tris[8:9].T
    cand = tris[9:10].T  # (C, 1)

    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

    # pvec = d × e2  → (C, B)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    front = det < -DET_EPS
    inv_det = 1.0 / jnp.where(front, det, -1.0)

    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec × e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (
        front
        & (cand > 0.5)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t <= t_max)
    )
    t_m = jnp.where(ok, t, BIG)

    best_t = jnp.min(t_m, axis=0)  # (B,)
    arg = jnp.argmin(t_m, axis=0)  # (B,)
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


@functools.partial(
    jax.jit, static_argnames=("ray_block", "chunk", "interpret")
)
def intersect_packed(
    rays: jnp.ndarray,  # f32[8, N] (N multiple of ray_block)
    tris: jnp.ndarray,  # f32[16, T] (T multiple of chunk)
    ray_block: int = 1024,
    chunk: int = CLUSTER_SIZE,
    interpret: bool = False,
):
    n = rays.shape[1]
    t = tris.shape[1]
    grid = (n // ray_block, t // chunk)
    out, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, ray_block), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(rays, tris)
    return out, idx


def pack_tris(scene_v0, scene_v1, scene_v2, candidate) -> jnp.ndarray:
    """Scene SoA → f32[16, T] kernel layout (host/device, cheap)."""
    t = scene_v0.shape[0]
    rows = [
        scene_v0[:, 0], scene_v0[:, 1], scene_v0[:, 2],
        scene_v1[:, 0], scene_v1[:, 1], scene_v1[:, 2],
        scene_v2[:, 0], scene_v2[:, 1], scene_v2[:, 2],
        candidate.astype(jnp.float32),
    ]
    packed = jnp.stack(rows, axis=0)
    return jnp.concatenate(
        [packed, jnp.zeros((16 - len(rows), t), jnp.float32)], axis=0
    )


def intersect_pallas(accel, o, d, t_min, t_max, ray_block=1024, interpret=False):
    """Drop-in replacement for accel.intersect (same HitRecord)."""
    from .intersect import HitRecord

    n = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    pad = (-n) % ray_block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min = jnp.concatenate([t_min, jnp.zeros((pad,))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0)])
    rays = jnp.concatenate(
        [o.T, d.T, t_min[None], t_max[None]], axis=0
    )
    tris = getattr(accel, "_packed_tris", None)
    if tris is None:
        tris = pack_tris(accel.scene.v0, accel.scene.v1, accel.scene.v2, accel.candidate)
    out, idx = intersect_packed(
        rays, tris, ray_block=ray_block, interpret=interpret
    )
    return HitRecord(
        t=out[0, :n], tri=idx[0, :n], u=out[1, :n], v=out[2, :n]
    )
