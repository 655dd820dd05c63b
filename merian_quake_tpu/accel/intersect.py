"""Dense Möller–Trumbore intersection with the alpha-test any-hit loop.

Semantics mirror the reference trace core (raytrace.glsl:82-119):

- backface culling with the reference's normal convention
  n = cross(v2-v0, v1-v0) → front-facing iff det < 0,
- nearest candidate hit via chunked running min-reduction,
- committed hits on ``needs_alpha`` triangles sample the albedo
  texture's alpha channel; texel alpha < ALPHA_THRESHOLD rejects the
  hit and re-traces from just past it, at most MAX_INTERSECTIONS times.

This is the *oracle* path (pure JAX, fully vectorized, O(N_rays × T));
the Pallas cluster-culled kernel (pallas_intersect) must match it
bit-for-nearly (same arithmetic, different scheduling).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import atlas as atlas_mod
from ..models import materials
from .build import AccelScene

_BIG = jnp.float32(3e38)
_DET_EPS = 1e-9
_ADVANCE = 1e-3  # re-trace offset past a rejected surface (quake units)


class HitRecord(NamedTuple):
    t: jnp.ndarray  # f32[N] hit distance (T_MAX-ish if miss)
    tri: jnp.ndarray  # i32[N] triangle index, -1 = miss
    u: jnp.ndarray  # f32[N] barycentric weight of v1
    v: jnp.ndarray  # f32[N] barycentric weight of v2

    @property
    def hit(self) -> jnp.ndarray:
        return self.tri >= 0


import os


def _use_pallas() -> bool:
    """TPU → Pallas Woop kernel; CPU → XLA oracle (also the interpret-
    mode reference). Override with MQ_INTERSECT=oracle|woop."""
    mode = os.environ.get("MQ_INTERSECT", "auto")
    if mode == "oracle":
        return False
    if mode == "woop":
        return True
    return jax.default_backend() == "tpu"


def intersect(
    accel: AccelScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max,
    chunk: int = 128,
    ray_block: int = 1 << 16,
    sort_rays: bool = False,
) -> HitRecord:
    """Nearest front-facing candidate hit. o, d: f32[N, 3].

    On TPU this dispatches to the Pallas Woop kernel (accel/woop.py);
    the XLA path below is the correctness oracle (used on CPU and by
    the kernel equivalence tests). Large ray batches are processed in
    sequential blocks of ``ray_block`` rays (lax.map) to bound the
    (rays × chunk) intermediate working set.
    """
    if _use_pallas():
        from .woop import intersect_woop

        # coherent/primary (unsorted) packets: rb=1024 measured best on
        # chip (125.4 ms vs 132.9 at rb=4096, scripts/gbuffer_anatomy_r5)
        # — tight frustums cull better at small blocks; sorted bounce
        # paths keep their own rb=4096 default inside intersect_woop
        return intersect_woop(
            accel, o, d, t_min, t_max, sort_rays=sort_rays,
            ray_block=4096 if sort_rays else 1024,
        )
    n_rays = o.shape[0]
    if n_rays > ray_block:
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))
        pad = (-n_rays) % ray_block
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_min = jnp.concatenate([t_min, jnp.zeros((pad,))])
            t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0)])
        nb = o.shape[0] // ray_block
        blocks = lambda x, s: x.reshape((nb, ray_block) + s)
        out = jax.lax.map(
            lambda xs: intersect(
                accel, xs[0], xs[1], xs[2], xs[3], chunk=chunk,
                ray_block=ray_block,
            ),
            (blocks(o, (3,)), blocks(d, (3,)), blocks(t_min, ()), blocks(t_max, ())),
        )
        flat = HitRecord(*[x.reshape(-1)[:n_rays] for x in out])
        return flat
    scene = accel.scene
    T = scene.num_tris
    # T is always a CLUSTER_SIZE multiple but need not be divisible by
    # the requested chunk (e.g. 576 tris, chunk 128): fall back to the
    # gcd so every CLUSTER_SIZE-padded scene chunks exactly.
    chunk = math.gcd(min(chunk, T), T)
    n_chunks = T // chunk
    assert n_chunks * chunk == T, (T, chunk)

    v0 = scene.v0.reshape(n_chunks, chunk, 3)
    v1 = scene.v1.reshape(n_chunks, chunk, 3)
    v2 = scene.v2.reshape(n_chunks, chunk, 3)
    cand = accel.candidate.reshape(n_chunks, chunk)
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o.shape[:-1])
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:-1])

    def body(carry, xs):
        best_t, best_tri, best_u, best_v = carry
        cv0, cv1, cv2, cc, cbase = xs
        e1 = cv1 - cv0  # (C, 3)
        e2 = cv2 - cv0
        # (N, C, 3) broadcasts
        pvec = jnp.cross(d[:, None, :], e2[None, :, :])
        det = jnp.sum(e1[None] * pvec, axis=-1)  # (N, C)
        front = det < -_DET_EPS
        inv_det = 1.0 / jnp.where(front, det, -1.0)
        tvec = o[:, None, :] - cv0[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None, :, :])
        v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
        ok = (
            front
            & cc[None]
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min[:, None])
            & (t <= t_max[:, None])
        )
        t_m = jnp.where(ok, t, _BIG)
        j = jnp.argmin(t_m, axis=-1)  # (N,)
        n_idx = jnp.arange(o.shape[0])
        tj = t_m[n_idx, j]
        better = tj < best_t
        best_tri = jnp.where(better, cbase + j.astype(jnp.int32), best_tri)
        best_u = jnp.where(better, u[n_idx, j], best_u)
        best_v = jnp.where(better, v[n_idx, j], best_v)
        best_t = jnp.where(better, tj, best_t)
        return (best_t, best_tri, best_u, best_v), None

    n = o.shape[0]
    init = (
        jnp.full((n,), _BIG),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    (bt, btri, bu, bv), _ = jax.lax.scan(body, init, (v0, v1, v2, cand, base))
    return HitRecord(t=bt, tri=btri, u=bu, v=bv)


def _hit_uv(accel: AccelScene, hr: HitRecord) -> jnp.ndarray:
    """Interpolated texture UV at the hit (st * barycentrics)."""
    tri = jnp.maximum(hr.tri, 0)
    st = jnp.take(accel.scene.st, tri, axis=0)  # (N, 3, 2)
    w0 = (1.0 - hr.u - hr.v)[..., None]
    return st[:, 0] * w0 + st[:, 1] * hr.u[..., None] + st[:, 2] * hr.v[..., None]


def trace_nearest(
    accel: AccelScene,
    tex,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max,
    max_intersections: int = materials.MAX_INTERSECTIONS,
    chunk: int = 128,
    sort_rays: bool = False,
) -> HitRecord:
    """Nearest *accepted* hit: runs the alpha-test re-trace loop.

    ``tex``: TextureAtlas (None skips alpha testing entirely — a single
    intersect sweep with no re-trace loop; callers pass None when the
    static SceneFeatures.has_alpha_tris flag says no triangle can ever
    alpha-reject, compiling out ~40% of the trace cost).
    """
    if tex is None:
        return intersect(
            accel, o, d, t_min, t_max, chunk=chunk, sort_rays=sort_rays
        )
    n = o.shape[0]
    t_min0 = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def cond(state):
        i, active, _, _ = state
        return jnp.logical_and(i < max_intersections, jnp.any(active))

    def body(state):
        i, active, cur_tmin, result = state
        hr = intersect(
            accel, o, d, cur_tmin, t_max, chunk=chunk, sort_rays=sort_rays
        )
        if tex is not None:
            needs = jnp.take(accel.needs_alpha, jnp.maximum(hr.tri, 0)) & hr.hit
            uv = _hit_uv(accel, hr)
            texnum = jnp.take(accel.scene.texnum, jnp.maximum(hr.tri, 0))
            a = atlas_mod.sample_nearest(tex, texnum, uv)[..., 3]
            reject = needs & (a < materials.ALPHA_THRESHOLD)
        else:
            reject = jnp.zeros((n,), bool)
        accept = active & ~reject
        result = HitRecord(
            t=jnp.where(accept, hr.t, result.t),
            tri=jnp.where(accept, hr.tri, result.tri),
            u=jnp.where(accept, hr.u, result.u),
            v=jnp.where(accept, hr.v, result.v),
        )
        cur_tmin = jnp.where(reject & active, hr.t + _ADVANCE, cur_tmin)
        return i + 1, active & reject, cur_tmin, result

    init_result = HitRecord(
        t=jnp.full((n,), _BIG),
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,)),
        v=jnp.zeros((n,)),
    )
    state = (0, jnp.ones((n,), bool), t_min0, init_result)
    _, _, _, result = jax.lax.while_loop(cond, body, state)
    return result


def trace_visibility(
    accel: AccelScene,
    tex,
    from_pos: jnp.ndarray,
    to_pos: jnp.ndarray,
    offset: float = 1e-3,
    chunk: int = 128,
    sort_rays: bool = False,
) -> jnp.ndarray:
    """Visibility between points; sky hits count as visible
    (raytrace.glsl:122-145).

    TPU path: occlusion-only any-hit sweep on the shadow Woop table
    (sky/alpha zeroed — see build_accel) — no winner bookkeeping and
    fully occluded ray blocks exit at their first hit cluster. Alpha-
    tested triangles are resolved exactly by a nearest+alpha-loop
    trace on the alpha-only table (tiny: its clusters cover only
    fence-like geometry). One divergence from the oracle: a surface
    BEHIND a sky polygon still occludes (the oracle commits the nearer
    sky hit and calls the ray visible) — real maps keep sky as the
    outermost shell, so no such surface exists.
    """
    wo = to_pos - from_pos
    dist = jnp.linalg.norm(wo, axis=-1)
    d = wo / jnp.maximum(dist, 1e-20)[..., None]
    t_max = jnp.maximum(offset, dist - 2.0 * offset)
    if _use_pallas():
        from .woop import intersect_woop_any

        occ = intersect_woop_any(
            accel, from_pos, d, offset, t_max, sort_rays=sort_rays
        )
        vis = ~occ
        if tex is not None and accel.woop_w_alpha is not None:
            aacc = accel._replace(
                woop_w=accel.woop_w_alpha,
                cluster_lo=accel.cluster_lo_alpha,
                cluster_hi=accel.cluster_hi_alpha,
                woop_w_fine=None,
                cluster_lo_fine=None,
                cluster_hi_fine=None,
            )
            hr = trace_nearest(
                aacc, tex, from_pos, d, offset, t_max, chunk=chunk
            )
            vis &= ~hr.hit
        return vis
    hr = trace_nearest(accel, tex, from_pos, d, offset, t_max, chunk=chunk)
    flags = jnp.take(accel.scene.flags, jnp.maximum(hr.tri, 0))
    sky = flags == materials.MAT_FLAGS_SKY
    return jnp.logical_or(~hr.hit, sky)
