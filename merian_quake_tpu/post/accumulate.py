"""Temporal accumulation.

Equivalent of merian's Accumulate node (default_config.json:404-427,
650-673): blends the new frame into history. ``alpha == 0`` gives the
cumulative average (reference render mode); otherwise an exponentially
weighted average with adaptive warm-up 1/(iteration+1). Motion-vector
reprojection + percentile firefly filtering are layered on in the
denoise stage (post.svgf / graph wiring).
"""
from __future__ import annotations

import jax.numpy as jnp


def accumulate(history, new, iteration, alpha=0.0):
    """history, new: f32[H, W, C]; iteration: 0-based frame counter."""
    it = jnp.asarray(iteration, jnp.float32)
    w_new = jnp.where(
        jnp.asarray(alpha) > 0.0,
        jnp.maximum(alpha, 1.0 / (it + 1.0)),
        1.0 / (it + 1.0),
    )
    return history + (new - history) * w_new


def firefly_clamp(img, k=4.0):
    """Percentile-style firefly filter (merian Accumulate node's
    'firefly percentile' option, default_config.json:404-427): clamp
    each pixel's luminance against its 3×3 neighborhood mean + k·std."""
    from ..ops import color as color_ops

    lum = color_ops.yuv_luminance(img[..., :3])
    H, W = lum.shape
    s1 = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    cnt = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
            xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
            v = lum[ys][:, xs]
            s1 = s1 + v
            s2 = s2 + v * v
            cnt += 1
    mean = s1 / cnt
    std = jnp.sqrt(jnp.maximum(s2 / cnt - mean * mean, 0.0))
    limit = mean + k * std + 1e-4
    scale = jnp.minimum(1.0, limit / jnp.maximum(lum, 1e-8))
    return img.at[..., :3].set(img[..., :3] * scale[..., None])


def accumulate_reprojected(
    history,
    hist_len,
    new,
    mv,
    valid_extra=None,
    alpha=0.0,
    firefly_k=0.0,
    gather_fn=lambda x: x,
    y0=0,
    rows=None,
):
    """Accumulate with motion-vector reprojection (merian Accumulate).

    history/new: f32[H, W, C]; hist_len: f32[H, W]; mv: f32[H, W, 2];
    valid_extra: optional bool[H, W] additional reprojection gate
    (normal/depth tests computed by the caller). Returns
    (accumulated, new_hist_len).

    ``gather_fn``/``y0``/``rows``: sharded row-slab variant — history
    slabs are all-gathered to full height and reprojected with global
    row indexing (bit-identical to the single-device path).
    """
    if firefly_k > 0.0:
        new = firefly_clamp(new, firefly_k)
    prev, valid = reproject(gather_fn(history), mv, y0=y0, rows=rows)
    if valid_extra is not None:
        valid = valid & valid_extra
    n = jnp.where(valid, hist_len, 0.0) + 1.0
    w_new = jnp.maximum(jnp.asarray(alpha, jnp.float32), 1.0 / n)
    out = jnp.where(
        valid[..., None], prev + (new - prev) * w_new[..., None], new
    )
    return out, n


def reproject(history, mv, fallback=None, y0=0, rows=None):
    """Bilinear history lookup at pixel + mv (mv in pixels, prev - cur).

    Out-of-bounds samples fall back to ``fallback`` (or the new frame's
    own value must be handled by the caller via the returned validity).
    Returns (reprojected, valid mask).

    ``y0``/``rows``: evaluate only image rows [y0, y0+rows) of a
    FULL-HEIGHT ``history`` (sharded rendering: each device passes its
    all-gathered history and its local mv slab) — indexing is by global
    row, so the sharded result is bit-identical to the single-device
    one. Defaults cover the whole image.
    """
    H, W = history.shape[:2]
    rows = H if rows is None else rows
    py, px = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float32) + jnp.float32(y0),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    sx = px + mv[..., 0]
    sy = py + mv[..., 1]
    valid = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    ax = (sx - x0.astype(jnp.float32))[..., None]
    ay = (sy - y0.astype(jnp.float32))[..., None]
    g = lambda yy, xx: history[yy, xx]
    top = g(y0, x0) * (1 - ax) + g(y0, x1) * ax
    bot = g(y1, x0) * (1 - ax) + g(y1, x1) * ax
    out = top * (1 - ay) + bot * ay
    if fallback is not None:
        out = jnp.where(valid[..., None], out, fallback)
    return out, valid
