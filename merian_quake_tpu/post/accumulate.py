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


def reproject(history, mv, fallback=None):
    """Bilinear history lookup at pixel + mv (mv in pixels, prev - cur).

    Out-of-bounds samples fall back to ``fallback`` (or the new frame's
    own value must be handled by the caller via the returned validity).
    Returns (reprojected, valid mask).
    """
    H, W = history.shape[:2]
    py, px = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
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
