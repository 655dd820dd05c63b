"""Pixel ↔ flat-buffer layout (tile-major order).

The intersection kernel processes rays in consecutive blocks; with the
usual scanline flattening a 2048-ray block spans a full image row and
its direction bounding box covers the whole horizontal FOV, making the
cluster-culling mask useless. Tile-major order (8×128 pixel tiles — one
ray block = exactly one VMEM-friendly tile pair) shrinks a block's
angular spread to a few degrees, so coherent blocks cull most clusters.

All per-pixel modules must agree on this order: pixel coordinate
generation, image formation, and neighbor lookups go through these
helpers (≈ merian-shaders/image_buffer.glsl.h's image_to_buffer_index).
Resolutions not divisible by the tile size fall back to scanline order.
"""
from __future__ import annotations

import jax.numpy as jnp

TILE_H = 8
TILE_W = 128

# test hook: force the scanline fallback (equivalence tests)
FORCE_SCANLINE = False


def is_tiled(width: int, height: int) -> bool:
    if FORCE_SCANLINE:
        return False
    return width % TILE_W == 0 and height % TILE_H == 0


def gen_pixels(width: int, height: int, y0: int | jnp.ndarray = 0, rows=None):
    """Flat (px, py) int32 arrays in buffer order for rows [y0, y0+rows)."""
    rows = height if rows is None else rows
    if not (is_tiled(width, rows)):
        px, py = jnp.meshgrid(jnp.arange(width), jnp.arange(rows), indexing="xy")
        return px.reshape(-1), py.reshape(-1) + jnp.asarray(y0, jnp.int32)
    nty, ntx = rows // TILE_H, width // TILE_W
    ty = jnp.arange(nty).reshape(nty, 1, 1, 1)
    tx = jnp.arange(ntx).reshape(1, ntx, 1, 1)
    iy = jnp.arange(TILE_H).reshape(1, 1, TILE_H, 1)
    ix = jnp.arange(TILE_W).reshape(1, 1, 1, TILE_W)
    px = jnp.broadcast_to(tx * TILE_W + ix, (nty, ntx, TILE_H, TILE_W))
    py = jnp.broadcast_to(ty * TILE_H + iy, (nty, ntx, TILE_H, TILE_W))
    return px.reshape(-1), py.reshape(-1) + jnp.asarray(y0, jnp.int32)


def flat_to_image(x: jnp.ndarray, width: int, height: int):
    """Flat buffer (N, ...) → image (H, W, ...) (cheap transpose)."""
    if not is_tiled(width, height):
        return x.reshape((height, width) + x.shape[1:])
    nty, ntx = height // TILE_H, width // TILE_W
    t = x.reshape((nty, ntx, TILE_H, TILE_W) + x.shape[1:])
    order = (0, 2, 1, 3) + tuple(range(4, t.ndim))
    return t.transpose(order).reshape((height, width) + x.shape[1:])


def image_to_flat(img: jnp.ndarray, width: int, height: int):
    """Image (H, W, ...) → flat buffer (N, ...)."""
    if not is_tiled(width, height):
        return img.reshape((height * width,) + img.shape[2:])
    nty, ntx = height // TILE_H, width // TILE_W
    t = img.reshape((nty, TILE_H, ntx, TILE_W) + img.shape[2:])
    order = (0, 2, 1, 3) + tuple(range(4, t.ndim))
    return t.transpose(order).reshape((height * width,) + img.shape[2:])


def index_of(px, py, width: int, height: int):
    """Pixel coords (int arrays) → flat buffer index (neighbor lookups)."""
    if not is_tiled(width, height):
        return py * width + px
    ntx = width // TILE_W
    ty, iy = py // TILE_H, py % TILE_H
    tx, ix = px // TILE_W, px % TILE_W
    return ((ty * ntx + tx) * TILE_H + iy) * TILE_W + ix
