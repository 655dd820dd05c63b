"""World-space hash-grid index math for the guiding caches.

Equivalent of ``merian-shaders/grid.glsl`` + ``hash.glsl``
(grid_idx_closest/interpolate, hash_grid, hash_grid_normal_level,
hash2_grid_level — use sites render_mcpg/mc.glsl:98-150 and
light_cache.glsl). Two independent hashes per cell: a primary hash for
the buffer slot and a 16-bit verification hash to detect collisions
(collision → state reset, mc.glsl:90-96).

All functions are batched over leading dims and uint32-exact.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def grid_idx_closest(pos: jnp.ndarray, width) -> jnp.ndarray:
    """Cell index of the nearest cell center: round(pos/width). int32[..., 3]."""
    return jnp.round(pos / width).astype(jnp.int32)


def grid_idx_interpolate(pos: jnp.ndarray, width, u3: jnp.ndarray) -> jnp.ndarray:
    """Stochastic trilinear cell selection.

    Chooses one of the 8 surrounding cells with trilinear-weight
    probability: floor(pos/width + u3) where u3 ~ U[0,1)^3 (pos measured
    relative to cell centers).
    """
    return jnp.floor(pos / width - 0.5 + u3).astype(jnp.int32)


def _hash_coords(vals) -> jnp.ndarray:
    """xxhash-style avalanche over a list of uint32 coordinates."""
    h = _U32(0x9E3779B1)
    for v in vals:
        v = jnp.asarray(v).astype(_U32)
        h = h ^ (v * _U32(0x85EBCA77))
        h = (h << _U32(13)) | (h >> _U32(19))
        h = h * _U32(0xC2B2AE3D)
    h = h ^ (h >> _U32(16))
    h = h * _U32(0x7FEB352D)
    h = h ^ (h >> _U32(15))
    return h


def _hash2_coords(vals) -> jnp.ndarray:
    """Independent second hash (different constants) for verification."""
    h = _U32(0x27220A95)
    for v in vals:
        v = jnp.asarray(v).astype(_U32)
        h = (h + v * _U32(0x165667B1)) * _U32(0x01000193)
        h = h ^ (h >> _U32(17))
    return h


def quantize_normal(normal: jnp.ndarray) -> jnp.ndarray:
    """Dominant-axis bucket 0..5 so states are split per face orientation.

    Pure selects — argmax + take_along_axis lower to an M-row gather on
    TPU (~27 ns/row serial; measured 200 ms at 8.3M rows) while this
    fuses into the surrounding elementwise graph for ~free.
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    is_x = (ax >= ay) & (ax >= az)  # first-max tie-break like argmax
    is_y = (~is_x) & (ay >= az)
    axis = jnp.where(is_x, 0, jnp.where(is_y, 1, 2))
    val = jnp.where(is_x, nx, jnp.where(is_y, ny, nz))
    return (axis * 2 + (val < 0.0).astype(jnp.int32)).astype(_U32)


def hash_grid(idx: jnp.ndarray, size) -> jnp.ndarray:
    """Primary slot for a cell: hash(idx) % size. uint32[...]."""
    h = _hash_coords([idx[..., 0], idx[..., 1], idx[..., 2]])
    return h % _U32(size)


def hash_grid_normal_level(idx, normal, level, size) -> jnp.ndarray:
    """Primary slot including quantized normal and grid level."""
    h = _hash_coords(
        [idx[..., 0], idx[..., 1], idx[..., 2], quantize_normal(normal), level]
    )
    return h % _U32(size)


def hash2_grid(idx) -> jnp.ndarray:
    """16-bit verification hash of a cell."""
    return _hash2_coords([idx[..., 0], idx[..., 1], idx[..., 2]]) & _U32(0xFFFF)


def hash2_grid_level(idx, level) -> jnp.ndarray:
    """16-bit verification hash including the level."""
    return (
        _hash2_coords([idx[..., 0], idx[..., 1], idx[..., 2], level]) & _U32(0xFFFF)
    )
