"""Counter-based / stateful RNG streams.

Mirrors the semantics of the reference's ``merian-shaders/random.glsl``
(xorshift32 per-pixel streams seeded by ``pcg4d16(pixel, frame, seed)``,
use sites: /root/reference/res/shader/render_mcpg/mcpg.comp:40 and
res/shader/gbuffer/gbuffer.comp:69). All state is explicit uint32 data
threaded through the computation — idiomatic for JAX (no hidden state),
and the integer ops vectorize on the VPU.

The stream layout matters for output parity: the reference draws a
well-defined sequence of uniforms per pixel per frame; keeping the same
generator family (xorshift32 seeded by PCG4D) keeps our output
distribution statistically equivalent at equal sample counts.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
# 1/2^32 — maps uint32 to [0, 1).
_INV_U32 = jnp.float32(2.3283064365386963e-10)


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """PCG4D hash (Jarzynski & Olano, JCGT 2020). ``v``: uint32[..., 4]."""
    v = _u32(v)
    v = v * _u32(1664525) + _u32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    v = jnp.stack([x, y, z, w], axis=-1)
    v = v ^ (v >> _u32(16))
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def seed_pixel(px: jnp.ndarray, py: jnp.ndarray, frame, seed) -> jnp.ndarray:
    """Per-pixel stream seed: pcg4d16(pixel, frame, SEED) → uint32 state.

    Reference: ``rng_state = pcg4d16(uvec4(pixel, params.frame, SEED))``
    (mcpg.comp:40).
    """
    px = _u32(px)
    shape = jnp.broadcast_shapes(
        jnp.shape(px), jnp.shape(py), jnp.shape(frame), jnp.shape(seed)
    )
    v = jnp.stack(
        [
            jnp.broadcast_to(_u32(px), shape),
            jnp.broadcast_to(_u32(py), shape),
            jnp.broadcast_to(_u32(frame), shape),
            jnp.broadcast_to(_u32(seed), shape),
        ],
        axis=-1,
    )
    h = pcg4d(v)[..., 0]
    # Avoid the xorshift32 fixed point at 0.
    return jnp.where(h == 0, _u32(0x9E3779B9), h)


def xorshift32_raw(state: jnp.ndarray) -> jnp.ndarray:
    """One xorshift32 step. Returns the new state (also the raw sample)."""
    state = _u32(state)
    state = state ^ (state << _u32(13))
    state = state ^ (state >> _u32(17))
    state = state ^ (state << _u32(5))
    return state


def uniform(state: jnp.ndarray):
    """Draw one float32 uniform in [0, 1). Returns (new_state, u)."""
    state = xorshift32_raw(state)
    return state, state.astype(jnp.float32) * _INV_U32


def uniform2(state: jnp.ndarray):
    state, a = uniform(state)
    state, b = uniform(state)
    return state, jnp.stack([a, b], axis=-1)


def uniform3(state: jnp.ndarray):
    state, a = uniform(state)
    state, b = uniform(state)
    state, c = uniform(state)
    return state, jnp.stack([a, b, c], axis=-1)


def uniform4(state: jnp.ndarray):
    state, ab = uniform2(state)
    state, cd = uniform2(state)
    return state, jnp.concatenate([ab, cd], axis=-1)
