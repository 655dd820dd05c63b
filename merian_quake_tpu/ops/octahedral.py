"""32-bit octahedral unit-vector encoding.

Equivalent of the reference's ``merian-shaders/normal_encode.glsl``
(``geo_encode_normal``/``geo_decode_normal``, used for hit normals and
compressed directions, /root/reference/res/shader/hit.glsl.h:36-52).
Two 16-bit snorm components packed into one uint32.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _oct_wrap(v: jnp.ndarray) -> jnp.ndarray:
    # (1 - |v.yx|) * sign-ish(v.xy); sign(0) must map to +1 here.
    s = jnp.where(v >= 0.0, 1.0, -1.0)
    return (1.0 - jnp.abs(v[..., ::-1])) * s


def to_oct(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector [..., 3] → octahedral uv in [-1, 1]^2."""
    denom = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    p = n[..., :2] / jnp.maximum(denom, 1e-20)[..., None]
    return jnp.where((n[..., 2] < 0.0)[..., None], _oct_wrap(p), p)


def from_oct(uv: jnp.ndarray) -> jnp.ndarray:
    """Octahedral uv in [-1, 1]^2 → unit vector [..., 3]."""
    x, y = uv[..., 0], uv[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x + jnp.where(x >= 0.0, -t, t)
    y = y + jnp.where(y >= 0.0, -t, t)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def encode_normal(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector [..., 3] → uint32 (2×16-bit snorm octahedral)."""
    uv = jnp.clip(to_oct(n), -1.0, 1.0)
    q = jnp.round((uv * 0.5 + 0.5) * 65535.0).astype(_U32)
    return q[..., 0] | (q[..., 1] << _U32(16))


def decode_normal(enc: jnp.ndarray) -> jnp.ndarray:
    """uint32 → unit vector [..., 3]."""
    enc = enc.astype(_U32)
    u = (enc & _U32(0xFFFF)).astype(jnp.float32) / 65535.0 * 2.0 - 1.0
    v = (enc >> _U32(16)).astype(jnp.float32) / 65535.0 * 2.0 - 1.0
    return from_oct(jnp.stack([u, v], axis=-1))
