"""Small vector-math helpers (frames, cosine sampling, normalization).

Equivalent of the reference's ``merian-shaders/linalg.glsl``
(``make_frame``, ``sample_cos``, pseudoinverse; included at
/root/reference/res/shader/raytrace.glsl:16). Batched over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-20


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def norm(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v):
    return v / jnp.maximum(norm(v), EPS)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def distance(a, b):
    return norm(a - b)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n, i)*n (i points toward the surface)."""
    return i - 2.0 * dot(n, i)[..., None] * n


def make_frame(n: jnp.ndarray):
    """Branchless ONB from a unit normal (Duff et al. 2017).

    Returns (t, b) with (t, b, n) right-handed orthonormal.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b_ = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b_, -sign * n[..., 0]],
        axis=-1,
    )
    b = jnp.stack([b_, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, b


def frame_to_world(n, v_local):
    """Rotate local-frame vector (z = n) into world space."""
    t, b = make_frame(n)
    return (
        t * v_local[..., 0:1] + b * v_local[..., 1:2] + n * v_local[..., 2:3]
    )


def world_to_frame(n, v_world):
    t, b = make_frame(n)
    return jnp.stack([dot(t, v_world), dot(b, v_world), dot(n, v_world)], axis=-1)


def sample_cos(n: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample around n. u: [..., 2] uniforms."""
    phi = 2.0 * jnp.pi * u[..., 0]
    r = jnp.sqrt(jnp.clip(u[..., 1], 0.0, 1.0))
    local = jnp.stack(
        [
            r * jnp.cos(phi),
            r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(1.0 - u[..., 1], 0.0)),
        ],
        axis=-1,
    )
    return frame_to_world(n, local)


def cos_pdf(n, wo):
    return jnp.maximum(dot(n, wo), 0.0) / jnp.pi
