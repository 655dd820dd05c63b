"""von Mises–Fisher distribution on S² — sample / pdf.

Equivalent of the reference's ``merian-shaders/von_mises_fisher.glsl``
(vmf_sample/vmf_pdf; used for guiding lobes in mcpg.comp:113-136 and the
sun glow in raytrace.glsl:30). Numerically stable for kappa → 0 and
kappa ≫ 1 (log1p/expm1 formulations).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import linalg

MAX_KAPPA = 1e4


def pdf(w: jnp.ndarray, mu: jnp.ndarray, kappa) -> jnp.ndarray:
    """vMF density. w, mu: [..., 3] unit vectors; kappa broadcastable.

    pdf = kappa / (2*pi*(1 - exp(-2*kappa))) * exp(kappa*(dot(w, mu) - 1)).
    Limits to uniform-sphere 1/(4*pi) as kappa → 0.
    """
    kappa = jnp.clip(jnp.asarray(kappa, jnp.float32), 0.0, MAX_KAPPA)
    c = linalg.dot(w, mu)
    small = kappa < 1e-4
    safe_kappa = jnp.where(small, 1.0, kappa)
    norm = safe_kappa / (2.0 * jnp.pi * -jnp.expm1(-2.0 * safe_kappa))
    dens = norm * jnp.exp(safe_kappa * (c - 1.0))
    return jnp.where(small, 1.0 / (4.0 * jnp.pi), dens)


def sample(mu: jnp.ndarray, kappa, u: jnp.ndarray) -> jnp.ndarray:
    """Sample a direction ~ vMF(mu, kappa). u: [..., 2] uniforms.

    cos_theta = 1 + log(u0 + (1-u0)*exp(-2k)) / k   (Jakob 2012 tech note).
    """
    kappa = jnp.clip(
        jnp.broadcast_to(jnp.asarray(kappa, jnp.float32), u[..., 0].shape),
        0.0,
        MAX_KAPPA,
    )
    u0 = jnp.clip(u[..., 0], 1e-7, 1.0)
    small = kappa < 1e-4
    safe_kappa = jnp.where(small, 1.0, kappa)
    # log(u0 + (1-u0)e^{-2k}) = log(u0) + log1p((1-u0)/u0 * e^{-2k})
    logterm = jnp.log(u0) + jnp.log1p((1.0 - u0) / u0 * jnp.exp(-2.0 * safe_kappa))
    cos_theta = jnp.where(
        small,
        1.0 - 2.0 * u0,  # uniform sphere in the kappa→0 limit
        jnp.clip(1.0 + logterm / safe_kappa, -1.0, 1.0),
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return linalg.frame_to_world(mu, local)


def kappa_from_mean_cos(r: jnp.ndarray) -> jnp.ndarray:
    """ML estimate kappa ≈ r(3 - r²)/(1 - r²)  (Banerjee et al. 2005).

    Same estimator as the reference's ``mc_state_kappa``
    (render_mcpg/mc.glsl:43-46).
    """
    r = jnp.clip(r, 0.0, 0.9999999)
    return (3.0 * r - r * r * r) / (1.0 - r * r)
