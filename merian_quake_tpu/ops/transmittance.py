"""Homogeneous-medium transmittance and free-flight distance sampling.

Equivalent of ``merian-shaders/transmittance.glsl`` (transmittance3,
transmittance_sample2/pdf2/xi_max — use sites raytrace.glsl:166 and
render_mcpg/volume.comp:58-104). The medium is homogeneous fog with
extinction ``mu_t``, truncated at ``max_t`` (VOLUME_MAX_T): beyond
``max_t`` there is vacuum (transmittance stays constant).
"""
from __future__ import annotations

import jax.numpy as jnp


def transmittance(t, mu_t, max_t):
    """exp(-mu_t * min(t, max_t))."""
    return jnp.exp(-jnp.asarray(mu_t) * jnp.minimum(t, max_t))


def xi_max(mu_t, max_t):
    """CDF mass of scattering inside [0, max_t]: 1 - exp(-mu_t*max_t).

    Sampling with xi < xi_max yields a scatter event before max_t;
    xi >= xi_max means the ray escapes the medium.
    """
    return -jnp.expm1(-jnp.asarray(mu_t) * max_t)


def sample(xi, mu_t, max_t):
    """Truncated free-flight sampling: distance t in [0, max_t].

    xi should be drawn uniform in [0, xi_max(mu_t, max_t)) to land in the
    medium. Returns t = -log(1 - xi)/mu_t (clamped to max_t).
    """
    mu_t = jnp.maximum(jnp.asarray(mu_t), 1e-12)
    t = -jnp.log1p(-jnp.clip(xi, 0.0, 1.0 - 1e-7)) / mu_t
    return jnp.minimum(t, max_t)


def pdf(t, mu_t, max_t):
    """Density of :func:`sample` when xi ~ U[0, xi_max): mu_t*e^{-mu_t t}/xi_max."""
    mu_t = jnp.maximum(jnp.asarray(mu_t), 1e-12)
    xm = jnp.maximum(xi_max(mu_t, max_t), 1e-12)
    return jnp.where(
        t <= max_t, mu_t * jnp.exp(-mu_t * t) / xm, jnp.zeros_like(t * mu_t)
    )
