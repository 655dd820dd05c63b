"""GGX + diffuse mix BSDF — sample / pdf / eval×cos.

Equivalent of the reference's ``merian-shaders/bsdf_ggx.glsl`` +
``bsdf_diffuse.glsl`` + ``bsdf_microfacet.glsl`` combo used by every
integrator (``bsdf_ggx_diffuse_mix_{sample,pdf}``,
``bsdf_ggx_diffuse_mix_times_wodotn`` — use sites mcpg.comp:154,
restir generate_samples). The merian implementation is not vendored in
the reference checkout (empty submodule), so this is an independent,
internally consistent microfacet model:

- specular: GGX with Smith separable shadowing, VNDF sampling
  (Heitz 2018), scalar specular weight (no albedo tint),
- diffuse: Lambert (albedo applied by the caller — the integrators
  demodulate the first-hit albedo for SVGF, mcpg.comp:153-157),
- alpha = roughness² (Disney convention).

Conventions: ``wi`` points TOWARD the surface (ray direction), ``wo``
away from it — matching the reference's ``hit.wi`` usage.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import linalg

# Scalar specular reflectance; reference passes 0.02 at mcpg.comp:154.
SPEC_WEIGHT = 0.02


def roughness_to_alpha(roughness):
    return jnp.square(roughness)


def _ggx_lambda(cos_t, alpha):
    """Smith Lambda for GGX; cos_t > 0."""
    c2 = jnp.square(jnp.clip(cos_t, 1e-6, 1.0))
    t2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + jnp.square(alpha) * t2) - 1.0)


def _g1(cos_t, alpha):
    return 1.0 / (1.0 + _ggx_lambda(cos_t, alpha))


def _d_ggx(cos_h, alpha):
    a2 = jnp.square(alpha)
    c2 = jnp.square(jnp.clip(cos_h, 0.0, 1.0))
    denom = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def _sample_vndf(v_local: jnp.ndarray, alpha, u: jnp.ndarray) -> jnp.ndarray:
    """Sample a GGX half-vector via the VNDF (Heitz 2018 listing).

    v_local: view direction (away from surface) in the shading frame,
    z = normal. Returns half vector in the same frame.
    """
    a = jnp.asarray(alpha)[..., None]
    vh = linalg.normalize(v_local * jnp.concatenate([a, a, jnp.ones_like(a)], axis=-1))
    # Orthonormal basis around vh.
    lensq = jnp.square(vh[..., 0]) + jnp.square(vh[..., 1])
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(jnp.clip(u[..., 0], 0.0, 1.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    h = jnp.stack(
        [a[..., 0] * nh[..., 0], a[..., 0] * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)],
        axis=-1,
    )
    return linalg.normalize(h)


def _spec_pdf_local(v, wo, alpha):
    """VNDF pdf of wo given view v (both local, away from surface)."""
    h = linalg.normalize(v + wo)
    d = _d_ggx(h[..., 2], alpha)
    g1 = _g1(v[..., 2], alpha)
    return g1 * d / jnp.maximum(4.0 * v[..., 2], 1e-8)


def sample(wi, n, alpha, u3, spec_weight=SPEC_WEIGHT):
    """Sample wo from the mix. u3: [..., 3] uniforms. Returns wo (world)."""
    v_world = -wi  # away from surface
    v = linalg.world_to_frame(n, v_world)
    # Clamp below-horizon views to grazing and renormalize (keeps
    # sampled/evaluated directions unit-length for backfacing hits).
    v = linalg.normalize(v.at[..., 2].set(jnp.maximum(v[..., 2], 1e-6)))
    # Specular branch
    h = _sample_vndf(v, alpha, u3[..., 1:3])
    wo_spec = linalg.reflect(-v, h)
    # Diffuse branch (cosine, local frame)
    phi = 2.0 * jnp.pi * u3[..., 1]
    r = jnp.sqrt(jnp.clip(u3[..., 2], 0.0, 1.0))
    wo_diff = jnp.stack(
        [
            r * jnp.cos(phi),
            r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(1.0 - u3[..., 2], 0.0)),
        ],
        axis=-1,
    )
    pick_spec = u3[..., 0] < spec_weight
    wo_local = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    return linalg.frame_to_world(n, wo_local)


def pdf(wi, wo, n, alpha, spec_weight=SPEC_WEIGHT):
    """Mixture pdf of wo (world), consistent with :func:`sample`."""
    v = linalg.world_to_frame(n, -wi)
    # Clamp below-horizon views to grazing and renormalize (keeps
    # sampled/evaluated directions unit-length for backfacing hits).
    v = linalg.normalize(v.at[..., 2].set(jnp.maximum(v[..., 2], 1e-6)))
    o = linalg.world_to_frame(n, wo)
    cos_o = jnp.maximum(o[..., 2], 0.0)
    p_diff = cos_o / jnp.pi
    p_spec = jnp.where(cos_o > 0.0, _spec_pdf_local(v, o, alpha), 0.0)
    return spec_weight * p_spec + (1.0 - spec_weight) * p_diff


def eval_times_cos(wi, wo, n, alpha, spec_weight=SPEC_WEIGHT):
    """Scalar BSDF × cos(wo, n), WITHOUT albedo.

    Matches ``bsdf_ggx_diffuse_mix_times_wodotn(wi, wo, n, alpha, 0.02)``
    (mcpg.comp:154): diffuse part is 1/pi (albedo applied by caller),
    specular part GGX with scalar weight.
    """
    v = linalg.world_to_frame(n, -wi)
    # Clamp below-horizon views to grazing and renormalize (keeps
    # sampled/evaluated directions unit-length for backfacing hits).
    v = linalg.normalize(v.at[..., 2].set(jnp.maximum(v[..., 2], 1e-6)))
    o = linalg.world_to_frame(n, wo)
    cos_o = jnp.maximum(o[..., 2], 0.0)
    diff = (1.0 - spec_weight) * cos_o / jnp.pi
    h = linalg.normalize(v + o)
    d = _d_ggx(h[..., 2], alpha)
    g = _g1(v[..., 2], alpha) * _g1(jnp.maximum(o[..., 2], 1e-6), alpha)
    spec = spec_weight * d * g / jnp.maximum(4.0 * v[..., 2], 1e-8)
    return diff + jnp.where(cos_o > 0.0, spec, 0.0)
