"""Monte-Carlo validation of sampling routines against their pdfs.

Strategy (replaces the reference's lack of unit tests, SURVEY.md §4):
for each (sample, pdf) pair check (a) pdf integrates to 1 over its
domain by uniform MC, (b) the sample histogram matches the pdf, and
(c) E[f/pdf] estimators are unbiased for a known integrand.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merian_quake_tpu.ops import bsdf, linalg, phase, transmittance, vmf

N = 200_000


def _uniform_sphere(rng, n):
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("kappa", [0.0, 0.5, 5.0, 200.0])
def test_vmf_pdf_integrates_to_one(rng, kappa):
    w = jnp.asarray(_uniform_sphere(rng, N))
    mu = jnp.asarray([0.3, -0.5, 0.812], jnp.float32)
    mu = mu / jnp.linalg.norm(mu)
    vals = np.asarray(vmf.pdf(w, mu, kappa))
    integral = vals.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05


@pytest.mark.parametrize("kappa", [0.5, 20.0, 1000.0])
def test_vmf_sample_matches_pdf_mean_cos(rng, kappa):
    mu = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    u = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    w = np.asarray(vmf.sample(mu, kappa, u))
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-4)
    # E[cos] = coth(k) - 1/k
    expected = 1.0 / np.tanh(kappa) - 1.0 / kappa
    assert abs(w[:, 2].mean() - expected) < 0.01


def test_vmf_sample_pdf_consistency_chi2(rng):
    """Histogram of sampled cos(theta) vs pdf-predicted bin masses."""
    kappa = 8.0
    mu = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    u = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    w = np.asarray(vmf.sample(mu, kappa, u))
    cos_t = w[:, 2]
    bins = np.linspace(-1, 1, 41)
    hist, _ = np.histogram(cos_t, bins=bins)
    # predicted mass per bin: integral of 2*pi*pdf(cos) dcos
    centers = 0.5 * (bins[:-1] + bins[1:])
    dirs = np.stack(
        [np.sqrt(1 - centers**2), np.zeros_like(centers), centers], -1
    ).astype(np.float32)
    p = np.asarray(vmf.pdf(jnp.asarray(dirs), mu, kappa))
    mass = p * 2 * np.pi * np.diff(bins)
    mass = mass / mass.sum()
    observed = hist / hist.sum()
    assert np.abs(observed - mass).max() < 0.01


def test_transmittance_sampling_unbiased(rng):
    mu_t, max_t = 0.13, 8.0
    xm = float(transmittance.xi_max(mu_t, max_t))
    xi = jnp.asarray(rng.uniform(size=(N,)).astype(np.float32)) * xm
    t = transmittance.sample(xi, mu_t, max_t)
    p = np.asarray(transmittance.pdf(t, mu_t, max_t))
    t = np.asarray(t)
    # Estimate integral of exp(-t) over [0, max_t] by importance sampling.
    est = (np.exp(-t) / p).mean()
    ref = 1.0 - np.exp(-max_t)
    assert abs(est - ref) / ref < 0.01


@pytest.mark.parametrize("g,alpha", [(0.0, 0.0), (0.6, 0.0), (0.6, 4.0), (-0.3, 1.0)])
def test_phase_pdf_normalized(rng, g, alpha):
    cos_t = jnp.asarray(rng.uniform(-1, 1, size=(N,)).astype(np.float32))
    p = np.asarray(phase.draine_pdf(cos_t, g, alpha))
    integral = p.mean() * 2.0 * 2.0 * np.pi  # over sphere: dcos * dphi
    assert abs(integral - 1.0) < 0.02


@pytest.mark.parametrize("g,alpha", [(0.6, 0.0), (0.5, 2.0), (0.8, 10.0)])
def test_draine_sampling_matches_pdf(rng, g, alpha):
    u = jnp.asarray(rng.uniform(size=(N,)).astype(np.float32))
    cos_t = np.asarray(phase.draine_sample_cos(u, g, alpha))
    assert np.all(np.abs(cos_t) <= 1.0)
    bins = np.linspace(-1, 1, 41)
    hist, _ = np.histogram(cos_t, bins=bins)
    # Integrate the pdf inside each bin (midpoint rule is too crude for
    # the sharp forward peak at high g/alpha).
    fine = np.linspace(-1, 1, 40 * 256 + 1)
    pf = np.asarray(phase.draine_pdf(jnp.asarray(fine, jnp.float32), g, alpha))
    seg = 0.5 * (pf[1:] + pf[:-1]) * np.diff(fine)
    mass = seg.reshape(40, 256).sum(axis=1)
    mass = mass / mass.sum()
    observed = hist / hist.sum()
    assert np.abs(observed - mass).max() < 0.012


@pytest.mark.parametrize("roughness", [0.1, 0.4, 0.6, 0.9])
def test_bsdf_pdf_integrates_to_one(rng, roughness):
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    wi = jnp.asarray(linalg.normalize(jnp.asarray([0.4, -0.2, -0.8], jnp.float32)))
    d = _uniform_sphere(rng, N)
    d = d[d[:, 2] > 0]  # hemisphere around n
    alpha = bsdf.roughness_to_alpha(roughness)
    p = np.asarray(bsdf.pdf(wi, jnp.asarray(d), n, alpha))
    integral = p.mean() * 2.0 * np.pi
    assert abs(integral - 1.0) < 0.05


@pytest.mark.parametrize("roughness", [0.2, 0.6])
def test_bsdf_sample_pdf_consistency(rng, roughness):
    """E[1/pdf(wo)] over sampled wo should equal hemisphere area-ish
    (importance-sampling identity: E[g/p] = integral g for g=pdf)."""
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    wi = linalg.normalize(jnp.asarray([0.3, 0.1, -0.95], jnp.float32))
    alpha = bsdf.roughness_to_alpha(roughness)
    u3 = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
    wo = bsdf.sample(wi, n, alpha, u3)
    p = np.asarray(bsdf.pdf(wi, wo, n, alpha))
    wo = np.asarray(wo)
    valid = wo[:, 2] > 1e-3
    # Estimate integral of f_test = cos/pi over hemisphere via IS -> 1.
    f = np.maximum(wo[:, 2], 0.0) / np.pi
    est = np.where(valid, f / np.maximum(p, 1e-12), 0.0).mean()
    assert abs(est - 1.0) < 0.03


def test_bsdf_eval_white_furnace_bound(rng):
    """Energy: integral of eval_times_cos over hemisphere <= 1 (no albedo)."""
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    wi = linalg.normalize(jnp.asarray([0.5, 0.0, -0.866], jnp.float32))
    d = _uniform_sphere(rng, N)
    d = d[d[:, 2] > 0]
    for r in (0.2, 0.6, 1.0):
        alpha = bsdf.roughness_to_alpha(r)
        f = np.asarray(bsdf.eval_times_cos(wi, jnp.asarray(d), n, alpha))
        integral = f.mean() * 2 * np.pi
        assert integral <= 1.05, (r, integral)
        assert integral > 0.5, (r, integral)


def test_sample_cos_distribution(rng):
    n = linalg.normalize(jnp.asarray([1.0, 2.0, 3.0], jnp.float32))
    u = jnp.asarray(rng.uniform(size=(N, 2)).astype(np.float32))
    d = np.asarray(linalg.sample_cos(n, u))
    cos = d @ np.asarray(n)
    assert np.all(cos > -1e-6)
    # E[cos] for cosine-weighted = 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01
