"""Image error metrics + reference-render workflow helpers.

Equivalent of the reference's offline analysis scripts
(scripts/error_plot.py: RMSE/MAE convergence vs a reference;
scripts/combine_images.py: averaging runs into a reference;
scripts/expose.py: exposure-matched comparison).
"""
from __future__ import annotations

import numpy as np


def rmse(img, ref) -> float:
    return float(np.sqrt(np.mean((np.asarray(img) - np.asarray(ref)) ** 2)))


def mae(img, ref) -> float:
    return float(np.mean(np.abs(np.asarray(img) - np.asarray(ref))))


def relmse(img, ref, eps: float = 1e-2) -> float:
    """Relative MSE — the paper's headline metric (error_plot.py:27-60)."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    return float(np.mean((img - ref) ** 2 / (ref**2 + eps)))


def relmse_trimmed(img, ref, eps: float = 1e-2, trim: float = 1e-3) -> float:
    """relMSE with the top ``trim`` fraction of per-value errors
    discarded. Path-tracing estimators are heavy-tailed (a handful of
    low-pdf fireflies can dominate the plain mean at modest budgets —
    measured: plain PT's image MEAN varies ±30% seed-to-seed on an
    occluded-light scene at 48×1 spp); the trimmed statistic tracks the
    bulk convergence the plain metric drowns out."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    e = ((img - ref) ** 2 / (ref**2 + eps)).ravel()
    k = max(int(e.size * (1.0 - trim)), 1)
    return float(np.mean(np.partition(e, k - 1)[:k]))


def combine_images(images) -> np.ndarray:
    """Average independent runs into a reference (combine_images.py)."""
    return np.mean([np.asarray(i, np.float64) for i in images], axis=0)


def exposure_match(img, ref) -> np.ndarray:
    """Scale img so its mean luminance matches ref (expose.py)."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    s = ref.mean() / max(img.mean(), 1e-12)
    return img * s


def convergence_series(estimates, ref, metric=relmse):
    """Per-iteration error curve for log-log convergence plots."""
    return [metric(e, ref) for e in estimates]
