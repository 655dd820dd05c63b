"""relMSE certification harness (utils/certify.py)."""
import numpy as np

from merian_quake_tpu.utils.certify import certify_presets

import pytest

# compile-heavy integration tier (VERDICT r4 weak #6): run with the full
# suite / preflight; the core tier is pytest -m 'not slow'
pytestmark = pytest.mark.slow


def test_certify_config1_small():
    """config1 (plain PT): tiny-scale certification must produce a
    finite relMSE that DECREASES with more frames (convergence)."""
    r8 = certify_presets(
        names=["config1"], scale=0.08, frames=8, ref_frames=64
    )["config1"]
    assert np.isfinite(r8["relmse"]) and r8["relmse"] > 0.0
    assert r8["ratio_vs_pt"] == 1.0  # PT vs itself at equal budget
    r2 = certify_presets(
        names=["config1"], scale=0.08, frames=2, ref_frames=64
    )["config1"]
    assert r8["relmse"] < r2["relmse"]


def test_certify_mcpg_court_within_factor():
    """config5's integrator (MCPG + volume, now certified fog-aware) at
    equal budget must stay within a small factor of unguided transport
    on the sun-lit court (the defensive-mixture tax scene; the real
    certification runs at larger scale on the chip). Round-2 gate was
    < 10, round-3 < 2.5/1.6; the round-4 volume maturity gate + exact
    per-draw MIS marginal measure ~1.03 here (deterministic at this
    scale), so the gate pins near-parity."""
    r = certify_presets(
        names=["config5"], scale=0.05, frames=6, ref_frames=48, ref_runs=2
    )["config5"]
    assert np.isfinite(r["relmse"])
    assert r["volume_included"] is True
    assert r["ratio_vs_pt"] < 1.15, r
    assert r["ratio_trimmed_vs_pt"] < 1.15, r


def test_certify_guiding_bound_alcove_beats_pt():
    """config6 (occluded-light alcove + MCPG): guiding must BEAT plain
    PT at equal budget — the criterion certify's docstring declares for
    guiding-bound scenes (VERDICT r2 #2 done criterion)."""
    r = certify_presets(
        names=["config6"], scale=0.1, frames=12, ref_frames=64, ref_runs=2
    )["config6"]
    assert np.isfinite(r["relmse"])
    assert r["ratio_vs_pt"] < 1.0, r
