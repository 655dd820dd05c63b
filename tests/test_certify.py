"""relMSE certification harness (utils/certify.py)."""
import numpy as np

from merian_quake_tpu.utils.certify import certify_presets


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


def test_certify_mcpg_guiding_not_catastrophic():
    """config5's integrator (MCPG) at equal budget must stay within a
    loose factor of plain PT on the court scene (the real certification
    runs at full scale on the chip; this is the harness smoke test)."""
    r = certify_presets(
        names=["config5"], scale=0.05, frames=4, ref_frames=48
    )["config5"]
    assert np.isfinite(r["relmse"])
    assert r["ratio_vs_pt"] < 10.0, r
