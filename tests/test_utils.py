import json
import os

import numpy as np

from merian_quake_tpu.utils.metrics import (
    combine_images,
    convergence_series,
    exposure_match,
    mae,
    relmse,
    rmse,
)
from merian_quake_tpu.utils.profiler import Profiler
from merian_quake_tpu.utils.image import load_pfm, load_png, save_pfm, save_png


def test_metrics_basics():
    ref = np.full((4, 4, 3), 2.0)
    img = ref + 0.5
    assert abs(rmse(img, ref) - 0.5) < 1e-6
    assert abs(mae(img, ref) - 0.5) < 1e-6
    assert relmse(ref, ref) == 0.0
    assert relmse(img, ref) > 0.0
    half = exposure_match(ref * 0.5, ref)
    np.testing.assert_allclose(half, ref)
    series = convergence_series([ref + 1.0, ref + 0.5, ref + 0.25], ref)
    assert series[0] > series[1] > series[2]
    np.testing.assert_allclose(combine_images([ref, ref + 1.0]), ref + 0.5)


def test_profiler_report():
    p = Profiler(report_every=2)
    with p.cpu("step"):
        pass
    with p.device("trace") as h:
        h.append(np.zeros(3))
    assert p.frame_done() is None
    r = p.frame_done()
    assert r is not None and "step" in r and "trace" in r


def test_image_roundtrip(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 1, (16, 24, 3)) * 255).astype(
        np.uint8
    )
    p = str(tmp_path / "x.png")
    save_png(p, img)
    back = load_png(p)
    np.testing.assert_array_equal(back, img)
    hdr = np.random.default_rng(1).uniform(0, 10, (8, 12, 3)).astype(np.float32)
    pf = str(tmp_path / "x.pfm")
    save_pfm(pf, hdr)
    np.testing.assert_allclose(load_pfm(pf), hdr, rtol=1e-6)


def test_mcpg_dumps(tmp_path):
    import jax.numpy as jnp

    from merian_quake_tpu.render.mcpg import MCPGConfig, init_mcpg_state
    from merian_quake_tpu.render.mcpg.dumps import dump_lc, dump_mc

    cfg = MCPGConfig(mc_adaptive_size=256, mc_static_size=64, lc_size=128)
    st = init_mcpg_state(cfg)
    st = st._replace(
        mc=st.mc._replace(f=st.mc.f.at[7, 3].set(3.0)),
        lc=st.lc._replace(N=st.lc.N.at[5].set(2)),
    )
    mc_path = str(tmp_path / "mc.json")
    lc_path = str(tmp_path / "lc.json")
    assert dump_mc(st, mc_path) == 1
    assert dump_lc(st, lc_path) == 1
    rows = [json.loads(l) for l in open(mc_path)]
    assert rows[0]["index"] == 7 and rows[0]["sum_w"] == 3.0
    meta = json.loads(open(lc_path).readline())["meta"]
    assert meta["active_cells"] == 1
