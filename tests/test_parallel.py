"""Pixel-grid sharding: sharded render must match single-device exactly."""
import jax
import numpy as np

from merian_quake_tpu.accel.build import build_accel
from merian_quake_tpu.models.procedural import cornell_box
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.parallel.render import (
    init_state_sharded,
    make_mesh,
    render_frame_sharded,
)
from merian_quake_tpu.renderer import init_state, render_frame


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8
    bundle = cornell_box()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(width=48, height=32, spp=1, max_path_length=3)

    state_1 = init_state(config)
    state_1, out_1 = render_frame(
        accel, bundle.atlas, bundle.uniforms, config, state_1
    )

    mesh = make_mesh(8)
    state_8 = init_state_sharded(mesh, config)
    state_8, ldr_8 = render_frame_sharded(
        mesh, accel, bundle.atlas, bundle.uniforms, config, state_8
    )

    np.testing.assert_allclose(
        np.asarray(ldr_8), np.asarray(out_1["ldr"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(state_8.accum_irradiance),
        np.asarray(state_1.accum_irradiance),
        atol=2e-6,
    )


def test_dryrun_multichip_entrypoint():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(4)
