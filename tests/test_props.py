"""Live property editing tests (configuration.hpp:30-39 headlessly)."""
import json
import os
import time

from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.render.mcpg import MCPGConfig
from merian_quake_tpu.utils.props import PropertyConsole, apply_patches


def test_file_watch_emits_changed_keys(tmp_path):
    p = tmp_path / "props.json"
    p.write_text(json.dumps({"spp": 1}))
    console = PropertyConsole(str(p))
    assert console.poll() == {}  # startup contents are the baseline
    time.sleep(0.01)
    p.write_text(json.dumps({"spp": 2, "mcpg.surf_bsdf_p": 0.3}))
    os.utime(p)
    got = console.poll()
    assert got == {"spp": 2, "mcpg.surf_bsdf_p": 0.3}
    assert console.poll() == {}  # no change → no patches
    time.sleep(0.01)
    p.write_text(json.dumps({"spp": 2, "mcpg.surf_bsdf_p": 0.15}))
    os.utime(p)
    assert console.poll() == {"mcpg.surf_bsdf_p": 0.15}


def test_apply_patches_pipeline_vs_reconnect():
    cfg = RenderConfig(width=64, height=32, spp=1, integrator="mcpg")
    mcfg = MCPGConfig()
    # pipeline rebuild: static value change, no state re-init
    cfg2, mcfg2, reinit, unknown = apply_patches(
        cfg, mcfg, {"spp": 4, "mcpg.surf_bsdf_p": 0.33}
    )
    assert cfg2.spp == 4
    assert mcfg2.surf_bsdf_p == 0.33
    assert not reinit and not unknown
    # reconnect: resolution / integrator / state-size changes
    cfg3, _, reinit3, _ = apply_patches(cfg2, mcfg2, {"height": 64})
    assert reinit3 and cfg3.height == 64
    _, mcfg4, reinit4, _ = apply_patches(
        cfg3, mcfg2, {"mcpg.lc_size": 2048}
    )
    assert reinit4 and mcfg4.lc_size == 2048
    # type coercion follows the old field's type
    cfg5, _, _, _ = apply_patches(cfg3, mcfg4, {"spp": 2.0})
    assert cfg5.spp == 2 and isinstance(cfg5.spp, int)
    # unknown keys reported, not fatal
    _, _, _, unk = apply_patches(cfg5, mcfg4, {"nope.nothing": 1})
    assert unk == ["nope.nothing"]


def test_volume_scope():
    from merian_quake_tpu.render.mcpg.volume import VolumeConfig

    mcfg = MCPGConfig(volume=VolumeConfig())
    cfg = RenderConfig(width=32, height=16, integrator="mcpg")
    _, mcfg2, _, unk = apply_patches(
        cfg, mcfg, {"volume.volume_spp": 3, "volume.dist_guide_p": 0.5}
    )
    assert not unk
    assert mcfg2.volume.volume_spp == 3
    assert mcfg2.volume.dist_guide_p == 0.5


def test_end_to_end_live_reconfig(tmp_path):
    """Changing surf_bsdf_p mid-run takes effect without restart
    (VERDICT r2 #9 done criterion): the patched static config produces
    a different compiled pipeline + different image."""
    import numpy as np

    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import cornell_box
    from merian_quake_tpu.renderer import init_state, render_frame

    bundle = cornell_box()
    cfg = RenderConfig(width=32, height=16, spp=1, integrator="mcpg")
    mcfg = MCPGConfig(
        mc_adaptive_size=1 << 10, mc_static_size=1 << 8, lc_size=1 << 10
    )
    accel = build_accel(bundle.scene, bundle.atlas)
    cfg = cfg._replace(
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas)
    )
    state = init_state(cfg, mcfg)

    import jax.numpy as jnp

    # warm up so the guiding state is non-empty (with empty grids every
    # path falls back to BSDF sampling and surf_bsdf_p is inert)
    for i in range(3):
        u = bundle.uniforms._replace(frame=jnp.uint32(i))
        state, _ = render_frame(accel, bundle.atlas, u, cfg, state, mcfg)
    frozen = state

    p = tmp_path / "props.json"
    console = PropertyConsole(str(p))
    u = bundle.uniforms._replace(frame=jnp.uint32(3))
    _, out0 = render_frame(accel, bundle.atlas, u, cfg, frozen, mcfg)

    p.write_text(json.dumps({"mcpg.surf_bsdf_p": 1.0}))
    os.utime(p)
    patches = console.poll()
    assert patches == {"mcpg.surf_bsdf_p": 1.0}
    cfg, mcfg, reinit, _ = apply_patches(cfg, mcfg, patches)
    assert not reinit and mcfg.surf_bsdf_p == 1.0
    _, out1 = render_frame(accel, bundle.atlas, u, cfg, frozen, mcfg)

    # same frame index, same input state — only the patched knob
    # differs → measurably different integrator output
    d = float(
        np.abs(
            np.asarray(out1["irradiance"]) - np.asarray(out0["irradiance"])
        ).max()
    )
    assert d > 0.0
