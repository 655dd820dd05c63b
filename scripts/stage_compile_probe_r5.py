"""Round-5: compile-latency anatomy of the frame's stages.

The remote compile service runs full-frame 1080p programs in ~50+ min
but probe-sized programs in minutes. If the frame's STAGES compile
fast separately, a staged-jit frame driver (gbuffer | surface+volume |
update apply | post) fixes the iteration-latency problem without
changing any math. This probe times jit-compile+first-run of the
surface pass (the monster stage) and the update apply at 1080p.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import city
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.render.gbuffer import render_gbuffer
    from merian_quake_tpu.render.mcpg import MCPGConfig
    from merian_quake_tpu.render.mcpg.surface import render_mcpg_surface
    from merian_quake_tpu.renderer import init_state

    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    W, H = 1920, 1080
    config = RenderConfig(
        width=W, height=H, spp=2, max_path_length=3, integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    mcfg = MCPGConfig()
    state = init_state(config, mcfg)
    u = bundle.uniforms

    t0 = time.perf_counter()
    gb = jax.jit(
        lambda un: render_gbuffer(accel, bundle.atlas, un, config)
    )
    gbuf = gb(u)
    jax.block_until_ready(gbuf.irradiance)
    print(f"gbuffer stage compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)

    t0 = time.perf_counter()
    surf = jax.jit(
        lambda un, mc, g: render_mcpg_surface(
            accel, bundle.atlas, un, config, mcfg, mc, g
        )
    )
    res = surf(u, state.mcpg, gbuf)
    jax.block_until_ready(res.irradiance)
    print(f"surface stage compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    main()
