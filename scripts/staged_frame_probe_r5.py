"""Round-5: staged frame driver on chip — time-to-first-1080p-frame.

The monolithic render_frame compiles in ~50+ min on the remote service
on degraded days; render_frame_staged compiles four stage programs.
This prints per-stage first-call latency and the steady staged frame
(which must match the monolithic steady frame — same ops)."""
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
    from merian_quake_tpu.render.mcpg import MCPGConfig
    from merian_quake_tpu.renderer import init_state, render_frame_staged

    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=1920, height=1080, spp=2, max_path_length=3,
        integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    mcfg = MCPGConfig()
    state = init_state(config, mcfg)
    u = bundle.uniforms
    t0 = time.perf_counter()
    state, out = render_frame_staged(
        accel, bundle.atlas, u, config, state, mcfg
    )
    float(out["ldr"].ravel()[0])
    print(f"staged first 1080p frame (incl. all stage compiles): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)
    for f in range(1, 5):
        u = u._replace(frame=jnp.uint32(f))
        state, out = render_frame_staged(
            accel, bundle.atlas, u, config, state, mcfg
        )
    float(out["ldr"].ravel()[0])
    t0 = time.perf_counter()
    timed = 4
    for f in range(5, 5 + timed):
        u = u._replace(frame=jnp.uint32(f))
        state, out = render_frame_staged(
            accel, bundle.atlas, u, config, state, mcfg
        )
    float(out["ldr"].ravel()[0])
    print(f"staged steady frame: {(time.perf_counter()-t0)/timed*1e3:.1f} "
          f"ms", flush=True)


if __name__ == "__main__":
    main()
