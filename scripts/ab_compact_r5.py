"""Chip A/B: live-lane compaction (surf_live_budget) at headline shape.

Measures the steady frame of the bench headline config (1920x1080,
spp2, mpl3, MCPG light config, ~17k-tri city) with the liveness-sorted
compacted bounce segments ON (budgets from MQ_SURF_BUDGET, default
0.75,0.5) vs the committed OFF number. Prints one JSON line per
variant. The round-5 earlier attempt was abandoned when the remote
compile service ran >1h per program (docs/perf_notes_r5.md); this
script exists to retry cheaply whenever compiles are interactive.
"""
from __future__ import annotations

import json
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
    from merian_quake_tpu.renderer import init_state, render_frame

    budgets = tuple(
        float(x)
        for x in os.environ.get("MQ_SURF_BUDGET", "0.75,0.5").split(",")
    )
    width, height = 1920, 1080
    if os.environ.get("MQ_AB_SMOKE"):
        width, height = 384, 216
    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=width, height=height, spp=2, max_path_length=3,
        integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    variants = [("compact", MCPGConfig(surf_live_budget=budgets))]
    if os.environ.get("MQ_AB_BOTH"):
        variants.insert(0, ("off", MCPGConfig()))
    for name, mcfg in variants:
        state = init_state(config, mcfg)
        uniforms = bundle.uniforms
        t0 = time.perf_counter()
        state, outputs = render_frame(
            accel, bundle.atlas, uniforms, config, state, mcfg
        )
        float(outputs["ldr"].ravel()[0])
        compile_s = time.perf_counter() - t0
        # warm to steady guiding maturity (matches bench steady phase)
        for f in range(1, 12):
            uniforms = uniforms._replace(frame=jnp.uint32(f))
            state, outputs = render_frame(
                accel, bundle.atlas, uniforms, config, state, mcfg
            )
        float(outputs["ldr"].ravel()[0])
        t0 = time.perf_counter()
        timed = 4
        for f in range(12, 12 + timed):
            uniforms = uniforms._replace(frame=jnp.uint32(f))
            state, outputs = render_frame(
                accel, bundle.atlas, uniforms, config, state, mcfg
            )
        float(outputs["ldr"].ravel()[0])
        dt = (time.perf_counter() - t0) / timed
        print(json.dumps({
            "variant": name,
            "budgets": list(budgets) if name == "compact" else [],
            "frame_ms": round(dt * 1000, 2),
            "compile_s": round(compile_s, 1),
            "shape": f"{width}x{height}",
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
