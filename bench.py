"""Benchmark: path-traced frame on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): ≥1 Grays/s on a v5e-8. This runs on ONE chip, so
vs_baseline is measured against a 1-chip pro-rata target of 125 Mrays/s
(1 Grays/s ÷ 8 chips); the pixel-grid sharding is embarrassingly
parallel, so 8-chip throughput extrapolates ~linearly.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    import numpy as np

    from merian_quake_tpu.accel.build import build_accel
    from merian_quake_tpu.models.procedural import cornell_box
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.renderer import init_state, render_frame

    width, height, spp, mpl = 1920, 1080, 2, 3
    from merian_quake_tpu.accel.build import scene_features

    bundle = cornell_box()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=width, height=height, spp=spp, max_path_length=mpl,
        features=scene_features(bundle.scene, bundle.uniforms),
    )
    state = init_state(config)
    uniforms = bundle.uniforms

    # warmup / compile
    state, outputs = render_frame(accel, bundle.atlas, uniforms, config, state)
    jax.block_until_ready(outputs["ldr"])

    n_frames = 5
    t0 = time.perf_counter()
    for i in range(n_frames):
        uniforms = uniforms._replace(frame=jnp.uint32(i + 1))
        state, outputs = render_frame(accel, bundle.atlas, uniforms, config, state)
    jax.block_until_ready(outputs["ldr"])
    dt = (time.perf_counter() - t0) / n_frames

    # ray segments per frame: 1 primary + spp × (mpl - 1) bounce rays
    rays = width * height * (1 + spp * (mpl - 1))
    mrays_per_s = rays / dt / 1e6
    # single-chip pro-rata share of the 1 Grays/s v5e-8 target
    target_mrays = 1000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "pt_ray_throughput_1080p_single_chip",
                "value": round(mrays_per_s, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_s / target_mrays, 4),
                "detail": {
                    "frame_ms": round(dt * 1000, 2),
                    "resolution": f"{width}x{height}",
                    "spp": spp,
                    "max_path_length": mpl,
                    "scene": "procedural cornell box",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
