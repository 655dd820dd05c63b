"""Benchmark: flagship MCPG frame on a map-scale scene, real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Matches the BASELINE.md headline setup as closely as procedural content
allows: 1920×1080, MCPG integrator, max path length 3, on a ~17k-
triangle scene (ad_azad-class triangle count). Baseline target is
1 Grays/s on a v5e-8; this runs on ONE chip, so vs_baseline measures
against the 125 Mrays/s per-chip share (pixel-grid sharding is
embarrassingly parallel, verified bit-identical in tests).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the bench kernels are stable between runs
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _bench_config(bundle, accel, config, mcfg, warm=3, timed=4):
    from merian_quake_tpu.renderer import init_state, render_frame

    state = init_state(config, mcfg)
    uniforms = bundle.uniforms
    # warmup / compile: the remote platform runs a freshly compiled
    # program ~3x slower for its first few calls before settling
    # (docs/perf_notes_r1b.md pitfall log) — warm up with 3 frames
    for w in range(warm):
        uniforms = uniforms._replace(frame=jnp.uint32(100 + w))
        state, outputs = render_frame(
            accel, bundle.atlas, uniforms, config, state, mcfg
        )
        _ = float(outputs["ldr"].ravel()[0])
    t0 = time.perf_counter()
    for i in range(timed):
        uniforms = uniforms._replace(frame=jnp.uint32(i + 1))
        state, outputs = render_frame(
            accel, bundle.atlas, uniforms, config, state, mcfg
        )
    # real device->host transfer: block_until_ready does not reliably
    # wait on the remote platform (docs/perf_notes_r1b.md)
    _ = float(outputs["ldr"].ravel()[0])
    return (time.perf_counter() - t0) / timed


def main():
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import city
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.render.mcpg import MCPGConfig
    from merian_quake_tpu.render.mcpg.config import production_config

    width, height, spp, mpl = 1920, 1080, 2, 3
    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=width,
        height=height,
        spp=spp,
        max_path_length=mpl,
        integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )

    # headline: the tuned light config (continuity with earlier rounds).
    # warm=12: the round-3 maturity-gated defensive probability makes
    # cold-state frames trace a nearly-unguided (slower, sky-heavy) ray
    # population; a dozen warm frames move the chains toward the
    # converged steady state that real gameplay spends its time in.
    dt = _bench_config(bundle, accel, config, MCPGConfig(), warm=12)

    # reference default quality: 33.6M MC states + 4M light cache +
    # 2 spp volume single scattering w/ distance guiding
    # (default_config.json:626-660, render_mcpg.hpp:137-150)
    prod = production_config()
    dt_prod = _bench_config(bundle, accel, config, prod, warm=6, timed=3)

    # ray segments per frame: 1 primary + spp × (mpl - 1) bounce rays
    rays = width * height * (1 + spp * (mpl - 1))
    # the volume pass adds volume_spp scatter-direction rays per pixel
    rays_prod = rays + width * height * prod.volume.volume_spp
    mrays_per_s = rays / dt / 1e6
    target_mrays = 1000.0 / 8.0  # per-chip share of 1 Grays/s on v5e-8
    print(
        json.dumps(
            {
                "metric": "mcpg_ray_throughput_1080p_17k_tris_single_chip",
                "value": round(mrays_per_s, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_s / target_mrays, 4),
                "detail": {
                    "frame_ms": round(dt * 1000, 2),
                    "resolution": f"{width}x{height}",
                    "spp": spp,
                    "max_path_length": mpl,
                    "integrator": "mcpg",
                    "scene": "procedural city (~17k tris, sky+sun+emissives)",
                    "triangles": int(accel.scene.num_tris),
                    "device": str(jax.devices()[0]),
                    "production_scale": {
                        "frame_ms": round(dt_prod * 1000, 2),
                        "mrays_per_s": round(rays_prod / dt_prod / 1e6, 2),
                        "mc_states": prod.mc_total_size,
                        "light_cache": prod.lc_size,
                        "volume_spp": prod.volume.volume_spp,
                        "dist_guide_p": prod.volume.dist_guide_p,
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
