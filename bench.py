"""Benchmark: flagship MCPG frame on a map-scale scene, real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Matches the BASELINE.md headline setup as closely as procedural content
allows: 1920×1080, MCPG integrator, max path length 3, on a ~17k-
triangle scene (ad_azad-class triangle count). Baseline target is
1 Grays/s on a v5e-8; this runs on ONE chip, so vs_baseline measures
against the 125 Mrays/s per-chip share (pixel-grid sharding is
embarrassingly parallel, verified bit-identical in tests).

Round-4 additions (VERDICT r3 #2/#5/#7):
- cold AND steady-state frame times are reported separately (the
  guiding-maturity transient moved the headline in r3; now quality
  fixes and kernel speed are decoupled in the tracking),
- a second tracked scene (~280k tris) exercises the HBM-streaming
  traversal — the path real AD-class maps take,
- vs_prev compares against the newest BENCH_r*.json and flags a >10%
  headline regression.
"""
from __future__ import annotations

import glob
import json
import os
import re
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the bench kernels are stable between runs
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(outputs):
    # real device->host transfer: block_until_ready does not reliably
    # wait on the remote platform (docs/perf_notes_r1b.md)
    return float(outputs["ldr"].ravel()[0])


def _bench_phases(bundle, accel, config, mcfg, phases, timed=3):
    """Render one warm sequence, timing `timed` frames at each phase
    boundary. ``phases``: dict name -> start frame index. Returns
    {name: seconds/frame}. A single sequence measures cold and
    steady-state behavior of the SAME state trajectory (VERDICT r3 #7)."""
    from merian_quake_tpu.renderer import init_state, render_frame

    state = init_state(config, mcfg)
    uniforms = bundle.uniforms
    out = {}
    frame = 0
    last = max(phases.values())
    # compile + settle: the remote platform runs a freshly compiled
    # program ~3x slower for its first few calls (perf_notes_r1b.md)
    for _ in range(2):
        uniforms = uniforms._replace(frame=jnp.uint32(1000 + frame))
        state, outputs = render_frame(
            accel, bundle.atlas, uniforms, config, state, mcfg
        )
        _sync(outputs)
    state = init_state(config, mcfg)  # reset: phase 0 is truly cold
    for name, start in sorted(phases.items(), key=lambda kv: kv[1]):
        while frame < start:
            uniforms = uniforms._replace(frame=jnp.uint32(frame))
            state, outputs = render_frame(
                accel, bundle.atlas, uniforms, config, state, mcfg
            )
            frame += 1
        _sync(outputs if frame else {"ldr": jnp.zeros(1)})
        t0 = time.perf_counter()
        for _ in range(timed):
            uniforms = uniforms._replace(frame=jnp.uint32(frame))
            state, outputs = render_frame(
                accel, bundle.atlas, uniforms, config, state, mcfg
            )
            frame += 1
        _sync(outputs)
        out[name] = (time.perf_counter() - t0) / timed
    return out


def _prev_bench():
    """Newest committed BENCH_r*.json headline value, for the
    regression gate (VERDICT r3 weak #5)."""
    best = None
    for p in sorted(glob.glob("BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if not m:
            continue
        try:
            data = json.load(open(p))
        except Exception:
            continue
        parsed = data.get("parsed", data)
        if isinstance(parsed, dict) and "value" in parsed:
            best = (int(m.group(1)), float(parsed["value"]))
    return best


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

    # one warm sequence, timed at three guiding-maturity phases:
    # cold (frame 2: chains empty, defensive/BSDF-heavy rays), the
    # r1-r3-continuity point (frame 12), steady state (frame 28)
    mcfg = MCPGConfig()
    ph = _bench_phases(
        bundle, accel, config, mcfg,
        {"cold": 2, "warm12": 12, "steady": 28}, timed=4,
    )
    dt = ph["warm12"]  # headline continuity with earlier rounds

    # reference default quality: 33.6M MC states + 4M light cache +
    # 2 spp volume single scattering w/ distance guiding
    # (default_config.json:626-660, render_mcpg.hpp:137-150)
    prod = production_config()
    dt_prod = _bench_phases(
        bundle, accel, config, prod, {"warm6": 6}, timed=3
    )["warm6"]

    # map-scale scene (~280k tris): forces the HBM-streaming sweep —
    # the path AD-class maps take (BASELINE configs 4-5); light config
    mega = city(n_buildings=28000, seed=11)
    accel_m = build_accel(mega.scene, mega.atlas)
    config_m = config._replace(
        features=scene_features(mega.scene, mega.uniforms, mega.atlas)
    )
    dt_mega = _bench_phases(
        mega, accel_m, config_m, mcfg, {"warm6": 6}, timed=3
    )["warm6"]

    # ray segments per frame: 1 primary + spp × (mpl - 1) bounce rays
    rays = width * height * (1 + spp * (mpl - 1))
    rays_prod = rays + width * height * prod.volume.volume_spp
    mrays_per_s = rays / dt / 1e6
    target_mrays = 1000.0 / 8.0  # per-chip share of 1 Grays/s on v5e-8
    prev = _prev_bench()
    vs_prev = None
    regression = False
    if prev is not None:
        vs_prev = round(mrays_per_s / prev[1], 4)
        regression = mrays_per_s < 0.9 * prev[1]
    print(
        json.dumps(
            {
                "metric": "mcpg_ray_throughput_1080p_17k_tris_single_chip",
                "value": round(mrays_per_s, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_s / target_mrays, 4),
                "detail": {
                    "frame_ms": round(dt * 1000, 2),
                    "cold_frame_ms": round(ph["cold"] * 1000, 2),
                    "steady_frame_ms": round(ph["steady"] * 1000, 2),
                    "steady_mrays_per_s": round(
                        rays / ph["steady"] / 1e6, 2
                    ),
                    "vs_prev_round": vs_prev,
                    "regression": regression,
                    "resolution": f"{width}x{height}",
                    "spp": spp,
                    "max_path_length": mpl,
                    "integrator": "mcpg",
                    "scene": "procedural city (~17k tris, sky+sun+emissives)",
                    "triangles": int(accel.scene.num_tris),
                    "device": str(jax.devices()[0]),
                    "map_scale": {
                        "frame_ms": round(dt_mega * 1000, 2),
                        "mrays_per_s": round(rays / dt_mega / 1e6, 2),
                        "triangles": int(accel_m.scene.num_tris),
                        "path": "hbm-streaming sweep",
                    },
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
