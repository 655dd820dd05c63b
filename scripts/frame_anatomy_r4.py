"""Round-4 frame anatomy: time each stage of the bench config on chip.

Decomposes the headline bench frame (city, 1080p, MCPG light config)
into its frame_core stages, each jitted and timed in isolation (same
decomposition as docs/perf_notes_r3.md's production table, but for the
light config).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, warm=2, runs=3):
    for _ in range(warm):
        r = fn(*args)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    return (time.perf_counter() - t0) / runs, r


def main():
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import city
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.render.gbuffer import render_gbuffer
    from merian_quake_tpu.render.mcpg import MCPGConfig
    from merian_quake_tpu.render.mcpg.surface import render_mcpg_surface
    from merian_quake_tpu.render.mcpg.updates import (
        apply_updates_compact, compact_queues, queue_gidx,
    )
    from merian_quake_tpu.renderer import init_state, render_frame

    W, H, spp, mpl = 1920, 1080, 2, 3
    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=W, height=H, spp=spp, max_path_length=mpl,
        integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    mcfg = MCPGConfig()
    state = init_state(config, mcfg)
    uniforms = bundle.uniforms

    # warm the guiding state with real frames (12 like bench.py)
    for w in range(12):
        uniforms = uniforms._replace(frame=jnp.uint32(100 + w))
        state, outputs = render_frame(
            accel, bundle.atlas, uniforms, config, state, mcfg
        )
    _ = float(outputs["ldr"].ravel()[0])

    dt_full, _ = timeit(
        jax.jit(
            lambda u, s: render_frame(accel, bundle.atlas, u, config, s, mcfg),
        ),
        uniforms, state,
    )
    print(f"full frame: {dt_full*1e3:.0f} ms", flush=True)

    f_gbuf = jax.jit(
        lambda u: render_gbuffer(accel, bundle.atlas, u, config)
    )
    dt_g, gbuf = timeit(f_gbuf, uniforms)
    print(f"gbuffer (primary trace+shade): {dt_g*1e3:.0f} ms", flush=True)

    f_surf = jax.jit(
        lambda u, ms, gb: render_mcpg_surface(
            accel, bundle.atlas, u, config, mcfg, ms, gb
        )
    )
    dt_s, res = timeit(f_surf, uniforms, state.mcpg, gbuf)
    print(f"mcpg surface (bounce+guide+shade): {dt_s*1e3:.0f} ms", flush=True)

    surf_groups = spp * (mpl - 1)
    gidx = queue_gidx(res.updates.data.shape[0], surf_groups, W, H, 0, H)

    def upd(ms, res):
        cq = compact_queues(res, mcfg, gidx, gidx, n_shards=1)
        return apply_updates_compact(
            jnp.uint32(config.seed), ms, cq, uniforms, mcfg
        )

    dt_u, _ = timeit(jax.jit(upd), state.mcpg, res)
    print(f"update compact+apply: {dt_u*1e3:.0f} ms", flush=True)

    dt_p = 0.0
    if state.svgf is not None:
        from merian_quake_tpu.post.svgf import svgf
        from merian_quake_tpu.post.taa import taa
        from merian_quake_tpu.post.fxaa import fxaa

        def post(svgf_state, irr, gb, taa_prev):
            new_svgf, filtered = svgf(
                svgf_state, irr[..., :3], irr[..., 3], gb.mv, gb.normal,
                gb.linear_z, gb.z_grad, gb.albedo[..., :3],
            )
            ldr = taa(taa_prev, filtered, gb.mv)
            return fxaa(ldr)

        dt_p, _ = timeit(
            jax.jit(post), state.svgf, res.irradiance, gbuf, state.taa_prev
        )
        print(f"post (svgf+taa+fxaa): {dt_p*1e3:.0f} ms", flush=True)
    print(
        f"sum of stages: {(dt_g+dt_s+dt_u+dt_p)*1e3:.0f} ms "
        f"(full {dt_full*1e3:.0f})"
    )


if __name__ == "__main__":
    main()
