"""Round-5: isolate the gbuffer pass's cost at 1080p on chip.

r4 measured the gbuffer node at ~373 ms of the ~990 ms headline frame
(after the sky bake) — over a third of the frame for the COHERENT
primary pass. This probe splits it: bare coherent primary trace
(trace_nearest path: fine table, rb 1024) vs coarse-table / ray-block
variants vs the full gbuffer node (trace + mips + MVs + packing).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf_probe_r4 import timeit  # noqa: E402


def main():
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.accel.woop import intersect_woop
    from merian_quake_tpu.models.procedural import city
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.ops import camera as cam_ops
    from merian_quake_tpu.render.gbuffer import render_gbuffer

    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    W, H = 1920, 1080
    u = bundle.uniforms
    config = RenderConfig(
        width=W, height=H, spp=2, max_path_length=3, integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )

    px = jnp.arange(W * H)
    x = (px % W).astype(jnp.float32)
    y = (px // W).astype(jnp.float32)

    def mk(fine, rb):
        def bare(cx):
            d = cam_ops.ray_dir(x, y, W, H, u.cam_u, u.cam_w,
                                u.fov_tan_half)
            o = jnp.broadcast_to(cx[None], (W * H, 3))
            hr = intersect_woop(accel, o, d, 0.0, 1e4, ray_block=rb,
                                fine=fine)
            return hr.t
        return jax.jit(bare)

    for fine, rb in ((True, 1024), (False, 1024), (False, 4096),
                     (False, 8192)):
        dt = timeit(mk(fine, rb), u.cam_x)
        print(f"primary fine={int(fine)} rb={rb}: {dt*1e3:.1f} ms "
              f"({W*H/dt/1e6:.1f} Mrays/s)", flush=True)

    def gbuf(un):
        return render_gbuffer(accel, bundle.atlas, un, config).hits.pos

    dt_g = timeit(jax.jit(gbuf), u)
    print(f"full gbuffer node 1080p: {dt_g*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
