import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
"""Stage-by-stage timing of the headline MCPG bench frame on real TPU."""
import time

import jax
import jax.numpy as jnp

from merian_quake_tpu.accel.build import build_accel, scene_features
from merian_quake_tpu.models.procedural import city
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.render.mcpg import MCPGConfig, apply_updates
from merian_quake_tpu.render.mcpg.surface import render_mcpg_surface
from merian_quake_tpu.render.gbuffer import render_gbuffer
from merian_quake_tpu.renderer import init_state, render_frame

print("devices:", jax.devices())

width, height, spp, mpl = 1920, 1080, 2, 3
bundle = city()
accel = build_accel(bundle.scene, bundle.atlas)
print("tris:", accel.tri_attr.shape[0])
config = RenderConfig(
    width=width, height=height, spp=spp, max_path_length=mpl,
    integrator="mcpg",
    features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
)
mcfg = MCPGConfig()
state = init_state(config, mcfg)
uniforms = bundle.uniforms


def timeit(name, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:9.1f} ms")
    return out


gbuf_fn = jax.jit(lambda u: render_gbuffer(accel, bundle.atlas, u, config))
gbuf = timeit("gbuffer", gbuf_fn, uniforms)

surf_fn = jax.jit(
    lambda u, st, gb: render_mcpg_surface(
        accel, bundle.atlas, u, config, mcfg, st, gb
    )
)
res = timeit("mcpg surface", surf_fn, uniforms, state.mcpg, gbuf)

upd_fn = jax.jit(
    lambda st, r, u: apply_updates(jnp.uint32(config.seed), st, r, u, mcfg)
)
timeit("apply_updates", upd_fn, state.mcpg, res, uniforms)

timeit("full frame", lambda u: render_frame(
    accel, bundle.atlas, u, config, state, mcfg), uniforms)
