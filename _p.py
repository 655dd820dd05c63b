import time, jax, jax.numpy as jnp
from merian_quake_tpu.accel.build import build_accel, scene_features
from merian_quake_tpu.accel.woop import intersect_woop
from merian_quake_tpu.models.procedural import city
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.render import layout
from merian_quake_tpu.render.gbuffer import render_gbuffer
from merian_quake_tpu.render.hit import decompress_hit
from merian_quake_tpu.ops import rng as rng_ops, bsdf

W,H = 1920,1080
bundle = city(); accel = build_accel(bundle.scene, bundle.atlas)
feats = scene_features(bundle.scene, bundle.uniforms, bundle.atlas)
config = RenderConfig(width=W,height=H,spp=2,max_path_length=3,integrator="mcpg",features=feats)
uni = bundle.uniforms
gbuf = jax.jit(lambda u: render_gbuffer(accel, bundle.atlas, u, config))(uni)
hit = decompress_hit(gbuf.hits)
pxi,pyi = layout.gen_pixels(W,H)
st0 = rng_ops.seed_pixel(pxi,pyi,uni.frame,config.seed)
rs, u3 = rng_ops.uniform3(st0)
wo = bsdf.sample(hit.wi, hit.normal, bsdf.roughness_to_alpha(hit.roughness), u3)
origin = jax.block_until_ready(hit.pos - hit.wi*1e-3)

def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(5): r = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.1f} ms")

timeit("full trace (tmax=1e4)", jax.jit(lambda o,d: intersect_woop(accel, o, d, 0.0, 1e4, sort_rays=True).t.sum()), origin, wo)
timeit("all culled (tmax=1e-3)", jax.jit(lambda o,d: intersect_woop(accel, o, d, 0.0, 1e-3, sort_rays=True).t.sum()), origin, wo)
timeit("sort machinery only? unsorted tiny", jax.jit(lambda o,d: intersect_woop(accel, o, d, 0.0, 1e-3, sort_rays=False).t.sum()), origin, wo)
timeit("RB=4096 full", jax.jit(lambda o,d: intersect_woop(accel, o, d, 0.0, 1e4, ray_block=4096, sort_rays=True).t.sum()), origin, wo)
timeit("RB=4096 culled", jax.jit(lambda o,d: intersect_woop(accel, o, d, 0.0, 1e-3, ray_block=4096, sort_rays=True).t.sum()), origin, wo)
