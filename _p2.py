import time, jax, jax.numpy as jnp
from merian_quake_tpu.accel.build import build_accel, scene_features
from merian_quake_tpu.accel import woop
from merian_quake_tpu.models.procedural import city
from merian_quake_tpu.render import layout
from merian_quake_tpu.render.gbuffer import render_gbuffer
from merian_quake_tpu.render.hit import decompress_hit
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.ops import rng as rng_ops, bsdf
bundle = city(); accel = build_accel(bundle.scene, bundle.atlas)
feats = scene_features(bundle.scene, bundle.uniforms, bundle.atlas)
config = RenderConfig(width=1920,height=1080,spp=2,max_path_length=3,integrator="mcpg",features=feats)
uni = bundle.uniforms
gbuf = jax.jit(lambda u: render_gbuffer(accel, bundle.atlas, u, config))(uni)
hit = decompress_hit(gbuf.hits)
pxi,pyi = layout.gen_pixels(1920,1080)
st0 = rng_ops.seed_pixel(pxi,pyi,uni.frame,config.seed)
rs, u3 = rng_ops.uniform3(st0)
wo = bsdf.sample(hit.wi, hit.normal, bsdf.roughness_to_alpha(hit.roughness), u3)
origin = jax.block_until_ready(hit.pos - hit.wi*1e-3)
n = origin.shape[0]

def timeit(name, f, *a):
    r = jax.block_until_ready(jax.jit(f)(*a))
    t0 = time.perf_counter()
    for _ in range(5): r = jax.block_until_ready(jax.jit(f)(*a))
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.1f} ms")

timeit("keys", lambda o,d: woop._sort_keys(accel,o,d).sum(), origin, wo)
timeit("keys+argsort", lambda o,d: jnp.argsort(woop._sort_keys(accel,o,d)).sum(), origin, wo)
perm = jax.block_until_ready(jnp.argsort(woop._sort_keys(accel,origin,wo)))
timeit("packed take (N,6)", lambda od,p: jnp.take(od, p, axis=0).sum(), jnp.concatenate([origin,wo],1), perm)
timeit("scatter-back (N,4)", lambda x,p: jnp.zeros((n,4)).at[p].set(x).sum(), jnp.zeros((n,4)), perm)
timeit("argsort(perm) [old inverse]", lambda p: jnp.argsort(p).sum(), perm)
