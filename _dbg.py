import jax, jax.numpy as jnp, numpy as np
from merian_quake_tpu.accel.build import build_accel
from merian_quake_tpu.accel.woop import intersect_woop
from merian_quake_tpu.models.procedural import cornell_box
bundle = cornell_box(); accel = build_accel(bundle.scene, bundle.atlas)
key = jax.random.PRNGKey(0)
N = 4096
o = jax.random.uniform(key, (N,3), minval=-0.8, maxval=0.8)
d = jax.random.normal(jax.random.PRNGKey(1), (N,3)); d = d/jnp.linalg.norm(d,axis=-1,keepdims=True)
hs = jax.jit(lambda o,d: intersect_woop(accel,o,d,0.0,1e4,sort_rays=True))(o,d)
hu = jax.jit(lambda o,d: intersect_woop(accel,o,d,0.0,1e4,sort_rays=False))(o,d)
ts, tu = np.asarray(hs.tri), np.asarray(hu.tri)
print("tri mismatches:", (ts!=tu).sum(), "/", N)
print("sorted tri sample:", ts[:10])
print("unsorted tri sample:", tu[:10])
print("t mismatches:", (np.abs(np.asarray(hs.t)-np.asarray(hu.t))>1e-5).sum())
