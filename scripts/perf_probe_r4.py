"""Round-4 perf probe: on-chip anatomy of the trace sweep.

Measures the Woop packet sweep on a representative 1080p bounce-ray
population (city scene, CLUSTER_SIZE=64 tables) so kernel variants can
be compared in isolation from the full frame. Run on the real chip:

    python scripts/perf_probe_r4.py [variant ...]

Variants: base (sorted bounce trace), rb2048/rb4096/rb8192 (ray block),
nocull (per-visit cost with culling defeated), primary (coherent
packets), anyhit (shadow sweep).
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


def make_rays(accel, bundle, n_rays):
    """Bounce-like population: primary hits + cosine-sampled dirs."""
    from merian_quake_tpu.accel.intersect import trace_nearest
    from merian_quake_tpu.ops import camera as cam_ops, linalg, rng

    W, H = 1920, 1080
    u = bundle.uniforms
    px = jnp.arange(W * H)
    x = (px % W).astype(jnp.float32)
    y = (px // W).astype(jnp.float32)
    d = cam_ops.ray_dir(x, y, W, H, u.cam_u, u.cam_w, u.fov_tan_half)
    o = jnp.broadcast_to(u.cam_x[None], (W * H, 3))
    hr = trace_nearest(accel, None, o, d, 0.0, 1e4)
    t = jnp.where(hr.hit, hr.t, 1.0)
    pos = o + d * (t * 0.999)[:, None]
    # surface normal from winning triangle
    tri = jnp.maximum(hr.tri, 0)
    attr = jnp.take(accel.tri_attr[:, 0:9], tri, axis=0)
    nrm = linalg.normalize(
        jnp.cross(attr[:, 6:9] - attr[:, 0:3], attr[:, 3:6] - attr[:, 0:3])
    )
    nrm = jnp.where(
        (linalg.dot(nrm, d) > 0)[:, None], -nrm, nrm
    )
    st = rng.seed_pixel(px % W, px // W, 11, 7)
    st, xi = rng.uniform2(st)
    wo = linalg.sample_cos(nrm, xi)
    reps = (n_rays + W * H - 1) // (W * H)
    o_all = jnp.tile(pos, (reps, 1))[:n_rays]
    d_all = jnp.tile(wo, (reps, 1))[:n_rays]
    alive = jnp.tile(hr.hit, (reps,))[:n_rays]
    return o_all, d_all, alive


def timeit(fn, *args, warm=2, runs=4):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    return (time.perf_counter() - t0) / runs


def main():
    from merian_quake_tpu.accel.build import build_accel
    from merian_quake_tpu.accel.woop import intersect_woop, intersect_woop_any
    from merian_quake_tpu.models.procedural import city

    which = set(sys.argv[1:]) or {"base", "rb2048", "rb8192", "nocull"}
    bundle = city()
    accel = build_accel(bundle.scene, bundle.atlas)
    T = accel.woop_w.shape[0] // 3
    nc = accel.cluster_lo.shape[0]
    n = 1920 * 1080 * 2  # 2-spp bounce population
    o, d, alive = make_rays(accel, bundle, n)
    t_max = jnp.where(alive, 1e4, -1.0)
    print(f"tris={T} clusters={nc} rays={n}")

    def run(rb, **kw):
        f = jax.jit(
            lambda o, d, tm: intersect_woop(
                accel, o, d, 0.0, tm, ray_block=rb, sort_rays=True, **kw
            )
        )
        dt = timeit(f, o, d, t_max)
        print(
            f"  rb={rb} {kw}: {dt*1e3:.1f} ms "
            f"({n/dt/1e6:.1f} Mrays/s)"
        )
        return dt

    if "base" in which:
        print("sorted bounce sweep (default rb=4096):")
        run(4096)
    if "rb2048" in which:
        run(2048)
    if "rb8192" in which:
        run(8192)
    if "nocull" in which:
        os.environ["MQ_WOOP_NOCULL"] = "1"
        print("culling defeated (per-visit cost):")
        nb = n // 4096
        dt = run(4096)
        visits = nb * nc
        print(
            f"  visits={visits} -> {dt/visits*1e6:.2f} us/visit "
            f"(C={T//nc}, B=4096)"
        )
        del os.environ["MQ_WOOP_NOCULL"]
    if "primary" in which:
        print("coherent primary packets:")
        px = jnp.arange(n % (1920 * 1080) or 1920 * 1080)
        run(4096)
    if "anyhit" in which:
        f = jax.jit(
            lambda o, d, tm: intersect_woop_any(
                accel, o, d, 0.05, tm, ray_block=4096, sort_rays=True
            )
        )
        dt = timeit(f, o, d, t_max)
        print(f"  anyhit rb=4096: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
