"""Round-5 perf probe: interior-node hierarchy A/B on the chip.

Measures the sorted bounce sweep (the frame's dominant cost) with the
node level OFF/ON at headline scale (~17k tris, 260 clusters) and map
scale (~281k tris, 4399 clusters through the partitioned resident
sweep). Usage:

    python scripts/perf_probe_r5.py [headline] [map]
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

from perf_probe_r4 import make_rays, timeit  # noqa: E402


def probe(bundle, label):
    from merian_quake_tpu.accel.build import build_accel
    from merian_quake_tpu.accel.woop import intersect_woop

    accel = build_accel(bundle.scene, bundle.atlas)
    T = accel.woop_w.shape[0] // 3
    nc = accel.cluster_lo.shape[0]
    n = 1920 * 1080 * 2
    o, d, alive = make_rays(accel, bundle, n)
    t_max = jnp.where(alive, 1e4, -1.0)
    print(f"[{label}] tris={T} clusters={nc} rays={n}", flush=True)
    for P in (0, 16, 32):
        f = jax.jit(
            lambda o, d, tm, P=P: intersect_woop(
                accel, o, d, 0.0, tm, ray_block=4096, sort_rays=True,
                node_clusters=P,
            )
        )
        dt = timeit(f, o, d, t_max)
        print(
            f"  node_clusters={P}: {dt*1e3:.1f} ms"
            f" ({n/dt/1e6:.1f} Mrays/s)", flush=True,
        )


def main():
    from merian_quake_tpu.models.procedural import city

    which = set(sys.argv[1:]) or {"headline", "map"}
    if "headline" in which:
        probe(city(), "headline 17k")
    if "map" in which:
        probe(city(n_buildings=28000, seed=11), "map 281k")


if __name__ == "__main__":
    main()
