import os

import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.accel import build_accel, intersect, trace_nearest
from merian_quake_tpu.accel.intersect import trace_visibility
from merian_quake_tpu.models import materials, procedural
from merian_quake_tpu.models.types import build_scene_from_soup


def _single_tri_accel(v0, v1, v2):
    scene = build_scene_from_soup(
        np.asarray([v0], np.float32),
        np.asarray([v1], np.float32),
        np.asarray([v2], np.float32),
    )
    return build_accel(scene)


def test_front_hit_and_backface_cull():
    # Triangle in the x=10 plane. Reference normal n = cross(v2-v0, v1-v0).
    v0, v1, v2 = [10, -1, -1], [10, 1, -1], [10, 0, 1]
    acc = _single_tri_accel(v0, v1, v2)
    n = np.cross(np.subtract(v2, v0), np.subtract(v1, v0))
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hr = intersect(acc, o, d, 0.0, 100.0)
    if n[0] < 0:  # normal faces the ray origin → front hit
        assert int(hr.tri[0]) == 0
        np.testing.assert_allclose(float(hr.t[0]), 10.0, atol=1e-4)
    else:
        assert int(hr.tri[0]) == -1
    # From the other side: opposite behavior.
    hr2 = intersect(acc, jnp.asarray([[20.0, 0.0, 0.0]]), -d, 0.0, 100.0)
    assert (int(hr2.tri[0]) == -1) != (int(hr.tri[0]) == -1)


def test_barycentrics_match_position():
    v0, v1, v2 = [5, 0, 0], [5, 4, 0], [5, 0, 4]
    acc = _single_tri_accel(v0, v1, v2)
    # aim at point v0 + 0.25*(v1-v0) + 0.5*(v2-v0) = (5, 1, 2)
    o = jnp.asarray([[0.0, 1.0, 2.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hr = intersect(acc, o, d, 0.0, 100.0)
    hit = int(hr.tri[0]) == 0
    if not hit:  # winding may cull; flip
        acc = _single_tri_accel(v0, v2, v1)
        hr = intersect(acc, o, d, 0.0, 100.0)
        assert int(hr.tri[0]) == 0
        np.testing.assert_allclose(float(hr.u[0]), 0.5, atol=1e-5)
        np.testing.assert_allclose(float(hr.v[0]), 0.25, atol=1e-5)
    else:
        np.testing.assert_allclose(float(hr.u[0]), 0.25, atol=1e-5)
        np.testing.assert_allclose(float(hr.v[0]), 0.5, atol=1e-5)


def test_nearest_of_many():
    # winding chosen so normals face -x (toward the ray origin)
    scene = build_scene_from_soup(
        np.asarray([[10, -1, -1], [4, -1, -1]], np.float32),
        np.asarray([[10, 1, -1], [4, 1, -1]], np.float32),
        np.asarray([[10, 0, 1], [4, 0, 1]], np.float32),
    )
    acc = build_accel(scene)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hr = intersect(acc, o, d, 0.0, 100.0)
    np.testing.assert_allclose(float(hr.t[0]), 4.0, atol=1e-4)


def test_box_scene_center_rays_hit_walls():
    bundle = procedural.cornell_box()
    acc = build_accel(bundle.scene, bundle.atlas)
    cam = np.asarray(bundle.uniforms.cam_x)
    o = jnp.asarray([cam, cam, cam, cam], jnp.float32)
    d = jnp.asarray(
        [[1, 0, 0], [0, 0, 1], [0, 0, -1], [0, 1, 0]], jnp.float32
    )
    hr = trace_nearest(acc, bundle.atlas, o, d, 0.0, materials.T_MAX)
    assert bool(hr.hit.all())
    t = np.asarray(hr.t)
    np.testing.assert_allclose(t[0], 512.0 - cam[0], atol=0.01)  # far wall
    np.testing.assert_allclose(t[1], 256.0 - cam[2], atol=0.01)  # ceiling
    np.testing.assert_allclose(t[2], cam[2], atol=0.01)  # floor
    np.testing.assert_allclose(t[3], 512.0 - cam[1], atol=0.01)  # left wall


def test_alpha_grate_passthrough():
    bundle = procedural.outdoor_court()
    acc = build_accel(bundle.scene, bundle.atlas)
    # Ray through a grate hole: holes are where bars are absent.
    # Bars at (x%8)<3 in texture space; pick UV region in a hole and
    # verify the ray continues to the far wall instead of stopping.
    o = jnp.asarray([[600.0, 150.0, 80.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hr = trace_nearest(acc, bundle.atlas, o, d, 0.0, materials.T_MAX)
    assert bool(hr.hit[0])
    t = float(hr.t[0])
    # must either stop at one of the grates (~40 or ~240 away: bar) or
    # reach the far wall (1024-600-1): never in between
    assert t > 39.0
    flags = int(np.asarray(acc.scene.flags)[int(hr.tri[0])])
    assert flags in (materials.MAT_FLAGS_NONE,)
    # Shooting many parallel rays: some pass through both grates to the
    # far wall (hole), some stop at the first grate (bar).
    ys = np.linspace(110, 290, 64)
    o = jnp.asarray([[600.0, y, 80.0] for y in ys], jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (64, 3))
    hr = trace_nearest(acc, bundle.atlas, o, d, 0.0, materials.T_MAX)
    t = np.asarray(hr.t)
    assert (np.abs(t - 40.0) < 1.5).any(), "some rays should hit the near grate"
    assert (t > 400).any(), "some rays should pass through grate holes"


def test_visibility_through_box():
    bundle = procedural.cornell_box()
    acc = build_accel(bundle.scene, bundle.atlas)
    a = jnp.asarray([[60.0, 256.0, 130.0]], jnp.float32)
    b = jnp.asarray([[200.0, 256.0, 130.0]], jnp.float32)  # open air
    c = jnp.asarray([[345.0, 335.0, 60.0]], jnp.float32)  # inside tall block
    assert bool(trace_visibility(acc, bundle.atlas, a, b)[0])
    assert not bool(trace_visibility(acc, bundle.atlas, a, c)[0])


def test_cluster_aabbs_cover_candidates():
    bundle = procedural.cornell_box()
    acc = build_accel(bundle.scene, bundle.atlas)
    cand = np.asarray(acc.candidate)
    v = np.stack(
        [np.asarray(acc.scene.v0), np.asarray(acc.scene.v1), np.asarray(acc.scene.v2)],
        axis=1,
    )
    C = acc.num_clusters
    from merian_quake_tpu.models.types import CLUSTER_SIZE

    v = v.reshape(C, CLUSTER_SIZE * 3, 3)
    m = cand.reshape(C, CLUSTER_SIZE).repeat(3, 1).reshape(C, CLUSTER_SIZE * 3)
    lo = np.asarray(acc.cluster_lo)
    hi = np.asarray(acc.cluster_hi)
    for ci in range(C):
        pts = v[ci][m[ci]]
        if len(pts) == 0:
            continue
        assert (pts >= lo[ci] - 1e-3).all()
        assert (pts <= hi[ci] + 1e-3).all()


def test_mip_selection_far_surfaces():
    """Far hits with ray cones must sample coarser mips (checker → grey)."""
    import jax.numpy as jnp
    from merian_quake_tpu.models.procedural import _SoupBuilder, _checker_tex, _const_tex
    from merian_quake_tpu.models.atlas import pack_textures, sample_mip
    from merian_quake_tpu.models.types import default_uniforms
    from merian_quake_tpu.render.trace import trace_ray

    b = _SoupBuilder()
    b.quad((0, -5000, -10), (10000, 0, 0), (0, 10000, 0), uv_scale=(500, 500), texnum=1)
    scene = b.build()
    atlas = pack_textures(
        [_const_tex((255,) * 3, 1), _checker_tex((255, 255, 255), (0, 0, 0), 32, 8)]
    )
    assert atlas.num_levels > 1
    acc = build_accel(scene, atlas)
    u = default_uniforms(cam_x=(0, 0, 100), cam_w=(1, 0, -0.02))
    o = jnp.asarray([[0.0, 0.0, 100.0], [0.0, 0.0, 100.0]])
    d = jnp.asarray([[0.9999, 0.0, -0.0141], [0.1, 0.0, -0.995]])  # far, near
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    res = trace_ray(acc, atlas, u, o, d, pixel_cone=jnp.float32(0.001))
    far, near = np.asarray(res.hit.albedo)
    # far grazing hit: averaged checker ≈ mid-grey; near hit: near 0 or 1
    assert 0.2 < far[0] < 0.8, far
    assert near[0] < 0.2 or near[0] > 0.8, near


def test_scene_features_alpha_flag_and_no_alpha_fast_path():
    """scene_features(atlas) resolves has_alpha_tris; the tex=None fast
    path in trace_nearest must agree with the alpha loop on scenes
    without alpha-test triangles."""
    import jax
    import jax.numpy as jnp

    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.accel.intersect import trace_nearest
    from merian_quake_tpu.models import materials
    from merian_quake_tpu.models.procedural import cornell_box

    bundle = cornell_box()
    feats = scene_features(bundle.scene, bundle.uniforms, bundle.atlas)
    assert feats.has_alpha_tris is False  # procedural textures are opaque
    # without the atlas the flag stays conservatively True
    assert scene_features(bundle.scene, bundle.uniforms).has_alpha_tris

    acc = build_accel(bundle.scene, bundle.atlas)
    key = jax.random.PRNGKey(3)
    o = jax.random.uniform(key, (256, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(jax.random.PRNGKey(4), (256, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    slow = trace_nearest(acc, bundle.atlas, o, d, 0.0, materials.T_MAX)
    fast = trace_nearest(acc, None, o, d, 0.0, materials.T_MAX)
    np.testing.assert_array_equal(np.asarray(slow.tri), np.asarray(fast.tri))
    np.testing.assert_allclose(np.asarray(slow.t), np.asarray(fast.t))


def test_woop_kernel_matches_oracle_including_misses(rng):
    """Interpret-mode Woop kernel vs the XLA oracle on a random soup,
    with rays that hit nothing (regression: an all-miss tile once
    committed a false hit through the packed-min epilogue)."""
    from merian_quake_tpu.accel.woop import intersect_woop

    t = 256
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-8, 8, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # half the rays point far away from the scene: guaranteed misses
    o = o.at[: n // 2].set(jnp.asarray([500.0, 500.0, 500.0]))
    d[: n // 2] = np.abs(d[: n // 2])  # away from the origin-centered soup
    d = jnp.asarray(d)
    hw = intersect_woop(acc, o, d, 0.0, 1e4, ray_block=256, interpret=True)
    ho = intersect(acc, o, d, 0.0, 1e4)
    np.testing.assert_array_equal(np.asarray(hw.tri), np.asarray(ho.tri))
    hit = np.asarray(ho.tri) >= 0
    assert (~hit[: n // 2]).any()  # the scenario really exercises misses
    np.testing.assert_allclose(
        np.asarray(hw.t)[hit], np.asarray(ho.t)[hit], rtol=1e-4, atol=1e-3
    )


def test_woop_streaming_kernel_matches_resident(rng):
    """The HBM-streaming sweep (big scenes) and the VMEM-resident sweep
    (small scenes) must agree exactly; tests the deep prefetch pipeline
    issue/wait/drain bookkeeping on the streaming path."""
    from merian_quake_tpu.accel import woop
    from merian_quake_tpu.accel.woop import intersect_woop

    t = 512
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-6, 6, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    res = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=128, interpret=True, resident=True
    )
    stream = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=128, interpret=True, resident=False
    )
    np.testing.assert_array_equal(
        np.asarray(stream.tri), np.asarray(res.tri)
    )
    np.testing.assert_array_equal(np.asarray(stream.t), np.asarray(res.t))


def test_woop_partitioned_sweep_matches_resident(rng, monkeypatch):
    """Round-5 partitioned resident sweep (_sweep_parts: tables larger
    than the VMEM budget split into parts, chained through per-ray
    best-t) must agree exactly with the single resident sweep —
    exercises the winner-index chaining (idx >= 0 ⇔ this part improved)
    and the any-hit chaining (occluded rays keep best_t = 0)."""
    from merian_quake_tpu.accel.woop import (
        intersect_woop, intersect_woop_any,
    )

    t = 1024
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-6, 6, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    n = 256
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    res = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=128, interpret=True, resident=True
    )
    occ_res = intersect_woop_any(
        acc, o, d, 1e-3, 1e4, ray_block=128, interpret=True, resident=True
    )
    monkeypatch.setenv("MQ_PART_TRIS", "256")  # 4 parts of 4 clusters
    part = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(part.tri), np.asarray(res.tri))
    np.testing.assert_array_equal(np.asarray(part.t), np.asarray(res.t))
    occ_part = intersect_woop_any(
        acc, o, d, 1e-3, 1e4, ray_block=128, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(occ_part), np.asarray(occ_res)
    )
    assert np.asarray(res.tri).max() >= 0  # hits present
    assert (np.asarray(res.tri) < 0).any()  # misses present


def test_woop_anyhit_matches_oracle_occlusion(rng):
    """Interpret-mode any-hit sweep vs oracle nearest-hit occlusion on
    a random soup (no sky/alpha, so the semantics coincide exactly),
    with per-ray t_max and guaranteed-miss rays."""
    from merian_quake_tpu.accel.woop import intersect_woop_any

    t = 256
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-8, 8, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    assert acc.woop_w_shadow is acc.woop_w  # no sky/alpha: shared table
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.asarray(
        rng.uniform(1.0, 200.0, (n,)).astype(np.float32)
    )
    occ = intersect_woop_any(
        acc, o, d, 1e-3, t_max, ray_block=256, interpret=True
    )
    ho = intersect(acc, o, d, 1e-3, t_max)
    # oracle occlusion: any committed front-facing hit within range.
    # boundary hits with t within one epilogue ulp of t_max may differ
    # (the any-hit test is dz-premultiplied) — exclude exact-boundary.
    oh = np.asarray(ho.tri) >= 0
    tt = np.asarray(ho.t)
    tm = np.asarray(t_max)
    clear = ~oh | (np.abs(tt - tm) > 1e-3 * np.maximum(tm, 1.0))
    np.testing.assert_array_equal(
        np.asarray(occ)[clear], oh[clear]
    )
    assert oh.any() and (~oh).any()


def test_trace_visibility_alpha_and_shadow_tables(rng):
    """build_accel produces shadow/alpha tables with the right sharing
    and coverage; alpha-only cluster AABBs cover the alpha tris."""
    from tests.test_accel import build_scene_from_soup  # self-import ok

    t = 256
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-8, 8, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    assert acc.woop_w_alpha is None  # no alpha-tested tris
    assert acc.woop_w_shadow is acc.woop_w


def test_woop_proxy_anyhit_matches_oracle(rng):
    """Scenes ≥4096 tris build a largest-opaque-triangle proxy table;
    the any-hit sweep pre-resolves occlusion against it (valid: proxy
    tris are genuine occluders) and must still match the oracle."""
    from merian_quake_tpu.accel.woop import intersect_woop_any

    t = 4096
    c = rng.uniform(-40, 40, (t, 1, 3))
    # mixed scales so the proxy really selects the big ones
    scale = rng.uniform(0.5, 2.0, (t, 1, 1)) * np.where(
        rng.uniform(size=(t, 1, 1)) < 0.05, 12.0, 1.0
    )
    tri = c + rng.uniform(-1, 1, (t, 3, 3)) * scale
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    assert acc.woop_w_proxy is not None
    assert acc.cluster_lo_proxy.shape[0] >= 2
    n = 512
    o = jnp.asarray(rng.uniform(-50, 50, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.asarray(rng.uniform(1.0, 200.0, (n,)).astype(np.float32))
    occ = intersect_woop_any(
        acc, o, d, 1e-3, t_max, ray_block=256, interpret=True
    )
    ho = intersect(acc, o, d, 1e-3, t_max)
    oh = np.asarray(ho.tri) >= 0
    tt, tm = np.asarray(ho.t), np.asarray(t_max)
    clear = ~oh | (np.abs(tt - tm) > 1e-3 * np.maximum(tm, 1.0))
    np.testing.assert_array_equal(np.asarray(occ)[clear], oh[clear])
    assert oh.any() and (~oh).any()


def test_woop_target_key_sorted_matches_oracle(rng):
    """Round-3 target-key scheduling (per-ray top-3 cluster sort key +
    exact per-block union te): the sorted resident path must agree with
    the oracle exactly, including masked (t_max<=0) rays and misses."""
    from merian_quake_tpu.accel.woop import intersect_woop

    t = 1024  # 8 clusters
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-8, 8, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    n = 1024
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.asarray(
        np.where(rng.random(n) < 0.2, -1.0, 1e4).astype(np.float32)
    )
    os.environ["MQ_TARGET_KEY"] = "1"
    os.environ["MQ_WOOP_COMPACT"] = "64"
    try:
        hw = intersect_woop(
            acc, o, d, 0.0, t_max, ray_block=256, interpret=True,
            sort_rays=True,
        )
    finally:
        del os.environ["MQ_TARGET_KEY"]
        del os.environ["MQ_WOOP_COMPACT"]
    ho = intersect(acc, o, d, 0.0, t_max)
    np.testing.assert_array_equal(np.asarray(hw.tri), np.asarray(ho.tri))
    hit = np.asarray(ho.tri) >= 0
    assert hit.any() and (~hit).any()
    np.testing.assert_allclose(
        np.asarray(hw.t)[hit], np.asarray(ho.t)[hit], rtol=1e-4, atol=1e-3
    )

def test_woop_node_hierarchy_matches_flat(rng):
    """Round-5 interior-node resident sweep (_kernel_resident_nodes:
    node-level visit list + per-cluster descent) must agree EXACTLY
    with the flat resident sweep and the oracle — including partial
    trailing nodes (nc not divisible by nodes_per), masked rays,
    misses, the compacted-tile path inside a node, and the sorted
    bounce path / any-hit wiring."""
    from merian_quake_tpu.accel.woop import (
        intersect_woop, intersect_woop_any,
    )

    t = 64 * 30  # 30 clusters: nodes_per=8 -> 4 nodes, partial last
    c = rng.uniform(-40, 40, (t, 1, 3))
    tri = c + rng.uniform(-6, 6, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    acc = build_accel(scene)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.asarray(
        np.where(rng.random(n) < 0.2, -1.0, 1e4).astype(np.float32)
    )
    flat = intersect_woop(
        acc, o, d, 0.0, t_max, ray_block=128, interpret=True,
        resident=True, node_clusters=0,
    )
    ho = intersect(acc, o, d, 0.0, t_max)
    np.testing.assert_array_equal(np.asarray(flat.tri), np.asarray(ho.tri))
    for P, compact in ((8, 0), (16, 0), (8, 32)):
        node = intersect_woop(
            acc, o, d, 0.0, t_max, ray_block=128, interpret=True,
            resident=True, node_clusters=P, compact=compact,
        )
        np.testing.assert_array_equal(
            np.asarray(node.tri), np.asarray(flat.tri)
        )
        np.testing.assert_array_equal(
            np.asarray(node.t), np.asarray(flat.t)
        )
    # sorted bounce path with the node kernel underneath
    node_s = intersect_woop(
        acc, o, d, 0.0, t_max, ray_block=128, interpret=True,
        resident=True, node_clusters=8, sort_rays=True,
    )
    np.testing.assert_array_equal(
        np.asarray(node_s.tri), np.asarray(flat.tri)
    )
    # any-hit through the node kernel
    occ_flat = intersect_woop_any(
        acc, o, d, 1e-3, 1e4, ray_block=128, interpret=True, resident=True
    )
    os.environ["MQ_NODE_CLUSTERS"] = "8"
    try:
        occ_node = intersect_woop_any(
            acc, o, d, 1e-3, 1e4, ray_block=128, interpret=True,
            resident=True,
        )
    finally:
        del os.environ["MQ_NODE_CLUSTERS"]
    np.testing.assert_array_equal(
        np.asarray(occ_node), np.asarray(occ_flat)
    )
    assert (np.asarray(flat.tri) >= 0).any()
    assert (np.asarray(flat.tri) < 0).any()
