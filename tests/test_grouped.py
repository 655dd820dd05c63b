"""Wavefront-regrouped traversal (accel/grouped.py) vs the XLA oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from merian_quake_tpu.accel import build_accel, intersect
from merian_quake_tpu.models.types import build_scene_from_soup


def _soup_accel(rng, t=256, spread=40.0, size=8.0):
    c = rng.uniform(-spread, spread, (t, 1, 3))
    tri = c + rng.uniform(-size, size, (t, 3, 3))
    scene = build_scene_from_soup(
        tri[:, 0].astype(np.float32),
        tri[:, 1].astype(np.float32),
        tri[:, 2].astype(np.float32),
    )
    return build_accel(scene)


def _grouped(acc, o, d, t_min, t_max, ray_block=256, rounds=3,
             init_t=None, simple=None):
    from merian_quake_tpu.accel.grouped import intersect_grouped
    from merian_quake_tpu.accel.woop import _pack_rays, _recompute_tuv, BIG
    from merian_quake_tpu.accel.intersect import HitRecord

    n = o.shape[0]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    rays = _pack_rays(o, d, t_min_b, t_max_b, ray_block)
    if simple is None:
        simple = isinstance(t_min, (int, float)) and float(t_min) == 0.0
    init = None
    if init_t is not None:
        pad = (-n) % ray_block
        t0v = jnp.concatenate([init_t, jnp.full((pad,), BIG)]) if pad else init_t
        init = (t0v[None], jnp.full((1, rays.shape[1]), -1, jnp.int32))
    out, idx = intersect_grouped(
        rays, acc.woop_w, acc.cluster_lo, acc.cluster_hi,
        ray_block=ray_block, interpret=True, rounds=rounds, init=init,
        simple=simple, fastdiv=False,
    )
    t, tri = out[0, :n], idx[0, :n]
    t, u, v = _recompute_tuv(acc, o, d, t, tri)
    return HitRecord(t=t, tri=tri, u=u, v=v)


def test_grouped_matches_oracle_including_misses(rng):
    acc = _soup_accel(rng)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = o.at[: n // 2].set(jnp.asarray([500.0, 500.0, 500.0]))
    d[: n // 2] = np.abs(d[: n // 2])  # guaranteed misses
    d = jnp.asarray(d)
    hg = _grouped(acc, o, d, 0.0, 1e4)
    ho = intersect(acc, o, d, 0.0, 1e4)
    np.testing.assert_array_equal(np.asarray(hg.tri), np.asarray(ho.tri))
    hit = np.asarray(ho.tri) >= 0
    assert hit.any() and (~hit).any()
    np.testing.assert_allclose(
        np.asarray(hg.t)[hit], np.asarray(ho.t)[hit], rtol=1e-4, atol=1e-3
    )


def test_grouped_one_round_plus_finish_is_exact(rng):
    """Even with a 1-round budget the straggler finish must make the
    result exact (rays needing several clusters go through the legacy
    sweep warm-started)."""
    acc = _soup_accel(rng, t=512, spread=80.0)
    n = 512
    o = jnp.asarray(rng.uniform(-90, 90, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hg = _grouped(acc, o, d, 0.0, 1e4, rounds=1)
    ho = intersect(acc, o, d, 0.0, 1e4)
    np.testing.assert_array_equal(np.asarray(hg.tri), np.asarray(ho.tri))


def test_grouped_respects_masked_dead_rays(rng):
    """t_max <= 0 rays (masked dead paths) must report misses."""
    acc = _soup_accel(rng)
    n = 256
    o = jnp.zeros((n, 3))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    t_max = jnp.where(jnp.arange(n) % 2 == 0, 1e4, -1.0)
    hg = _grouped(acc, o, d, 0.0, t_max, simple=True)
    dead = np.arange(n) % 2 == 1
    assert (np.asarray(hg.tri)[dead] == -1).all()
    ho = intersect(acc, o, d, 0.0, 1e4)
    live = ~dead
    np.testing.assert_array_equal(
        np.asarray(hg.tri)[live], np.asarray(ho.tri)[live]
    )


def test_grouped_traced_tmin(rng):
    """Per-ray traced t_min (the alpha re-trace pattern) uses the
    general epilogue and must skip hits below t_min."""
    acc = _soup_accel(rng)
    n = 256
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    ho = intersect(acc, o, d, 0.0, 1e4)
    # skip past the first hit: t_min just above it
    t_min = jnp.where(ho.tri >= 0, ho.t + 1e-2, 0.0)
    hg = _grouped(acc, o, d, t_min, 1e4, simple=False)
    ho2 = intersect(acc, o, d, t_min, 1e4)
    np.testing.assert_array_equal(np.asarray(hg.tri), np.asarray(ho2.tri))


def test_exact_cull_matches_interval_cull(rng, monkeypatch):
    """The sorted (bounce) entry point uses the exact per-ray union
    cull; it must agree with the interval-cull sweep exactly."""
    from merian_quake_tpu.accel.woop import intersect_woop

    acc = _soup_accel(rng)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    he = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=256, interpret=True, sort_rays=True
    )
    monkeypatch.setenv("MQ_NO_EXACT_CULL", "1")
    hl = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=256, interpret=True, sort_rays=True
    )
    np.testing.assert_array_equal(np.asarray(he.tri), np.asarray(hl.tri))
    np.testing.assert_allclose(
        np.asarray(he.t), np.asarray(hl.t), rtol=1e-5, atol=1e-4
    )
    ho = intersect(acc, o, d, 0.0, 1e4)
    np.testing.assert_array_equal(np.asarray(he.tri), np.asarray(ho.tri))


def test_grouped_through_intersect_woop_optin(rng, monkeypatch):
    """MQ_GROUPED=1 routes sort_rays through the wavefront path."""
    from merian_quake_tpu.accel.woop import intersect_woop

    acc = _soup_accel(rng)
    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    monkeypatch.setenv("MQ_GROUPED", "1")
    hg = intersect_woop(
        acc, o, d, 0.0, 1e4, ray_block=256, interpret=True, sort_rays=True
    )
    ho = intersect(acc, o, d, 0.0, 1e4)
    np.testing.assert_array_equal(np.asarray(hg.tri), np.asarray(ho.tri))
