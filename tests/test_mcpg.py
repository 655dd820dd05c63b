"""Unit tests for the MCPG guiding machinery."""
import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.render.mcpg import MCPGConfig, init_mcpg_state
from merian_quake_tpu.render.mcpg import grids
from merian_quake_tpu.render.mcpg.light_cache import lc_get, lc_update_batch
from merian_quake_tpu.render.mcpg.surface import (
    LCQueue,
    SurfaceResult,
    UpdateQueue,
    ZeroQueue,
)
from merian_quake_tpu.render.mcpg.updates import apply_updates
from merian_quake_tpu.models.types import default_uniforms
from merian_quake_tpu.ops import rng as rng_ops

CFG = MCPGConfig(mc_adaptive_size=1 << 12, mc_static_size=1 << 10, lc_size=1 << 12)


def _rng(n, seed=1):
    return rng_ops.seed_pixel(jnp.arange(n, dtype=jnp.uint32), 0, 0, seed)


def test_adaptive_cell_locality_and_determinism():
    cam = jnp.asarray([0.0, 0.0, 0.0])
    pos = jnp.asarray([[100.0, 50.0, 20.0]] * 64)
    nrm = jnp.asarray([[0.0, 0.0, 1.0]] * 64)
    r = _rng(64)
    _, buf1, h1 = grids.adaptive_cell(r, pos, nrm, cam, CFG)
    _, buf2, h2 = grids.adaptive_cell(r, pos, nrm, cam, CFG)
    np.testing.assert_array_equal(np.asarray(buf1), np.asarray(buf2))
    # stochastic level/jitter: same position, different streams → a few
    # distinct cells, all within the adaptive partition
    assert len(np.unique(np.asarray(buf1))) > 1
    assert np.asarray(buf1).max() < CFG.mc_adaptive_size


def test_static_cell_offset_range():
    pos = jnp.asarray([[100.0, 50.0, 20.0]] * 16)
    _, buf, h = grids.static_cell(_rng(16), pos, CFG)
    b = np.asarray(buf)
    assert (b >= CFG.mc_adaptive_size).all()
    assert (b < CFG.mc_total_size).all()


def test_finalize_load_collision_reset_and_reprojection():
    s = grids.StateSample(
        id=jnp.asarray([1, 2], jnp.uint32),
        w_tgt=jnp.asarray([[10.0, 0, 0], [10.0, 0, 0]]),
        sum_w=jnp.asarray([2.0, 2.0]),
        w_cos=jnp.asarray([1.0, 1.0]),
        mv=jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]]),
        T=jnp.asarray([0.0, 0.0]),
        N=jnp.asarray([5, 5], jnp.int32),
        hash=jnp.asarray([42, 42], jnp.uint32),
    )
    out = grids.finalize_load(
        s, jnp.asarray([42, 43], jnp.uint32), cl_time=2.0
    )
    # matching hash: target moved by sum_w * dt * mv = 2*2*1 = 4
    np.testing.assert_allclose(np.asarray(out.w_tgt[0]), [14.0, 0, 0])
    assert float(out.sum_w[0]) == 2.0
    # hash mismatch: reset sum_w → no reprojection either
    assert float(out.sum_w[1]) == 0.0
    np.testing.assert_allclose(np.asarray(out.w_tgt[1]), [10.0, 0, 0])


def test_packed_draw_table_roundtrip():
    """gather_state_packed_draw(pack_states_draw(mc, t)) + finalize
    must agree with gather_state(mc) + finalize on every field the
    guided sampler reads, including hash-mismatch and tombstone rows
    (a column-layout or bitcast regression here would only surface as
    silent image degradation)."""
    S = 8
    rng = np.random.default_rng(7)
    f = np.zeros((S, 9), np.float32)
    f[:, 0:3] = rng.normal(size=(S, 3)) * 50.0  # w_tgt
    f[:, 3] = np.abs(rng.normal(size=S)) + 0.1  # sum_w
    f[:, 4] = rng.random(S).astype(np.float32)  # w_cos
    f[:, 5:8] = rng.normal(size=(S, 3))  # mv
    f[:, 8] = rng.random(S) * 3.0  # T
    f[3, 3] = -1.0  # tombstone: must NOT be reprojected
    i = np.zeros((S, 3), np.int32)
    i[:, 0] = rng.integers(0, 2**31 - 1, S)
    i[:, 1] = rng.integers(1, 1000, S)
    i[:, 2] = rng.integers(0, 2**16, S)
    from merian_quake_tpu.render.mcpg.config import MCStates

    mc = MCStates(f=jnp.asarray(f), i=jnp.asarray(i))
    t = jnp.float32(5.5)
    idx = jnp.arange(S, dtype=jnp.int32)
    hashes = jnp.asarray(i[:, 2].astype(np.uint32))
    bad_hashes = hashes.at[5].set(hashes[5] ^ 0x1)  # row 5: mismatch

    packed = grids.pack_states_draw(mc, t)
    a = grids.finalize_load(
        grids.gather_state_packed_draw(packed, idx), bad_hashes, t
    )
    b = grids.finalize_load(grids.gather_state(mc, idx), bad_hashes, t)

    np.testing.assert_array_equal(np.asarray(a.id), np.asarray(b.id))
    np.testing.assert_array_equal(np.asarray(a.N), np.asarray(b.N))
    np.testing.assert_array_equal(np.asarray(a.hash), np.asarray(b.hash))
    np.testing.assert_allclose(
        np.asarray(a.sum_w), np.asarray(b.sum_w), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.w_cos), np.asarray(b.w_cos), rtol=1e-6
    )
    # w_tgt: equal on valid rows and the tombstone (clamped, not
    # reprojected); the hash-mismatch row keeps the pre-applied
    # reprojection (documented deviation; its sum_w is 0 either way)
    valid = np.ones(S, bool)
    valid[5] = False
    np.testing.assert_allclose(
        np.asarray(a.w_tgt)[valid], np.asarray(b.w_tgt)[valid], rtol=1e-5
    )
    assert float(np.asarray(a.sum_w)[5]) == 0.0
    assert float(np.asarray(a.sum_w)[3]) == 0.0  # tombstone reset
    np.testing.assert_allclose(
        np.asarray(a.w_tgt)[3], f[3, 0:3], rtol=1e-6
    )  # tombstone un-reprojected in the packed table too


def test_vmf_kappa_grows_with_mean_cos():
    def mk(w_cos):
        return grids.StateSample(
            id=jnp.asarray([1], jnp.uint32),
            w_tgt=jnp.asarray([[100.0, 0, 0]]),
            sum_w=jnp.asarray([1.0]),
            w_cos=jnp.asarray([w_cos]),
            mv=jnp.zeros((1, 3)),
            T=jnp.zeros((1,)),
            N=jnp.asarray([100], jnp.int32),
            hash=jnp.zeros((1,), jnp.uint32),
        )

    pos = jnp.asarray([[0.0, 0.0, 0.0]])
    _, k_low = grids.state_vmf(mk(0.3), pos, CFG)
    _, k_high = grids.state_vmf(mk(0.95), pos, CFG)
    assert float(k_high[0]) > float(k_low[0]) > 0.0
    mu, _ = grids.state_vmf(mk(0.9), pos, CFG)
    np.testing.assert_allclose(np.asarray(mu[0]), [1.0, 0, 0], atol=1e-6)


def test_light_cache_learns_and_reads_back():
    st = init_mcpg_state(CFG)
    cam = jnp.asarray([0.0, 0.0, 0.0])
    m = 256
    pos = jnp.broadcast_to(jnp.asarray([50.0, 10.0, 5.0]), (m, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3))
    irr = jnp.broadcast_to(jnp.asarray([2.0, 1.0, 0.5]), (m, 3))
    mask = jnp.ones((m,), bool)
    lc = st.lc
    r = _rng(m)
    for _ in range(60):
        r, lc, applied, merged = lc_update_batch(
            r, lc, pos, nrm, irr, mask, cam, CFG
        )
    r2, got = lc_get(_rng(m, seed=9), lc, pos, nrm, cam, CFG)
    got = np.asarray(got)
    hit = got.sum(-1) > 0
    assert hit.mean() > 0.9  # stochastic cell jitter may miss rarely
    np.testing.assert_allclose(got[hit].mean(0), [2.0, 1.0, 0.5], rtol=0.25)


def test_apply_updates_creates_and_matures_chains():
    st = init_mcpg_state(CFG)
    uni = default_uniforms(cl_time=1.0)
    m = 64
    pos = jnp.broadcast_to(jnp.asarray([50.0, 10.0, 5.0]), (m, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3))
    tgt = jnp.broadcast_to(jnp.asarray([50.0, 10.0, 105.0]), (m, 3))
    empty_lc = LCQueue(
        pos=pos, normal=nrm, irr=jnp.zeros((m, 3)), mask=jnp.zeros((m,), bool)
    )
    zeros = ZeroQueue(cell=jnp.zeros((m,), jnp.int32), mask=jnp.zeros((m,), bool))

    # round 1: fresh chains at arbitrary cells
    cells = jnp.arange(m, dtype=jnp.int32)
    upq = UpdateQueue.build(
        cell=cells,
        id=jnp.full((m,), 77, jnp.uint32),
        w=jnp.full((m,), 3.0),
        target=tgt,
        mv=jnp.zeros((m, 3)),
        pos=pos,
        normal=nrm,
        mask=jnp.ones((m,), bool),
        sentinel=CFG.mc_total_size,
    )
    res = SurfaceResult(
        irradiance=jnp.zeros((1, 1, 4)), updates=upq, lc_samples=empty_lc,
        zeros=zeros,
    )
    st1 = apply_updates(jnp.uint32(5), st, res, uni, CFG)
    sw = np.asarray(st1.mc.sum_w)
    assert (sw > 0).sum() >= 1  # winner saved into both grids
    # learned target direction points at tgt
    act = np.where(sw > 0)[0]
    sp = np.asarray(st1.mc.w_tgt)[act] / sw[act][:, None]
    np.testing.assert_allclose(
        sp, np.broadcast_to(np.asarray(tgt)[0], sp.shape), atol=1.0
    )

    # round 2: matching ids at the occupied cells → N grows
    occ = jnp.asarray(act[:8], jnp.int32)
    ids = jnp.take(st1.mc.id, occ)
    m2 = occ.shape[0]
    upq2 = UpdateQueue.build(
        cell=occ,
        id=ids,
        w=jnp.full((m2,), 3.0),
        target=tgt[:m2],
        mv=jnp.zeros((m2, 3)),
        pos=pos[:m2],
        normal=nrm[:m2],
        mask=jnp.ones((m2,), bool),
        sentinel=CFG.mc_total_size,
    )
    res2 = SurfaceResult(
        irradiance=jnp.zeros((1, 1, 4)),
        updates=upq2,
        lc_samples=LCQueue(
            pos=pos[:m2], normal=nrm[:m2], irr=jnp.zeros((m2, 3)),
            mask=jnp.zeros((m2,), bool),
        ),
        zeros=ZeroQueue(
            cell=jnp.zeros((m2,), jnp.int32), mask=jnp.zeros((m2,), bool)
        ),
    )
    st2 = apply_updates(jnp.uint32(6), st1, res2, uni, CFG)
    assert int(np.asarray(st2.mc.N).max()) >= 2


def test_fast_recovery_zeroes_state():
    st = init_mcpg_state(CFG)
    mc = st.mc._replace(f=st.mc.f.at[10, 3].set(5.0))
    st = st._replace(mc=mc)
    m = 4
    res = SurfaceResult(
        irradiance=jnp.zeros((1, 1, 4)),
        updates=UpdateQueue.build(
            cell=jnp.zeros((m,), jnp.int32),
            id=jnp.zeros((m,), jnp.uint32),
            w=jnp.zeros((m,)),
            target=jnp.zeros((m, 3)),
            mv=jnp.zeros((m, 3)),
            pos=jnp.zeros((m, 3)),
            normal=jnp.zeros((m, 3)),
            mask=jnp.zeros((m,), bool),
            sentinel=CFG.mc_total_size,
        ),
        lc_samples=LCQueue(
            pos=jnp.zeros((m, 3)),
            normal=jnp.zeros((m, 3)),
            irr=jnp.zeros((m, 3)),
            mask=jnp.zeros((m,), bool),
        ),
        zeros=ZeroQueue(
            cell=jnp.asarray([10, 0, 0, 0], jnp.int32),
            mask=jnp.asarray([True, False, False, False]),
        ),
    )
    uni = default_uniforms()
    st2 = apply_updates(jnp.uint32(1), st, res, uni, CFG)
    assert float(st2.mc.sum_w[10]) == 0.0


def test_apply_updates_mixed_queue_and_overflow_drop():
    """Compaction keeps the EARLIEST live rows when the queue overflows
    capacity, zero requests ride the suffix, dead rows are ignored."""
    cfg = CFG._replace(update_queue_capacity=8, zero_queue_capacity=4)
    st = init_mcpg_state(cfg)
    mc = st.mc._replace(f=st.mc.f.at[33, 3].set(9.0))
    st = st._replace(mc=mc)
    uni = default_uniforms(cl_time=1.0)
    m = 32
    pos = jnp.broadcast_to(jnp.asarray([50.0, 10.0, 5.0]), (m, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3))
    tgt = jnp.broadcast_to(jnp.asarray([50.0, 10.0, 105.0]), (m, 3))
    # 12 live rows (> capacity 8), interleaved with dead rows; one zero
    live = (jnp.arange(m) % 2 == 0) & (jnp.arange(m) < 24)
    zeros = ZeroQueue(
        cell=jnp.full((m,), 33, jnp.int32),
        mask=(jnp.arange(m) == 25),
    )
    upq = UpdateQueue.build(
        cell=jnp.arange(m, dtype=jnp.int32),
        id=jnp.full((m,), 7, jnp.uint32),
        w=jnp.full((m,), 2.0),
        target=tgt,
        mv=jnp.zeros((m, 3)),
        pos=pos,
        normal=nrm,
        mask=live,
        sentinel=cfg.mc_total_size,
    )
    res = SurfaceResult(
        irradiance=jnp.zeros((1, 1, 4)),
        updates=upq,
        lc_samples=LCQueue(pos=pos, normal=nrm, irr=jnp.zeros((m, 3)),
                           mask=jnp.zeros((m,), bool)),
        zeros=zeros,
    )
    st2 = apply_updates(jnp.uint32(3), st, res, uni, cfg)
    # the zero request landed despite live-row overflow
    assert float(st2.mc.sum_w[33]) == 0.0
    # chains were created from the surviving prefix rows
    assert (np.asarray(st2.mc.sum_w) > 0).sum() >= 1


def test_surface_live_compaction_exact(monkeypatch):
    """Live-lane compaction (round 5): a budgeted segment sorts lanes
    live-first and runs the body on the static prefix only — the
    rendered irradiance must match the uncompacted path per-pixel
    (per-lane RNG streams and math are permutation-invariant). Exact
    bit-identity is NOT guaranteed: XLA fuses the different-width
    programs differently, and a 1-ulp change in a sampled quantity can
    flip an RNG decision boundary (u < p) on a handful of lanes, after
    which those paths diverge chaotically (measured: ~0.25% of pixels
    when a non-final segment recompiles). The check therefore requires
    ≥99% of pixels at ulp-level agreement AND energy agreement on the
    mean — both branches (compacted, and overflow→full-width fallback)
    are exercised."""
    import merian_quake_tpu.render.mcpg.surface as surf
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import outdoor_court
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.render.gbuffer import render_gbuffer

    monkeypatch.setattr(surf, "COMPACT_MIN_NS", 0)
    bundle = outdoor_court()
    accel = build_accel(bundle.scene, bundle.atlas)
    W, H = 112, 64
    config = RenderConfig(
        width=W, height=H, spp=1, max_path_length=3, integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    mcfg = MCPGConfig(
        mc_adaptive_size=1 << 12, mc_static_size=1 << 10, lc_size=1 << 10
    )
    state = init_mcpg_state(mcfg)
    gbuf = render_gbuffer(accel, bundle.atlas, bundle.uniforms, config)
    base = surf.render_mcpg_surface(
        accel, bundle.atlas, bundle.uniforms, config, mcfg, state, gbuf
    )
    live_frac = np.asarray(base.live_in) / (W * H)
    assert live_frac[1] < 0.5  # bounce-1 deaths: compaction has room

    # (1.0, 0.5): segment 1 runs the COMPACTED branch (live 0.19 < 0.5);
    # (0.5, 0.14): both segments overflow → full-width cond fallback
    for buds in [(1.0, 0.5), (0.5, 0.14)]:
        mc2 = mcfg._replace(surf_live_budget=buds)
        res = surf.render_mcpg_surface(
            accel, bundle.atlas, bundle.uniforms, config, mc2, state, gbuf
        )
        ri, bi = np.asarray(res.irradiance), np.asarray(base.irradiance)
        close = np.isclose(ri, bi, rtol=1e-5, atol=1e-4)
        assert close.mean() > 0.99, (buds, 1 - close.mean())
        assert abs(ri.mean() - bi.mean()) < 5e-3 * max(bi.mean(), 1e-6), buds
        # chaotic boundary flips may kill/spare a handful of lanes
        assert (
            np.abs(
                np.asarray(res.live_in) - np.asarray(base.live_in)
            ).max()
            <= 16
        ), buds


def test_frame_core_budget_queue_slice(monkeypatch):
    """frame_core with live-lane budgets: the statically-dead queue
    padding is sliced off before the update replay (renderer.py), and
    the frame still renders finite output with guiding state updated."""
    import jax.numpy as jnp

    import merian_quake_tpu.render.mcpg.surface as surf
    from merian_quake_tpu.accel.build import build_accel, scene_features
    from merian_quake_tpu.models.procedural import outdoor_court
    from merian_quake_tpu.models.types import RenderConfig
    from merian_quake_tpu.renderer import init_state, render_frame

    monkeypatch.setattr(surf, "COMPACT_MIN_NS", 0)
    bundle = outdoor_court()
    accel = build_accel(bundle.scene, bundle.atlas)
    config = RenderConfig(
        width=64, height=40, spp=1, max_path_length=3, integrator="mcpg",
        features=scene_features(bundle.scene, bundle.uniforms, bundle.atlas),
    )
    mcfg = MCPGConfig(
        mc_adaptive_size=1 << 12, mc_static_size=1 << 10, lc_size=1 << 10,
        surf_live_budget=(1.0, 0.5),
    )
    state = init_state(config, mcfg)
    uniforms = bundle.uniforms._replace(frame=jnp.uint32(3))
    state, out = render_frame(
        accel, bundle.atlas, uniforms, config, state, mcfg
    )
    assert bool(jnp.isfinite(out["ldr"]).all())
    assert bool(jnp.isfinite(state.mcpg.mc.f).all())
    # guiding learned something (queue slice kept live rows)
    assert float(state.mcpg.mc.sum_w.max()) > 0.0
