"""Pixel-grid sharded rendering via shard_map.

Each device renders image rows [idx·rows, (idx+1)·rows): ray generation,
intersection, shading and accumulation are embarrassingly parallel over
pixels; the per-frame cross-device communication is the exposure
log-mean (``lax.pmean``), the guiding-update queue all_gather, and the
denoise-halo exchanges (post/sharded.py). RNG streams use absolute
pixel coordinates, so the sharded INTEGRATOR output (the pre-denoise
``hdr`` chain) is bit-identical to the single-device one (tested);
the denoise/reservoir paths are equivalence-tested to small tolerances
instead (f32 reassociation across halo exchanges —
tests/test_parallel.py, atol 2e-6..1e-3; see PARITY.md §2.6).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.types import RenderConfig
from ..renderer import FrameState, frame_core, init_state

AXIS = "pix"


def queue_gather_bytes(config, mcfg, n_devices: int) -> dict:
    """Per-frame cross-shard queue-gather volume (bytes moved by the
    all_gather of guiding-update queues), before/after the round-3
    per-shard compaction (VERDICT r2 #6 'done' metric).

    'dense' is the round-2 scheme: every queue row of every shard rides
    the ICI (update 15 + lc 10 + zero 2 i32 columns × M rows, + dist 5
    × M_vol). 'compact' is the current scheme: per-shard class-sorted
    live prefixes (update 16 × capu/n, lc 7 narrow columns × capl/n,
    zeros capz/n, dist 6 × capdist/n), gathered across n shards.
    """
    H, W = config.height, config.width
    m_surf = H * W * max(config.spp, 1) * max(config.max_path_length - 1, 1)
    vspp = (
        mcfg.volume.volume_spp
        if mcfg is not None and mcfg.volume is not None
        else 0
    )
    m_vol = H * W * vspp
    m = m_surf + m_vol
    dense = 4 * ((15 + 10 + 2) * m + 5 * m_vol)
    if mcfg is None:
        from ..render.mcpg import MCPGConfig

        mcfg = MCPGConfig()
    n = max(n_devices, 1)
    capu = min(m, max(mcfg.update_queue_capacity // n, 1024))
    capl = min(m, max(mcfg.lc_queue_capacity // n, 1024))
    capz = min(m, max(mcfg.zero_queue_capacity // n, 256))
    from ..render.mcpg.volume import DIST_QUEUE_CAPACITY

    capd = min(m_vol, max(DIST_QUEUE_CAPACITY // n, 256)) if m_vol else 0
    compact = 4 * n * (16 * capu + 7 * capl + capz + 6 * capd)
    return {
        "queue_rows": m,
        "dense_bytes": dense * n,  # every device receives the full set
        "compact_bytes": compact,
        "reduction": round(dense * n / max(compact, 1), 2),
    }


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(devs[:n], axis_names=(AXIS,))


def _state_specs(state: FrameState) -> FrameState:
    """Sharding specs per FrameState leaf: per-pixel images shard along
    rows; the guiding state (MCPG chains, light cache) is REPLICATED —
    each device applies the globally all-gathered update queue, keeping
    replicas identical (verified by test)."""
    img = lambda x: P(AXIS) if x is not None else None
    rep = (
        jax.tree.map(lambda _: P(), state.mcpg)
        if state.mcpg is not None
        else None
    )
    svgf_specs = (
        jax.tree.map(lambda _: P(AXIS), state.svgf)
        if state.svgf is not None
        else None
    )
    restir_specs = (
        jax.tree.map(lambda _: P(AXIS), state.restir)
        if state.restir is not None
        else None
    )
    ssmm_specs = (
        jax.tree.map(lambda _: P(AXIS), state.ssmm)
        if state.ssmm is not None
        else None
    )
    vol_specs = None
    if state.volume is not None:
        from ..render.mcpg.volume import VolumeState

        # distance-MC grid replicated (updates all-gathered like the MC
        # queues); per-pixel depth images shard along rows
        vol_specs = VolumeState(
            dist_mc=jax.tree.map(lambda _: P(), state.volume.dist_mc),
            volume_depth=P(AXIS),
            prev_volume_depth=P(AXIS),
        )
    return FrameState(
        accum_irradiance=P(AXIS),
        accum_direct=P(AXIS),
        accum_albedo=P(AXIS),
        iteration=P(),
        mcpg=rep,
        volume=vol_specs,
        accum_volume=img(state.accum_volume),
        restir=restir_specs,
        ssmm=ssmm_specs,
        svgf=svgf_specs,
        taa_prev=img(state.taa_prev),
        accum_volume_len=img(state.accum_volume_len),
        volume_svgf=(
            jax.tree.map(lambda _: P(AXIS), state.volume_svgf)
            if state.volume_svgf is not None
            else None
        ),
    )


def init_state_sharded(mesh: Mesh, config: RenderConfig, mcpg_config=None) -> FrameState:
    state = init_state(config, mcpg_config)
    specs = _state_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def render_frame_sharded(
    mesh: Mesh, accel, atlas, uniforms, config, state, mcpg_config=None
):
    """One frame with the pixel grid sharded over ``mesh``.

    Returns (new_state, ldr image, hdr image) — all sharded along rows.
    For the MCPG integrator the per-shard update queues are all-gathered
    over the mesh (ICI collective) and every device replays the global
    set into its replicated guiding state. ``hdr`` is the pre-FXAA
    beauty (the continuous chain — the right target for bit-identity
    checks; FXAA's discrete edge branches amplify f32 reassociation
    noise into visible but benign local flips).
    """
    n = mesh.devices.size
    assert config.height % n == 0, (config.height, n)
    rows = config.height // n
    specs = _state_specs(state)

    @partial(
        jax.jit,
        static_argnames=("cfg", "mcfg"),
    )
    def step(accel, atlas, uniforms, state, cfg, mcfg):
        def slab(accel, atlas, uniforms, state_slab):
            idx = jax.lax.axis_index(AXIS)
            y0 = idx * rows

            # queue entries are flattened (groups, pixels) with a
            # per-queue group count (spp·segments for the surface
            # queues, volume_spp for the volume ones); the single-device
            # order interleaves full-image pixels within each group, so
            # regroup after gathering to keep the replay bit-identical
            def gather_all(x, groups=1):
                g = jax.lax.all_gather(x, AXIS)  # (ndev, M_shard, ...)
                ndev = g.shape[0]
                per = g.shape[1] // groups
                g = g.reshape((ndev, groups, per) + x.shape[1:])
                order = (1, 0, 2) + tuple(range(3, g.ndim))
                return g.transpose(order).reshape((-1,) + x.shape[1:])

            from ..post.sharded import ShardCtx

            shard_ctx = ShardCtx(
                axis=AXIS, n=n, rows=rows, height=cfg.height
            )

            new_state, outputs = frame_core(
                accel,
                atlas,
                uniforms,
                cfg,
                state_slab,
                y0=y0,
                rows=rows,
                mean_fn=lambda x: jax.lax.pmean(x, AXIS),
                mcpg_config=mcfg,
                gather_fn=gather_all,
                shard_ctx=shard_ctx,
            )
            return new_state, outputs["ldr"], outputs["hdr"]

        # check_vma=False: scan/while carries in the intersector are
        # initialized from replicated constants and become varying in
        # the loop body — semantically fine, but the static VMA check
        # would require pcast-ing every init deep in the accel layer.
        sharded = jax.shard_map(
            slab,
            mesh=mesh,
            in_specs=(P(), P(), P(), specs),
            out_specs=(specs, P(AXIS), P(AXIS)),
            check_vma=False,
        )
        return sharded(accel, atlas, uniforms, state)

    return step(accel, atlas, uniforms, state, config, mcpg_config)
