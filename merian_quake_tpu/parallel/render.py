"""Pixel-grid sharded rendering via shard_map.

Each device renders image rows [idx·rows, (idx+1)·rows): ray generation,
intersection, shading and accumulation are embarrassingly parallel over
pixels; the only cross-device communication per frame is the exposure
log-mean (``lax.pmean``). RNG streams use absolute pixel coordinates, so
the sharded render is bit-identical to the single-device one.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.types import RenderConfig
from ..renderer import FrameState, frame_core, init_state

AXIS = "pix"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(devs[:n], axis_names=(AXIS,))


def _state_specs() -> FrameState:
    return FrameState(
        accum_irradiance=P(AXIS),
        accum_direct=P(AXIS),
        accum_albedo=P(AXIS),
        iteration=P(),
    )


def init_state_sharded(mesh: Mesh, config: RenderConfig) -> FrameState:
    state = init_state(config)
    specs = _state_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def render_frame_sharded(mesh: Mesh, accel, atlas, uniforms, config, state):
    """One frame with the pixel grid sharded over ``mesh``.

    Returns (new_state, ldr image) — both sharded along rows.
    """
    n = mesh.devices.size
    assert config.height % n == 0, (config.height, n)
    rows = config.height // n

    @partial(
        jax.jit,
        static_argnames=("cfg",),
    )
    def step(accel, atlas, uniforms, state, cfg):
        def slab(accel, atlas, uniforms, state_slab):
            idx = jax.lax.axis_index(AXIS)
            y0 = idx * rows
            new_state, outputs = frame_core(
                accel,
                atlas,
                uniforms,
                cfg,
                state_slab,
                y0=y0,
                rows=rows,
                mean_fn=lambda x: jax.lax.pmean(x, AXIS),
            )
            return new_state, outputs["ldr"]

        # check_vma=False: scan/while carries in the intersector are
        # initialized from replicated constants and become varying in
        # the loop body — semantically fine, but the static VMA check
        # would require pcast-ing every init deep in the accel layer.
        sharded = jax.shard_map(
            slab,
            mesh=mesh,
            in_specs=(P(), P(), P(), _state_specs()),
            out_specs=(_state_specs(), P(AXIS)),
            check_vma=False,
        )
        return sharded(accel, atlas, uniforms, state)

    return step(accel, atlas, uniforms, state, config)
