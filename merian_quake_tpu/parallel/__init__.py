"""Device-mesh parallelism.

The reference is single-GPU (SURVEY §2.6); multi-chip scaling is a new
capability of this framework: the pixel grid is sharded across a
``jax.sharding.Mesh`` (image-row slabs per device), scene/atlas/uniforms
are replicated, and cross-shard reductions (auto-exposure log-mean,
later: denoiser halos, guiding-grid all-reduces) ride ICI collectives.
"""
from .render import make_mesh, render_frame_sharded, init_state_sharded  # noqa: F401
