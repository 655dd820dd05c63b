"""Renderers: gbuffer + integrators (PT / MCPG / ReSTIR / SSMM).

Equivalent of the reference's L3 layer (src/gbuffer, src/render_mcpg,
src/render_restir, src/render_ssmm + res/shader/**) — but as pure
functions over device arrays instead of Vulkan compute pipelines.
"""
from .hit import Hit, compress_hit, decompress_hit  # noqa: F401
from .trace import trace_ray, get_sky  # noqa: F401
from .gbuffer import GBufferOutput, render_gbuffer  # noqa: F401
