"""Game simulation bridge.

Equivalent of the reference's L0/L1 layers (embedded quakespasm +
QuakeNode scene extraction, src/game/): a frame-indexed scene/state API
that loads maps and models, animates entities, drives the camera, and
produces per-frame (Scene, Uniforms) with previous-frame vertices for
motion vectors. The full C game engine (physics, AI, demo playback) is
out of scope for the renderer framework; this layer provides the same
*contract* the renderer consumes (quake_node.hpp:181-193 outputs).
"""
from .state import Entity, GameState  # noqa: F401
