"""TPU-native ray–scene intersection.

The reference outsources traversal to the Vulkan driver's BVH
(rayQueryEXT, raytrace.glsl:69-119). TPUs have no RT hardware and no
efficient per-ray divergent control flow, so this layer is built around
dense, branchless intersection sweeps:

- ``intersect``: Möller–Trumbore over all triangles, chunked with
  ``lax.scan`` and a running min-reduction (the correctness oracle, and
  already fast for procedural/Quake-scale scenes);
- a cluster structure (Morton-ordered triangle clusters with AABBs) that
  lets the Pallas kernel skip whole clusters per ray tile — hierarchy at
  tile granularity instead of a divergent per-ray stack walk;
- the alpha-test any-hit loop done as bounded re-trace passes, gated on
  a per-triangle ``needs_alpha`` class computed at build time (most hits
  commit without a texture fetch).
"""
from .build import AccelScene, build_accel  # noqa: F401
from .intersect import intersect, trace_nearest, HitRecord  # noqa: F401
