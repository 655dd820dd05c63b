"""Pinhole camera: ray generation and projection (reprojection for MVs).

Equivalent of the reference's ``merian-shaders/camera.glsl``
(``get_camera_ray_dir`` / ``get_camera_pixel``; use sites
gbuffer.comp:95-100,113-115). Convention (documented, self-consistent,
unit-tested for roundtrip):

- camera frame: ``w`` forward, ``u`` up, right = normalize(cross(w, u)),
- ``fov_tan_half`` is the tangent of half the HORIZONTAL field of view
  (Quake's fov cvar is horizontal),
- pixel (0, 0) is top-left; +y in image space points down, so image up
  maps to +u.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import linalg


def basis(cam_u: jnp.ndarray, cam_w: jnp.ndarray):
    """Returns (right, up, fwd) orthonormal basis."""
    fwd = linalg.normalize(cam_w)
    right = linalg.normalize(jnp.cross(fwd, cam_u))
    up = jnp.cross(right, fwd)
    return right, up, fwd


def ray_dir(px, py, width, height, cam_u, cam_w, fov_tan_half):
    """World-space ray direction through pixel center (px+.5, py+.5).

    px/py: float or int arrays [...]; cam_u/cam_w: [3] (or broadcastable).
    """
    right, up, fwd = basis(cam_u, cam_w)
    x = (2.0 * (jnp.asarray(px, jnp.float32) + 0.5) / width - 1.0) * fov_tan_half
    y = (
        (1.0 - 2.0 * (jnp.asarray(py, jnp.float32) + 0.5) / height)
        * fov_tan_half
        * (height / width)
    )
    d = x[..., None] * right + y[..., None] * up + fwd
    return linalg.normalize(d)


def project(dir_world, width, height, cam_u, cam_w, fov_tan_half):
    """Inverse of :func:`ray_dir`: world direction → pixel coordinates.

    Returns (px, py) as float pixel indices (so that
    project(ray_dir(px, py)) == (px, py)) and the forward dot product
    (<= 0 means behind the camera).
    """
    right, up, fwd = basis(cam_u, cam_w)
    dz = linalg.dot(dir_world, fwd)
    safe = jnp.where(jnp.abs(dz) < 1e-8, 1e-8, dz)
    x = linalg.dot(dir_world, right) / safe / fov_tan_half
    y = linalg.dot(dir_world, up) / safe / (fov_tan_half * (height / width))
    px = (x + 1.0) * 0.5 * width - 0.5
    py = (1.0 - y) * 0.5 * height - 0.5
    return px, py, dz
