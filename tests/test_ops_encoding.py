import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.ops import octahedral, linalg


def _random_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_octahedral_roundtrip(rng):
    d = _random_dirs(rng, 4096).astype(np.float32)
    dec = np.asarray(octahedral.decode_normal(octahedral.encode_normal(jnp.asarray(d))))
    # 16-bit snorm per component: worst-case angular error well under 0.1 deg.
    dots = np.sum(d * dec, axis=-1)
    assert dots.min() > np.cos(np.deg2rad(0.1))


def test_octahedral_axes():
    axes = jnp.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
        jnp.float32,
    )
    dec = np.asarray(octahedral.decode_normal(octahedral.encode_normal(axes)))
    np.testing.assert_allclose(dec, np.asarray(axes), atol=1e-3)


def test_make_frame_orthonormal(rng):
    n = jnp.asarray(_random_dirs(rng, 1000).astype(np.float32))
    t, b = linalg.make_frame(n)
    t, b, n = np.asarray(t), np.asarray(b), np.asarray(n)
    assert np.abs(np.sum(t * n, -1)).max() < 1e-5
    assert np.abs(np.sum(b * n, -1)).max() < 1e-5
    assert np.abs(np.sum(t * b, -1)).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # right-handed: t x b == n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_frame_roundtrip(rng):
    n = jnp.asarray(_random_dirs(rng, 100).astype(np.float32))
    v = jnp.asarray(_random_dirs(rng, 100).astype(np.float32))
    back = linalg.frame_to_world(n, linalg.world_to_frame(n, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)
