import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.ops import rng


def test_pcg4d_reference_vector():
    # Cross-checked against a straight numpy implementation of PCG4D.
    v = np.array([[1, 2, 3, 4]], dtype=np.uint32)

    def ref(v):
        v = (v * 1664525 + 1013904223).astype(np.uint64) & 0xFFFFFFFF
        x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
        x = (x + y * w) & 0xFFFFFFFF
        y = (y + z * x) & 0xFFFFFFFF
        z = (z + x * y) & 0xFFFFFFFF
        w = (w + y * z) & 0xFFFFFFFF
        v = np.stack([x, y, z, w], -1)
        v = v ^ (v >> 16)
        x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
        x = (x + y * w) & 0xFFFFFFFF
        y = (y + z * x) & 0xFFFFFFFF
        z = (z + x * y) & 0xFFFFFFFF
        w = (w + y * z) & 0xFFFFFFFF
        return np.stack([x, y, z, w], -1)

    got = np.asarray(rng.pcg4d(jnp.asarray(v)))
    np.testing.assert_array_equal(got.astype(np.uint64), ref(v))


def test_uniform_range_and_statistics():
    state = rng.seed_pixel(
        jnp.arange(4096) % 64, jnp.arange(4096) // 64, 7, 1337
    )
    state, u = rng.uniform(state)
    u = np.asarray(u)
    assert np.all(u >= 0.0) and np.all(u < 1.0)
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_streams_decorrelated_across_pixels_and_frames():
    s_a = rng.seed_pixel(10, 20, 0, 1337)
    s_b = rng.seed_pixel(11, 20, 0, 1337)
    s_c = rng.seed_pixel(10, 20, 1, 1337)
    draws = []
    for s in (s_a, s_b, s_c):
        vals = []
        for _ in range(8):
            s, u = rng.uniform(s)
            vals.append(float(u))
        draws.append(vals)
    assert draws[0] != draws[1]
    assert draws[0] != draws[2]


def test_uniform3_shape():
    state = jnp.full((5, 7), 123, jnp.uint32)
    state, u3 = rng.uniform3(state)
    assert u3.shape == (5, 7, 3)
    assert state.shape == (5, 7)
