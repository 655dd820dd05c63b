import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.ops import camera, hashgrid, linalg


def test_camera_project_roundtrip():
    W, H = 640, 360
    cam_u = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    cam_w = linalg.normalize(jnp.asarray([1.0, 0.5, -0.2], jnp.float32))
    tan = float(np.tan(np.deg2rad(90.0) / 2))
    px = jnp.asarray(np.random.default_rng(0).uniform(0, W, 500), jnp.float32)
    py = jnp.asarray(np.random.default_rng(1).uniform(0, H, 500), jnp.float32)
    d = camera.ray_dir(px, py, W, H, cam_u, cam_w, tan)
    qx, qy, dz = camera.project(d, W, H, cam_u, cam_w, tan)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(px), atol=1e-2)
    np.testing.assert_allclose(np.asarray(qy), np.asarray(py), atol=1e-2)
    assert np.all(np.asarray(dz) > 0)


def test_camera_center_ray_is_forward():
    W, H = 640, 360
    cam_u = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    cam_w = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    d = camera.ray_dir(W / 2 - 0.5, H / 2 - 0.5, W, H, cam_u, cam_w, 1.0)
    np.testing.assert_allclose(np.asarray(d), [1.0, 0.0, 0.0], atol=1e-6)


def test_camera_up_is_up():
    W, H = 640, 640
    cam_u = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    cam_w = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    d_top = np.asarray(camera.ray_dir(W / 2 - 0.5, 0, W, H, cam_u, cam_w, 1.0))
    assert d_top[2] > 0.3  # top of image looks up


def test_grid_idx_interpolate_weights():
    # For a point at fraction fx inside a cell (relative to centers), the
    # neighbor cell must be selected with trilinear probability.
    pos = jnp.asarray([[10.3, 0.0, 0.0]], jnp.float32) * jnp.ones((20000, 1))
    width = 1.0
    u = jnp.asarray(np.random.default_rng(2).uniform(size=(20000, 3)), jnp.float32)
    idx = np.asarray(hashgrid.grid_idx_interpolate(pos, width, u))
    # pos.x/width - 0.5 = 9.8 -> cell 9 w.p. 0.2, cell 10 w.p. 0.8
    frac10 = (idx[:, 0] == 10).mean()
    assert abs(frac10 - 0.8) < 0.02
    assert set(np.unique(idx[:, 0])) == {9, 10}


def test_hash_grid_determinism_and_range():
    idx = jnp.asarray(
        np.random.default_rng(3).integers(-1000, 1000, size=(1000, 3)), jnp.int32
    )
    h1 = np.asarray(hashgrid.hash_grid(idx, 4096))
    h2 = np.asarray(hashgrid.hash_grid(idx, 4096))
    np.testing.assert_array_equal(h1, h2)
    assert h1.max() < 4096
    # decent spread
    assert len(np.unique(h1)) > 700


def test_hash2_independent_of_hash():
    idx = jnp.asarray(
        np.random.default_rng(4).integers(-100, 100, size=(5000, 3)), jnp.int32
    )
    h = np.asarray(hashgrid.hash_grid(idx, 1 << 16)).astype(np.int64)
    h2 = np.asarray(hashgrid.hash2_grid(idx)).astype(np.int64)
    assert h2.max() <= 0xFFFF
    # correlation between the two hashes should be negligible
    c = np.corrcoef(h, h2)[0, 1]
    assert abs(c) < 0.05


def test_quantize_normal_buckets():
    n = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    q = np.asarray(hashgrid.quantize_normal(n))
    assert len(set(q.tolist())) == 6
