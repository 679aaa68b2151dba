import numpy as np
import jax.numpy as jnp

from noetic_slam_tpu.ops import gridnn
from noetic_slam_tpu.ops.pointcloud import SENTINEL


def _brute(query, target):
    d = ((query[:, None, :] - target[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), d.min(1)


def test_grid_nn1_exact_within_radius(rng):
    tgt = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    q = (tgt[rng.integers(0, 2000, 500)]
         + rng.normal(scale=0.1, size=(500, 3))).astype(np.float32)
    radius = 0.5
    grid = gridnn.build_grid(jnp.asarray(tgt), jnp.ones(2000, bool), radius)
    idx, sqd = gridnn.grid_nn1(jnp.asarray(q), grid, max_per_cell=64)
    widx, wsqd = _brute(q, tgt)
    # wherever the true NN is within the radius, grid NN must find it
    close = wsqd < radius ** 2
    np.testing.assert_array_equal(np.asarray(idx)[close], widx[close])
    np.testing.assert_allclose(np.asarray(sqd)[close], wsqd[close],
                               rtol=1e-5)


def test_grid_nn1_far_queries_miss(rng):
    tgt = rng.uniform(0, 5, size=(500, 3)).astype(np.float32)
    q = np.full((10, 3), 100.0, np.float32)
    grid = gridnn.build_grid(jnp.asarray(tgt), jnp.ones(500, bool), 0.5)
    _, sqd = gridnn.grid_nn1(jnp.asarray(q), grid)
    assert np.isinf(np.asarray(sqd)).all()


def test_grid_nn1_ignores_invalid_targets(rng):
    tgt = np.full((256, 3), SENTINEL, np.float32)
    tgt[:64] = rng.uniform(0, 4, size=(64, 3)).astype(np.float32)
    valid = np.zeros(256, bool)
    valid[:64] = True
    grid = gridnn.build_grid(jnp.asarray(tgt), jnp.asarray(valid), 0.5)
    q = tgt[:8]
    idx, sqd = gridnn.grid_nn1(jnp.asarray(q), grid)
    assert np.asarray(idx).max() < 64
    np.testing.assert_allclose(np.asarray(sqd), 0.0, atol=1e-7)


def test_grid_knn_matches_brute_on_dense_cloud(rng):
    """k-NN on a voxel-downsampled-style cloud: neighbors within one cell."""
    tgt = rng.uniform(0, 6, size=(4000, 3)).astype(np.float32)
    grid = gridnn.build_grid(jnp.asarray(tgt), jnp.ones(4000, bool), 1.0)
    q = tgt[:200]
    k = 8
    idx, sqd = gridnn.grid_knn(jnp.asarray(q), grid, k, max_per_cell=128)
    d = ((q[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    want = np.sort(d, axis=1)[:, :k]
    got = np.asarray(sqd)
    # all true k-NN here are within the cell size (dense cloud)
    assert (want < 1.0).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
