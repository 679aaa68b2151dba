import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from noetic_slam_tpu.config.params import GicpConfig
from noetic_slam_tpu.ops import gicp
from noetic_slam_tpu.parallel.mesh import make_mesh
from noetic_slam_tpu.parallel.registration import sharded_gicp_align
from tests.test_gicp import _surface_cloud


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_gicp_matches_single_device(rng, mesh8):
    tgt = _surface_cloud(rng, n=1536)  # divides 8
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = Rotation.from_rotvec([0.015, -0.02, 0.03]).as_matrix()
    T_true[:3, 3] = [0.1, -0.07, 0.05]
    inv = np.linalg.inv(T_true)
    src = (tgt @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)[:1024]

    sv = jnp.ones((src.shape[0],), bool)
    tv = jnp.ones((tgt.shape[0],), bool)
    src_cov, _ = gicp.plane_covariances(jnp.asarray(src), sv, k=8)
    tgt_cov, _ = gicp.plane_covariances(jnp.asarray(tgt), tv, k=8)

    cfg = GicpConfig(max_corr_dist=1.0)
    ref = gicp.gicp_align(jnp.asarray(src), sv, src_cov, jnp.asarray(tgt),
                          tgt_cov, cfg)
    got = sharded_gicp_align(mesh8, jnp.asarray(src), sv, src_cov,
                             jnp.asarray(tgt), tgt_cov, cfg)
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.T), np.asarray(ref.T),
                               atol=2e-4)
    # and it actually recovers the transform
    resid = np.linalg.inv(T_true) @ np.asarray(got.T)
    assert np.abs(resid[:3, 3]).max() < 2e-2
