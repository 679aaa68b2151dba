import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from noetic_slam_tpu.config.params import GicpConfig
from noetic_slam_tpu.ops import gicp
from noetic_slam_tpu.ops.pointcloud import SENTINEL


def _surface_cloud(rng, n=512):
    """Points on a few planes (so PLANE covariances are meaningful)."""
    pts = []
    for nrm, d in [((0, 0, 1.0), 0.0), ((1.0, 0, 0), 4.0), ((0, 1.0, 0), -3.0)]:
        m = n // 3
        u = rng.uniform(-5, 5, size=(m, 2))
        nrm = np.asarray(nrm)
        # build a basis orthogonal to nrm
        a = np.array([1.0, 0, 0]) if abs(nrm[0]) < 0.9 else np.array([0, 1.0, 0])
        b1 = np.cross(nrm, a)
        b1 /= np.linalg.norm(b1)
        b2 = np.cross(nrm, b1)
        pts.append(u[:, :1] * b1 + u[:, 1:] * b2 + d * nrm)
    pts = np.concatenate(pts)
    return (pts + rng.normal(scale=0.005, size=pts.shape)).astype(np.float32)


def test_inv3_sym(rng):
    A = rng.normal(size=(10, 3, 3))
    S = (A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)).astype(np.float32)
    inv = np.asarray(gicp._inv3_sym(jnp.asarray(S)))
    np.testing.assert_allclose(inv @ S, np.tile(np.eye(3), (10, 1, 1)),
                               atol=1e-3)


def test_plane_covariances_flat_plane(rng):
    """Covariance of a flat plane must have its small axis along the normal."""
    pts = np.zeros((256, 3), np.float32)
    pts[:, :2] = rng.uniform(-2, 2, size=(256, 2))
    valid = np.ones(256, bool)
    cov6, density = gicp.plane_covariances(jnp.asarray(pts),
                                           jnp.asarray(valid), k=8)
    C = np.asarray(gicp.sym6_to_mat(cov6))
    # normal direction (z) variance must be ~1e-3, in-plane ~1
    np.testing.assert_allclose(C[:, 2, 2], 1e-3, rtol=0.2)
    np.testing.assert_allclose(C[:, 0, 0] + C[:, 1, 1], 2.0, rtol=0.2)
    assert float(density) > 0


def test_gicp_align_recovers_transform(rng):
    tgt = _surface_cloud(rng)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = Rotation.from_rotvec([0.02, -0.03, 0.05]).as_matrix()
    T_true[:3, 3] = [0.15, -0.1, 0.08]
    src = tgt @ np.linalg.inv(T_true)[:3, :3].T + np.linalg.inv(T_true)[:3, 3]
    src = src.astype(np.float32)

    valid = jnp.ones((src.shape[0],), bool)
    src_cov, _ = gicp.plane_covariances(jnp.asarray(src), valid, k=8)
    tgt_cov, _ = gicp.plane_covariances(jnp.asarray(tgt), valid, k=8)

    cfg = GicpConfig(max_corr_dist=1.0)
    res = gicp.gicp_align(jnp.asarray(src), valid, src_cov,
                          jnp.asarray(tgt), tgt_cov, cfg)
    T_est = np.asarray(res.T)
    err = np.linalg.inv(T_true) @ T_est
    rot_err = np.abs(err[:3, :3] - np.eye(3)).max()
    trans_err = np.abs(err[:3, 3]).max()
    assert bool(res.converged)
    assert rot_err < 5e-3, rot_err
    assert trans_err < 2e-2, trans_err


def test_gicp_align_with_padding(rng):
    """Padded source/target slots must not perturb the solution."""
    tgt = _surface_cloud(rng, n=384)
    shift = np.array([0.1, 0.05, -0.02], np.float32)
    src = (tgt - shift).astype(np.float32)

    def pad(x, cap):
        out = np.full((cap, 3), SENTINEL, np.float32)
        out[: len(x)] = x
        v = np.zeros(cap, bool)
        v[: len(x)] = True
        return jnp.asarray(out), jnp.asarray(v)

    src_p, src_v = pad(src, 512)
    tgt_p, tgt_v = pad(tgt, 640)
    src_cov, _ = gicp.plane_covariances(src_p, src_v, k=8)
    tgt_cov, _ = gicp.plane_covariances(tgt_p, tgt_v, k=8)
    cfg = GicpConfig(max_corr_dist=1.0)
    res = gicp.gicp_align(src_p, src_v, src_cov, tgt_p, tgt_cov, cfg)
    T_est = np.asarray(res.T)
    np.testing.assert_allclose(T_est[:3, 3], shift, atol=2e-2)
    np.testing.assert_allclose(T_est[:3, :3], np.eye(3), atol=5e-3)
    # correspondences only from valid source points
    assert int(res.num_corr) <= 384


def test_smallest_eigvec_matches_eigh(rng):
    import jax.numpy as jnp
    A = rng.normal(size=(64, 3, 3))
    S = (A @ A.transpose(0, 2, 1)).astype(np.float32)
    # include near-planar covariances (the real workload)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    planar = (np.eye(3) - 0.999 * n[:, :, None] * n[:, None, :]).astype(
        np.float32)
    for M in (S, planar):
        got = np.asarray(gicp._smallest_eigvec_sym3(jnp.asarray(M)))
        w, v = np.linalg.eigh(M)
        want = v[:, :, 0]
        dots = np.abs(np.sum(got * want, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=2e-3)
