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


def test_radius_density_proxy_tracks_knn_statistic():
    """VERDICT r2 weak 9: the radius-covariance density proxy (mean
    Gaussian-weighted sq-dist / 9, gicp.py radius_covariances) was
    calibrated by hand against the reference kNN statistic
    (sum(sqd[1:]) / ((k-1)(k+2)/2), nano_gicp.cc:346-389). Pin it on
    NON-uniform sampling: (a) the proxy stays within a fixed band of the
    kNN statistic on a density-gradient cloud, and (b) when the cloud's
    density changes, the proxy scales by the same factor as the statistic
    (what the adaptive-params consumer, an LPF + hard clip, actually
    needs — odom.cc:1612-1621)."""
    rng = np.random.default_rng(5)

    def gradient_cloud(scale):
        # planar surface whose sampling density varies ~4x across x, plus
        # a dense cluster patch: strongly non-uniform
        n = 1500
        u = rng.random(n) ** 2.0                    # denser near u=0
        x = u * 8.0
        y = rng.uniform(0, 8.0, n)
        base = np.c_[x, y, 0.02 * rng.standard_normal(n)]
        patch = np.c_[rng.uniform(3, 3.6, 300), rng.uniform(3, 3.6, 300),
                      0.02 * rng.standard_normal(300)]
        return (np.concatenate([base, patch]) * scale).astype(np.float32)

    cloud1 = gradient_cloud(1.0)
    cloud2 = gradient_cloud(1.8)      # ~1.8x coarser spacing -> ~3.2x d2
    v1 = jnp.ones((cloud1.shape[0],), bool)

    _, den_knn1 = gicp.plane_covariances(jnp.asarray(cloud1), v1, 16)
    _, den_prox1 = gicp.radius_covariances(jnp.asarray(cloud1), v1, 0.5)
    _, den_knn2 = gicp.plane_covariances(jnp.asarray(cloud2), v1, 16)
    _, den_prox2 = gicp.radius_covariances(jnp.asarray(cloud2), v1, 0.5)
    den_knn1, den_prox1, den_knn2, den_prox2 = map(
        float, (den_knn1, den_prox1, den_knn2, den_prox2))

    # (a) absolute band on non-uniform sampling
    ratio1 = den_prox1 / den_knn1
    assert 0.3 < ratio1 < 3.0, (den_prox1, den_knn1)
    # (b) density-change tracking: proxy scale factor within 40% of the
    # kNN statistic's scale factor
    f_knn = den_knn2 / den_knn1
    f_prox = den_prox2 / den_prox1
    assert f_knn > 1.5                                 # the change is real
    assert 0.6 < f_prox / f_knn < 1.67, (f_knn, f_prox)
