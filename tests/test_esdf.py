"""ESDF query layer (models/esdf): min-plus distance transform exactness
vs scipy's EDT, and signed-field correctness over a fused TSDF wall."""

import jax.numpy as jnp
import numpy as np

from noetic_slam_tpu.config.params import TsdfConfig
from noetic_slam_tpu.models import esdf as esdf_mod
from noetic_slam_tpu.models import tsdf as tsdf_mod


def _cfg(**kw):
    base = dict(voxel_size=0.1, truncation=0.3, max_blocks=4096,
                space_carving=True, carving_samples=48, max_range=30.0,
                scan_block_cap=512)
    base.update(kw)
    return TsdfConfig(**base)


def test_minplus_edt_matches_scipy():
    """The separable min-plus transform is the exact squared EDT."""
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(3)
    obstacles = rng.random((24, 20, 16)) < 0.03
    obstacles[5, 7, 9] = True                    # guarantee a source
    v = 0.25
    seed = np.where(obstacles, 0.0, 1e9).astype(np.float32)
    got = np.sqrt(np.asarray(esdf_mod._edt_sq(jnp.asarray(seed), v)))
    want = distance_transform_edt(~obstacles, sampling=v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _fuse_wall(cfg, x=4.0, n=4000, seed=0):
    """Fuse a dense wall at x (YZ plane) viewed from the origin."""
    rng = np.random.default_rng(seed)
    pts = np.c_[np.full(n, x),
                rng.uniform(-3, 3, n), rng.uniform(-2, 2, n)].astype(
                    np.float32)
    st = tsdf_mod.init_tsdf(cfg)
    for _ in range(3):
        st = tsdf_mod.integrate(cfg, st, jnp.asarray(pts),
                                jnp.ones((n,), bool), jnp.zeros(3))
    return st


def test_esdf_region_wall_distances():
    cfg = _cfg()
    st = _fuse_wall(cfg)
    # region in front of the wall, crossing it
    esdf, observed, centers = esdf_mod.esdf_region(
        cfg, st, jnp.asarray([3.0, -1.0, -0.5]), shape=(12, 16, 8),
        max_dist=2.0)
    esdf, observed = np.asarray(esdf), np.asarray(observed)
    centers = np.asarray(centers)
    assert observed.mean() > 0.8                 # carved free space
    # in observed free space ahead of the wall, esdf ~ (4.0 - x)
    free = observed & (centers[..., 0] < 3.85)
    err = np.abs(esdf[free] - (4.0 - centers[free][:, 0]))
    assert np.quantile(err, 0.9) < 1.5 * cfg.voxel_size, err.max()
    # inside/behind the wall surface: negative values appear
    inside = observed & (np.abs(centers[..., 0] - 4.1) < 0.05)
    assert inside.sum() > 10
    assert np.median(esdf[inside]) < 0.0


def test_esdf_at_trilinear_sign_and_gradient():
    cfg = _cfg()
    st = _fuse_wall(cfg)
    q = np.array([[3.3, 0.0, 0.0],
                  [3.6, 0.5, -0.3],
                  [3.9, -0.4, 0.2]], np.float32)
    vals = np.asarray(esdf_mod.esdf_at(cfg, st, jnp.asarray(q),
                                       shape=(12, 16, 8), max_dist=2.0))
    want = 4.0 - q[:, 0]
    np.testing.assert_allclose(vals, want, atol=1.5 * cfg.voxel_size)
    # monotone decrease toward the wall
    assert vals[0] > vals[1] > vals[2]


def test_esdf_region_occupancy_wall():
    """Occupancy-backend ESDF: voxel-quantized distances to the occupied
    set, correct sign inside the wall."""
    from noetic_slam_tpu.config.params import OccupancyConfig
    from noetic_slam_tpu.models import occupancy as occ

    ocfg = OccupancyConfig(voxel_size=0.1, max_blocks=4096,
                           miss_samples=48, max_range=30.0)
    rng = np.random.default_rng(1)
    n = 4000
    pts = np.c_[np.full(n, 4.0), rng.uniform(-3, 3, n),
                rng.uniform(-2, 2, n)].astype(np.float32)
    st = occ.init_occupancy(ocfg)
    for _ in range(3):
        st = occ.integrate(ocfg, st, jnp.asarray(pts),
                           jnp.ones((n,), bool), jnp.zeros(3))
    esdf, observed, centers = esdf_mod.esdf_region_occupancy(
        ocfg, st, jnp.asarray([3.0, -1.0, -0.5]), shape=(12, 16, 8),
        max_dist=2.0)
    esdf, observed = np.asarray(esdf), np.asarray(observed)
    centers = np.asarray(centers)
    # the voxel between the last miss sample and the hit is legitimately
    # untouched (misses stop one voxel short of the endpoint)
    assert observed.mean() > 0.7
    free = observed & (centers[..., 0] < 3.85)
    err = np.abs(esdf[free] - (4.0 - centers[free][:, 0]))
    assert np.quantile(err, 0.9) < 2.0 * ocfg.voxel_size, err.max()
    wall = observed & (np.abs(centers[..., 0] - 4.05) < 0.02)
    assert wall.sum() > 10 and np.median(esdf[wall]) <= 0.0


def test_esdf_at_out_of_region_reads_sentinel():
    """A query outside the materialized region must read the max_dist
    sentinel, not a silently-clamped border voxel's distance (ADVICE r2:
    the old clamp returned wrong distances with no signal)."""
    cfg = TsdfConfig(voxel_size=0.25, truncation=0.75, max_blocks=2048,
                     space_carving=True, carving_samples=8,
                     scan_block_cap=1024)
    rng = np.random.default_rng(0)
    n = 2000
    pts = np.c_[np.full(n, 3.0), rng.uniform(-2, 2, n),
                rng.uniform(-1, 1, n)].astype(np.float32)
    st = tsdf_mod.init_tsdf(cfg)
    for _ in range(3):
        st = tsdf_mod.integrate(cfg, st, jnp.asarray(pts),
                                jnp.ones((n,), bool), jnp.zeros(3))
    # in-region queries near the wall + one far outside the (16,16,8)
    # region that the AABB min anchors
    q = np.asarray([[2.0, 0.0, 0.0],       # region anchor / free space
                    [2.9, 0.0, 0.0],       # near the wall
                    [2.0 + 16 * 0.25 + 5.0, 0.0, 0.0]],  # beyond region
                   np.float32)
    vals = np.asarray(esdf_mod.esdf_at(cfg, st, jnp.asarray(q),
                                       shape=(16, 16, 8), max_dist=2.0))
    assert vals[1] < vals[0]               # closer to the wall
    assert vals[2] == 2.0                  # sentinel, not a border value
