import numpy as np
import jax
import jax.numpy as jnp

from noetic_slam_tpu.config.params import TsdfConfig
from noetic_slam_tpu.models import tsdf


def small_cfg(**kw):
    base = dict(voxel_size=0.1, truncation=0.3, max_blocks=2048,
                space_carving=False, max_range=30.0)
    base.update(kw)
    return TsdfConfig(**base)


def test_allocate_and_lookup():
    cfg = small_cfg()
    st = tsdf.init_tsdf(cfg)
    keys = tsdf._block_key(jnp.asarray([[0, 0, 0], [1, 2, 3], [1, 2, 3],
                                        [-5, 0, 2]], jnp.int32))
    st = tsdf.allocate_blocks(st, keys)
    assert int(st.num_blocks) == 3  # duplicate collapsed
    slots = tsdf._lookup(st, keys)
    assert (np.asarray(slots) >= 0).all()
    # same key -> same slot
    assert int(slots[1]) == int(slots[2])
    # unknown key -> -1
    missing = tsdf._lookup(st, tsdf._block_key(
        jnp.asarray([[9, 9, 9]], jnp.int32)))
    assert int(missing[0]) == -1


def test_integrate_flat_wall():
    """Rays hitting a wall at x=5: zero crossing must sit at the wall."""
    cfg = small_cfg()
    st = tsdf.init_tsdf(cfg)
    rng = np.random.default_rng(0)
    pts = np.c_[np.full(2000, 5.0), rng.uniform(-2, 2, 2000),
                rng.uniform(-2, 2, 2000)].astype(np.float32)
    origin = jnp.zeros(3)
    for _ in range(3):
        st = tsdf.integrate(cfg, st, jnp.asarray(pts),
                            jnp.ones((2000,), bool), origin)

    centers, d, mask = tsdf.extract_surface(cfg, st, iso_band=0.4)
    centers, d, mask = map(np.asarray, (centers, d, mask))
    surf = centers[mask]
    assert len(surf) > 50
    # all near-zero-crossing voxels lie near the x=5 plane
    assert np.abs(surf[:, 0] - 5.0).max() < 0.25, np.abs(surf[:, 0] - 5).max()

    # sign convention: voxels in front of the wall (x<5) have positive sdf
    # (free), behind have negative
    keys = tsdf._block_key(jnp.asarray([[5, 0, 0]], jnp.int32))  # x in [4,4.8]
    slot = int(tsdf._lookup(st, keys)[0])
    assert slot >= 0
    dvals = np.asarray(tsdf.tsdf_distance(cfg, st)[slot])
    wvals = np.asarray(st.weight[slot])
    assert dvals[wvals > 0].mean() > 0  # front side mostly free


def test_integrate_weighted_average_converges():
    """Repeated integration of the same surface must keep sdf stable."""
    cfg = small_cfg()
    st = tsdf.init_tsdf(cfg)
    pts = np.array([[3.0, 0.05, 0.05]], np.float32)
    for _ in range(5):
        st = tsdf.integrate(cfg, st, jnp.asarray(pts), jnp.ones((1,), bool),
                            jnp.zeros(3))
    # voxel containing the point ~ sdf 0
    vx = np.floor(pts[0] / cfg.voxel_size).astype(int)
    b = vx >> 3
    intra = vx - (b << 3)
    slot = int(tsdf._lookup(st, tsdf._block_key(
        jnp.asarray([b], jnp.int32)))[0])
    iv = intra[0] + (intra[1] << 3) + (intra[2] << 6)
    assert abs(float(tsdf.tsdf_distance(cfg, st)[slot, iv])) < cfg.voxel_size


def test_carving_clears_free_space():
    cfg = small_cfg(space_carving=True, carving_samples=16)
    st = tsdf.init_tsdf(cfg)
    pts = np.c_[np.full(500, 8.0), np.linspace(-1, 1, 500),
                np.zeros(500)].astype(np.float32)
    st = tsdf.integrate(cfg, st, jnp.asarray(pts), jnp.ones((500,), bool),
                        jnp.zeros(3))
    # a voxel midway along the rays must be allocated and positive (free)
    b = np.array([np.floor(4.0 / 0.8), 0, 0], int)
    slot = int(tsdf._lookup(st, tsdf._block_key(
        jnp.asarray([b], jnp.int32)))[0])
    assert slot >= 0
    w = np.asarray(st.weight[slot])
    d = np.asarray(tsdf.tsdf_distance(cfg, st)[slot])
    assert d[w > 0].min() > 0.0


def test_capacity_overflow_drops():
    cfg = small_cfg(max_blocks=4)
    st = tsdf.init_tsdf(cfg)
    coords = jnp.asarray([[i, 0, 0] for i in range(10)], jnp.int32)
    st = tsdf.allocate_blocks(st, tsdf._block_key(coords))
    assert int(st.num_blocks) == 4
    assert int(st.dropped) == 6
