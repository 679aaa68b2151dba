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


def test_rebuild_from_keyframes_matches_incremental():
    """rebuild_from_keyframes over K keyframe clouds must produce the SAME
    volume as integrating those clouds incrementally (same sample stream ->
    same payload), with inactive slots contributing nothing."""
    cfg = small_cfg()
    rng = np.random.default_rng(4)
    K, Nk = 4, 400
    kf_xyz = np.zeros((K, Nk, 3), np.float32)
    kf_valid = np.zeros((K, Nk), bool)
    kf_pos = np.zeros((K, 3), np.float32)
    st_inc = tsdf.init_tsdf(cfg)
    for k in range(3):                      # 3 active, 1 inactive slot
        origin = np.array([k * 0.5, 0.0, 0.0], np.float32)
        pts = np.c_[np.full(Nk, 5.0 + 0.2 * k),
                    rng.uniform(-2, 2, Nk), rng.uniform(-1, 1, Nk)
                    ].astype(np.float32)
        kf_xyz[k], kf_valid[k], kf_pos[k] = pts, True, origin
        st_inc = tsdf.integrate(cfg, st_inc, jnp.asarray(pts),
                                jnp.ones((Nk,), bool), jnp.asarray(origin))
    kf_xyz[3] = 77.0                        # garbage in the inactive slot

    st_rb = tsdf.rebuild_from_keyframes(
        cfg, jnp.asarray(kf_xyz), jnp.asarray(kf_valid),
        jnp.asarray(kf_pos), jnp.int32(3))

    assert int(st_rb.num_blocks) == int(st_inc.num_blocks)
    np.testing.assert_array_equal(np.asarray(st_rb.dir_keys),
                                  np.asarray(st_inc.dir_keys))
    # payload slots may be assigned in a different order across the two
    # paths; compare per-key rows
    slots_inc = np.asarray(st_inc.dir_slots)
    slots_rb = np.asarray(st_rb.dir_slots)
    nb = int(st_inc.num_blocks)
    w_inc = np.asarray(st_inc.weight)[slots_inc[:nb]]
    w_rb = np.asarray(st_rb.weight)[slots_rb[:nb]]
    np.testing.assert_allclose(w_rb, w_inc, rtol=1e-5, atol=1e-5)
    d_inc = np.asarray(tsdf.tsdf_distance(cfg, st_inc))[slots_inc[:nb]]
    d_rb = np.asarray(tsdf.tsdf_distance(cfg, st_rb))[slots_rb[:nb]]
    np.testing.assert_allclose(d_rb, d_inc, rtol=1e-4, atol=1e-4)


def test_rebuild_from_keyframes_empty():
    cfg = small_cfg()
    st = tsdf.rebuild_from_keyframes(
        cfg, jnp.zeros((2, 8, 3)), jnp.zeros((2, 8), bool),
        jnp.zeros((2, 3)), jnp.int32(0))
    assert int(st.num_blocks) == 0
    assert float(st.weight.sum()) == 0.0
