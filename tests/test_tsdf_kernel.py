"""Parity: Pallas TSDF block-accumulate kernel (interpret mode) vs the XLA
scatter fallback — both routes of models/tsdf._integrate_samples must yield
identical state."""

import numpy as np
import jax.numpy as jnp

from noetic_slam_tpu.config.params import TsdfConfig
from noetic_slam_tpu.models import tsdf


def _cfg(**kw):
    base = dict(voxel_size=0.1, truncation=0.3, max_blocks=256,
                space_carving=True, carving_samples=4, max_range=30.0,
                scan_block_cap=64)
    base.update(kw)
    return TsdfConfig(**base)


def _states_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.dir_keys),
                                  np.asarray(b.dir_keys))
    np.testing.assert_array_equal(np.asarray(a.dir_slots),
                                  np.asarray(b.dir_slots))
    assert int(a.num_blocks) == int(b.num_blocks)
    assert int(a.dropped) == int(b.dropped)
    np.testing.assert_allclose(np.asarray(a.weight), np.asarray(b.weight),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.wsum), np.asarray(b.wsum),
                               rtol=1e-5, atol=1e-5)


def _run_both(cfg, clouds, max_weight_stress=False):
    st_k = tsdf.init_tsdf(cfg)
    st_x = tsdf.init_tsdf(cfg)
    origin = jnp.zeros(3)
    for pts in clouds:
        valid = jnp.ones((pts.shape[0],), bool)
        pos, sdf, w = tsdf._ray_samples(cfg, jnp.asarray(pts), valid, origin)
        st_k = tsdf._integrate_samples(cfg, st_k, pos, sdf, w,
                                       use_kernel=True, interpret=True)
        st_x = tsdf._integrate_samples(cfg, st_x, pos, sdf, w,
                                       use_kernel=False)
    return st_k, st_x


def test_kernel_matches_xla_surface():
    rng = np.random.default_rng(3)
    clouds = []
    for i in range(3):
        ang = rng.uniform(0, 2 * np.pi, 128)
        r = 5.0 + rng.normal(scale=0.05, size=128)
        z = rng.uniform(-0.5, 1.5, 128)
        clouds.append(np.stack([r * np.cos(ang), r * np.sin(ang), z],
                               -1).astype(np.float32) + 0.01 * i)
    st_k, st_x = _run_both(_cfg(), clouds)
    assert int(st_k.num_blocks) > 5
    _states_equal(st_k, st_x)


def test_kernel_matches_xla_max_weight_clamp():
    # hammer one voxel so the max_weight clamp path is exercised
    cfg = _cfg(max_weight=3.0, space_carving=False)
    pts = np.tile(np.array([[2.0, 0.05, 0.05]], np.float32), (64, 1))
    st_k, st_x = _run_both(cfg, [pts, pts, pts])
    _states_equal(st_k, st_x)
    assert float(st_k.weight.max()) <= 3.0 + 1e-6


def test_kernel_matches_xla_block_cap_overflow():
    # more distinct blocks than scan_block_cap: overflow drops, counted
    cfg = _cfg(scan_block_cap=8, space_carving=False, max_blocks=64)
    pts = (np.arange(40, dtype=np.float32)[:, None]
           * np.array([[1.0, 0, 0]], np.float32))  # 40 blocks along x
    st_k, st_x = _run_both(cfg, [pts])
    _states_equal(st_k, st_x)
    assert int(st_k.dropped) > 0


def test_kernel_matches_xla_directory_capacity():
    # directory overflow: allocation beyond max_blocks drops
    cfg = _cfg(scan_block_cap=64, space_carving=False, max_blocks=8)
    pts = (np.arange(30, dtype=np.float32)[:, None]
           * np.array([[1.0, 0, 0]], np.float32))
    st_k, st_x = _run_both(cfg, [pts])
    _states_equal(st_k, st_x)
    assert int(st_k.num_blocks) == 8


def test_kernel_empty_scan():
    cfg = _cfg()
    pts = np.zeros((16, 3), np.float32)       # all < min range -> invalid
    st_k, st_x = _run_both(cfg, [pts])
    _states_equal(st_k, st_x)
    assert int(st_k.num_blocks) == 0
