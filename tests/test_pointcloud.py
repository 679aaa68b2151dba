import numpy as np
import jax.numpy as jnp

from noetic_slam_tpu.ops import pointcloud as pc


def _pad(xyz, t, cap):
    n = len(xyz)
    xyz_p = np.full((cap, 3), 0.0, np.float32)
    t_p = np.zeros((cap,), np.float32)
    valid = np.zeros((cap,), bool)
    xyz_p[:n] = xyz
    t_p[:n] = t
    valid[:n] = True
    return (jnp.asarray(xyz_p), jnp.asarray(t_p), jnp.asarray(valid))


def test_crop_box(rng):
    xyz = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    scan = pc.make_scan(*_pad(xyz, np.zeros(100), 128))
    out = pc.crop_box(scan, 1.0)
    inside = np.all(np.abs(xyz) <= 1.0, axis=-1)
    want_valid = ~inside
    np.testing.assert_array_equal(np.asarray(out.valid)[:100], want_valid)
    assert int(out.count) == want_valid.sum()
    # cropped points carry the sentinel
    assert np.all(np.asarray(out.xyz)[100:] == pc.SENTINEL)


def test_make_scan_rejects_nonfinite():
    xyz = np.array([[0, 0, 1], [np.nan, 0, 0], [np.inf, 1, 1]], np.float32)
    scan = pc.make_scan(jnp.asarray(xyz))
    assert int(scan.count) == 1


def test_prepare_scan_groups_unique_times(rng):
    # 3 distinct column times, points shuffled
    times = np.array([0.3, 0.1, 0.2], np.float32)
    pts_per = 5
    t = np.repeat(times, pts_per)
    xyz = rng.normal(size=(15, 3)).astype(np.float32)
    perm = rng.permutation(15)
    scan = pc.make_scan(*_pad(xyz[perm], t[perm], 32))
    prep = pc.prepare_scan(scan, max_frames=8)
    assert int(prep.unique_count) == 3
    np.testing.assert_allclose(np.asarray(prep.unique_t)[:3], [0.1, 0.2, 0.3],
                               atol=1e-7)
    # frame_idx maps each valid point to its sorted unique time
    fi = np.asarray(prep.frame_idx)
    tt = np.asarray(prep.t)
    for i in range(15):
        np.testing.assert_allclose(np.asarray(prep.unique_t)[fi[i]], tt[i],
                                   atol=1e-7)
    # median unique timestamp (index 3//2 = 1 -> 0.2)
    np.testing.assert_allclose(float(prep.scan_stamp), 0.2, atol=1e-7)
    # padding of unique_t repeats the last valid unique time
    np.testing.assert_allclose(np.asarray(prep.unique_t)[3:], 0.3, atol=1e-7)


def test_voxel_downsample_centroids(rng):
    # two clusters, one voxel each at res=1.0
    a = np.array([[0.1, 0.1, 0.1], [0.3, 0.2, 0.4]], np.float32)
    b = np.array([[5.1, 5.1, 5.1], [5.3, 5.4, 5.2], [5.2, 5.0, 5.0]],
                 np.float32)
    xyz = np.concatenate([a, b])
    cap = 16
    xyz_p = np.full((cap, 3), pc.SENTINEL, np.float32)
    xyz_p[:5] = xyz
    valid = np.zeros(cap, bool)
    valid[:5] = True
    out_xyz, out_valid, n = pc.voxel_downsample(
        jnp.asarray(xyz_p), jnp.asarray(valid), 1.0, 8)
    assert int(n) == 2
    got = np.sort(np.asarray(out_xyz)[:2], axis=0)
    want = np.sort(np.stack([a.mean(0), b.mean(0)]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.asarray(out_valid)[:2].all() and not np.asarray(out_valid)[2:].any()


def test_voxel_downsample_respects_capacity(rng):
    xyz = (rng.uniform(0, 50, size=(64, 3)) // 1.0 + 0.5).astype(np.float32)
    valid = np.ones(64, bool)
    out_xyz, out_valid, n = pc.voxel_downsample(
        jnp.asarray(xyz), jnp.asarray(valid), 0.25, 16)
    assert int(n) <= 16
    assert np.asarray(out_valid).sum() == int(n)
