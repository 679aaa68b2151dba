import os

import numpy as np
import pytest

from noetic_slam_tpu.io import export
from noetic_slam_tpu.io.mulran import MulranDataset


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 100).astype(np.float32)
    p = str(tmp_path / "a.ply")
    export.write_ply(p, xyz, inten)
    back = export.read_ply(p)
    np.testing.assert_allclose(back[:, :3], xyz, atol=1e-6)
    np.testing.assert_allclose(back[:, 3], inten, atol=1e-4)


def test_pcd_write(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "m.pcd")
    n = export.write_pcd(p, xyz)
    assert n == 50
    raw = open(p, "rb").read()
    assert b"DATA binary" in raw
    body = raw.split(b"DATA binary\n", 1)[1]
    np.testing.assert_allclose(
        np.frombuffer(body, "<f4").reshape(50, 3), xyz)


def test_tum_trajectory(tmp_path):
    traj = np.array([[1.5, 1, 2, 3, 1, 0, 0, 0],
                     [2.5, 4, 5, 6, 0.707, 0.707, 0, 0]])
    p = str(tmp_path / "t.txt")
    export.write_tum_trajectory(p, traj)
    back = np.loadtxt(p)
    np.testing.assert_allclose(back[0], [1.5, 1, 2, 3, 0, 0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(back[1, 4:], [0.707, 0, 0, 0.707], atol=1e-7)


@pytest.fixture
def fake_mulran(tmp_path, rng):
    """Tiny on-disk MulRan-format dataset (layouts from ROSThread.cpp)."""
    root = tmp_path / "mulran"
    sd = root / "sensor_data"
    (sd / "Ouster").mkdir(parents=True)

    t0 = 1_560_000_000_000_000_000  # ns
    # 17-field xsens_imu.csv (version 2)
    with open(sd / "xsens_imu.csv", "w") as f:
        for i in range(20):
            stamp = t0 + i * 10_000_000
            vals = [stamp, 0, 0, 0, 1, 0, 0, 0,
                    0.01 * i, 0.02, 0.03, 0.1, 0.2, 9.81, 0, 0, 0]
            f.write(",".join(str(v) for v in vals) + "\n")
    # two scans
    for k in range(2):
        stamp = t0 + 50_000_000 + k * 100_000_000
        pts = rng.normal(size=(256, 4)).astype(np.float32)
        pts.tofile(sd / "Ouster" / f"{stamp}.bin")
    # ground truth 3x4 poses
    with open(root / "global_pose.csv", "w") as f:
        for i in range(3):
            stamp = t0 + i * 100_000_000
            T = np.hstack([np.eye(3), [[i], [0], [0]]]).reshape(-1)
            f.write(str(stamp) + "," + ",".join(f"{v:.6f}" for v in T) + "\n")
    return str(root)


def test_mulran_loader(fake_mulran):
    ds = MulranDataset.load(fake_mulran)
    assert ds.imu_version == 2
    assert len(ds.imu_stamps) == 20
    np.testing.assert_allclose(ds.imu_gyro[3], [0.03, 0.02, 0.03])
    np.testing.assert_allclose(ds.imu_accel[0], [0.1, 0.2, 9.81])
    assert len(ds.scan_stamps) == 2
    scan = ds.read_scan(0)
    assert scan.shape == (256, 4)
    assert ds.gt_poses.shape == (3, 3, 4)
    np.testing.assert_allclose(ds.gt_poses[2, 0, 3], 2.0)
    events = list(ds.events())
    stamps = [e[0] for e in events]
    assert stamps == sorted(stamps)
    kinds = {e[1] for e in events}
    assert kinds == {"imu", "scan"}


def test_mapping_nodes(tmp_path, rng):
    import jax.numpy as jnp

    from noetic_slam_tpu.models.mapping import DenseMapRecorder, KeyframeMap
    from noetic_slam_tpu.config.params import CapacityConfig, DlioConfig
    from noetic_slam_tpu.models.odometry import init_state

    cfg = DlioConfig(capacity=CapacityConfig(
        max_points=256, max_ds_points=128, max_deskew_frames=64,
        max_imu_window=16, max_keyframes=8, max_submap_kf=2))
    st = init_state(cfg)
    cloud = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    st = st._replace(kf_xyz=st.kf_xyz.at[0].set(cloud),
                     kf_valid=st.kf_valid.at[0].set(True),
                     kf_count=jnp.int32(1))
    km = KeyframeMap(leaf_size=0.0)
    assert km.update(st) == 1
    assert km.cloud().shape == (128, 3)
    assert km.save_pcd(0.5, str(tmp_path))
    assert (tmp_path / "dlio_map.pcd").exists()

    rec = DenseMapRecorder(str(tmp_path / "dense"), shard_every=2)
    for _ in range(4):
        rec.add(cloud, jnp.ones((128,), bool))
    rec.close()
    shards = [f for f in os.listdir(tmp_path / "dense") if f.endswith(".ply")]
    assert len(shards) == 2


def test_replay_batched_matches_per_scan(fake_mulran):
    """replay_dataset(batch=K) must produce the identical trajectory to the
    per-scan path (same device step, different dispatch granularity)."""
    from noetic_slam_tpu.config.params import CapacityConfig, DlioConfig, ImuConfig
    from noetic_slam_tpu.io.replay import replay_dataset
    from noetic_slam_tpu.runtime.pipeline import OdometryPipeline

    ds = MulranDataset.load(fake_mulran)
    cfg = DlioConfig(
        capacity=CapacityConfig(max_points=512, max_ds_points=256,
                                max_deskew_frames=64, max_imu_window=32,
                                max_keyframes=16, max_submap_kf=4),
        imu=ImuConfig(calib_time=0.05))

    ref = OdometryPipeline(cfg)
    s1 = replay_dataset(ds, ref)
    rt = ref.flush()

    bat = OdometryPipeline(cfg)
    batches = []
    s2 = replay_dataset(ds, bat, batch=2,
                        on_batch=lambda n: batches.append(n))
    bt = bat.flush()

    assert s1["n_scans"] == s2["n_scans"] > 0
    assert batches and batches[-1] == s2["n_scans"]
    np.testing.assert_allclose(bt, rt, rtol=0, atol=0)
