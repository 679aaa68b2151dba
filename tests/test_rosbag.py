"""ROS1 bag writer/reader roundtrip + end-to-end bag replay through the
odometry pipeline (the reference's primary validation path)."""

import numpy as np
import pytest

from noetic_slam_tpu.io import rosbag
from noetic_slam_tpu.utils import synthetic


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_bag_roundtrip(tmp_path, rng, compression):
    if compression == "lz4":
        from noetic_slam_tpu.utils import lz4frame

        if not lz4frame.available():
            pytest.skip("liblz4 unavailable")
    path = str(tmp_path / "t.bag")
    w = rosbag.BagWriter(path, compression=compression)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    tns = (np.arange(100) * 1000).astype(np.uint32)
    w.write_imu("/imu/data", 1.5, [0.1, 0.2, 0.3], [0, 0, 9.8])
    w.write_pointcloud2("/os1_points", 1.55, xyz, tns)
    w.write_imu("/imu/data", 1.6, [0.0, 0.0, 0.0], [0, 0, 9.8])
    w.close()

    events = list(rosbag.read_lidar_imu(path))
    kinds = [k for k, _ in events]
    assert kinds == ["imu", "scan", "imu"]
    imu0 = events[0][1]
    np.testing.assert_allclose(imu0["ang_vel"], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(imu0["lin_accel"], [0, 0, 9.8])
    assert abs(imu0["stamp"] - 1.5) < 1e-9
    scan = events[1][1]
    np.testing.assert_allclose(scan["xyz"], xyz, atol=1e-7)
    assert scan["time_field"] == "t"
    np.testing.assert_allclose(scan["point_time"], tns * 1e-9, atol=1e-12)


def test_bag_velodyne_time_field(tmp_path, rng):
    """'time' float32 field (Velodyne convention) must be detected."""
    import struct

    path = str(tmp_path / "v.bag")
    w = rosbag.BagWriter(path)
    # hand-build a cloud with a float32 'time' field
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    t = np.linspace(0, 0.1, 10).astype(np.float32)
    fid = b"vel"
    payload = struct.pack("<III", 0, 2, 0)
    payload += struct.pack("<I", len(fid)) + fid
    payload += struct.pack("<II", 1, 10)
    fields = [(b"x", 0, 7), (b"y", 4, 7), (b"z", 8, 7), (b"time", 12, 7)]
    payload += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        payload += struct.pack("<I", len(name)) + name
        payload += struct.pack("<IBI", off, dt, 1)
    payload += struct.pack("<B", 0) + struct.pack("<II", 16, 160)
    buf = np.zeros((10, 16), np.uint8)
    buf[:, :12] = xyz.view(np.uint8).reshape(10, 12)
    buf[:, 12:] = t.reshape(10, 1).view(np.uint8).reshape(10, 4)
    payload += struct.pack("<I", 160) + buf.tobytes() + struct.pack("<B", 1)
    w.write_raw("/velodyne_points", "sensor_msgs/PointCloud2", "x", 2.0,
                payload)
    w.close()

    (kind, msg), = list(rosbag.read_lidar_imu(path))
    assert msg["time_field"] == "time"
    np.testing.assert_allclose(msg["point_time"], t, atol=1e-7)


@pytest.mark.slow
def test_bag_replay_end_to_end(tmp_path):
    """Synthesize a bag from the simulator, replay it through the pipeline,
    check the trajectory tracks ground truth."""
    from tests.test_odometry_e2e import small_cfg
    from noetic_slam_tpu.runtime.pipeline import OdometryPipeline

    sim = synthetic.make_sim(duration=1.5, n_points=2048, calib_time=3.1,
                             seed=9)
    path = str(tmp_path / "sim.bag")
    w = rosbag.BagWriter(path)
    events = []
    for i, t in enumerate(sim.imu_stamps):
        events.append((t, "imu", i))
    for i, t in enumerate(sim.scan_stamps):
        events.append((t, "scan", i))
    events.sort(key=lambda e: e[0])
    EPOCH = 1_000_000.0  # ROS stamps are unsigned; shift the sim times
    for t, kind, i in events:
        if kind == "imu":
            w.write_imu("/imu/data_raw", t + EPOCH, sim.imu_ang[i],
                        sim.imu_acc[i])
        else:
            header, xyz, pt = sim.scan(i)
            w.write_pointcloud2("/os1_points", header + EPOCH, xyz,
                                (pt * 1e9).astype(np.uint32))
    w.close()

    pipe = OdometryPipeline(small_cfg())
    stats = rosbag.replay_bag(path, pipe)
    assert stats["n_scans"] == len(sim.scan_stamps)
    traj = pipe.flush()
    ate = synthetic.ate_rmse(traj[:, 0] - 1_000_000.0, traj[:, 1:4],
                             sim.gt_stamps, sim.gt_pos)
    assert ate < 0.06, ate


def test_lz4_frame_roundtrip():
    """LZ4 frame codec (ctypes liblz4) used for lz4 bag chunks."""
    from noetic_slam_tpu.utils import lz4frame

    if not lz4frame.available():
        pytest.skip("liblz4 unavailable")
    data = b"noetic" * 10_000 + bytes(range(256)) * 100
    comp = lz4frame.compress(data)
    assert len(comp) < len(data) // 2
    assert lz4frame.decompress(comp) == data
    # standard frame magic (roslz4 interop)
    assert comp[:4] == b"\x04\x22\x4d\x18"
