"""End-to-end ATE regression through the Ouster WIRE FORMAT: a generated
pcap of real RNG19 lidar + IMU packets (scripts/make_pcap_fixture.py)
replayed with `cli slam --pcap` — packets -> ScanBatcher -> XYZ LUT ->
deskew -> odometry -> TUM export — against the generator's ground truth.

This is the pcap-fixture counterpart of tests/test_mulran_e2e.py (the
reference's own no-hardware test mechanism is recorded pcaps,
ouster-sdk/tests/pcap_test.cpp). The fixture is rebuilt deterministically
(seeded) in ~2 s rather than committed (~8 MB of packets).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from scripts.make_pcap_fixture import write_fixture

    out = str(tmp_path_factory.mktemp("pcap_fixture"))
    meta = write_fixture(out)
    assert meta["n_packets"] > 2000
    return out


@pytest.mark.slow
def test_pcap_cli_slam_ate(fixture_dir, tmp_path):
    import yaml

    from noetic_slam_tpu import cli
    from noetic_slam_tpu.utils.synthetic import ate_rmse

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"capacity": {
        "max_points": 16384, "max_ds_points": 2048,
        "max_deskew_frames": 512, "max_imu_window": 64,
        "max_keyframes": 64, "max_submap_kf": 32,
        "max_trajectory": 512}}))
    out = tmp_path / "out"
    rc = cli.main(["slam", "--pcap", os.path.join(fixture_dir,
                                                  "fixture.pcap"),
                   "--metadata", os.path.join(fixture_dir, "metadata.json"),
                   "--out", str(out), "--config", str(cfg), "--no-tsdf"])
    assert rc == 0
    traj = np.loadtxt(out / "trajectory.tum")
    assert len(traj) >= 35
    gt = np.loadtxt(os.path.join(fixture_dir, "gt.tum"))
    from scripts.make_pcap_fixture import BASE_NS

    ate = ate_rmse(traj[:, 0] - BASE_NS * 1e-9, traj[:, 1:4],
                   gt[:, 0], gt[:, 1:4])
    # measured 0.052 m on CPU; 3x headroom for backend jitter
    assert ate < 0.15, f"wire-format e2e ATE {ate:.3f} m"


def test_fixture_packets_parse_back(fixture_dir):
    """The generated packets round-trip through the real parsers: frame
    count, full column coverage, plausible ranges, IMU units."""
    from noetic_slam_tpu.io import ouster as ou
    from noetic_slam_tpu.io.pcap import replay_pcap_scans

    info = ou.SensorInfo.from_json(
        open(os.path.join(fixture_dir, "metadata.json")).read())
    n_scans = n_imu = 0
    for ev in replay_pcap_scans(os.path.join(fixture_dir, "fixture.pcap"),
                                info):
        if ev[0] == "imu":
            n_imu += 1
            if n_imu == 1:
                _, _, accel, gyro = ev
                # stationary hold: pure gravity, no rotation
                np.testing.assert_allclose(np.linalg.norm(accel), 9.80665,
                                           rtol=1e-4)
                assert np.abs(gyro).max() < 1e-6
        else:
            scan = ev[2]
            n_scans += 1
            assert scan.status.all(), "every column present"
            r = scan.range[scan.range > 0] * 1e-3
            assert 0.5 < r.min() and r.max() < 20.0
        if n_scans >= 3 and n_imu >= 10:
            break
    assert n_scans >= 3 and n_imu >= 10
