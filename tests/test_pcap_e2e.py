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


def test_dual_return_pcap_stream_e2e(tmp_path):
    """Dual-return wire-format stream end-to-end (VERDICT r2 'harder
    fixtures' item): synthesize a RNG19_RFL8_SIG16_NIR16_DUAL packet
    stream with a 2nd return 1.5 m beyond the 1st (foliage-style), write
    a real pcap, replay it through read_pcap -> ScanBatcher, and project
    BOTH returns — the 2nd-return cloud must land ~1.5 m further out
    (the reference's per-return PointCloudProcessor role,
    point_cloud_processor.h:62-74)."""
    from noetic_slam_tpu.io import ouster as ou
    from noetic_slam_tpu.io import pcap as pcap_mod
    from tests.test_ouster import _build_packet_fields, _simple_info

    info = _simple_info(h=8, w=32, profile=ou.PROFILE_DUAL)
    pf = ou.PacketFormat(info)
    h, w = info.pixels_per_column, info.columns_per_frame
    r1 = np.full((h, w), 8000, np.uint32)          # 8 m first return
    r2 = r1 + 1500                                 # +1.5 m second return
    packets = []
    for f in range(3):
        for p in range(w // pf.cols):
            m_ids = np.arange(p * pf.cols, (p + 1) * pf.cols)
            ts = 10 ** 9 * (f + 1) + m_ids.astype(np.uint64) * 1000
            cols = slice(p * pf.cols, (p + 1) * pf.cols)
            pkt = _build_packet_fields(
                pf, f, m_ids, ts,
                {"range": r1[:, cols], "range2": r2[:, cols],
                 "reflectivity": np.full((h, pf.cols), 7, np.uint8),
                 "reflectivity2": np.full((h, pf.cols), 9, np.uint8)})
            packets.append((float(f) + p * 1e-3, 7502, pkt))
    path = str(tmp_path / "dual.pcap")
    pcap_mod.write_pcap(path, packets, src_port=7502)

    direction, offset = ou.make_xyz_lut(info)
    scans = [s for (kind, _, s) in
             pcap_mod.replay_pcap_scans(path, info) if kind == "scan"]
    assert len(scans) >= 2
    scan = scans[0]
    assert scan.range2 is not None
    np.testing.assert_array_equal(scan.range[:, scan.status != 0], 8000)
    np.testing.assert_array_equal(scan.range2[:, scan.status != 0], 9500)
    xyz1, _, v1, _ = ou.scan_to_points(scan, direction, offset,
                                       scan_ts_ns=int(scan.timestamp[0]),
                                       return_idx=0)
    xyz2, _, v2, _ = ou.scan_to_points(scan, direction, offset,
                                       scan_ts_ns=int(scan.timestamp[0]),
                                       return_idx=1)
    d1 = np.linalg.norm(xyz1[v1], axis=-1)
    d2 = np.linalg.norm(xyz2[v2], axis=-1)
    assert v1.sum() == v2.sum() == h * w
    np.testing.assert_allclose(d2.mean() - d1.mean(), 1.5, atol=0.02)
