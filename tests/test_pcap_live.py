"""Pcap read/write roundtrip, pcap->scan replay, live driver over UDP."""

import socket
import time

import numpy as np
import pytest

from noetic_slam_tpu.io import ouster as ou
from noetic_slam_tpu.io import pcap
from tests.test_ouster import _build_packet, _simple_info


def _capture_packets(info, n_frames=2, rng=None):
    pf = ou.PacketFormat(info)
    pkts = []
    t = 100.0
    for f in range(n_frames):
        for p in range(info.columns_per_frame // info.columns_per_packet):
            m_ids = np.arange(p * 8, p * 8 + 8)
            ts = 10 ** 9 * (f + 1) + m_ids.astype(np.uint64) * 1000
            rngs = rng.integers(500, 60_000, size=(pf.h, 8))
            pkts.append((t, 7502, _build_packet(pf, f, m_ids, ts, rngs)))
            t += 0.001
    # one imu packet
    imu = bytearray(48)
    imu[0:8] = (123).to_bytes(8, "little")
    vals = np.array([0, 0, 1.0, 0, 0, 0], np.float32)
    imu[24:48] = vals.tobytes()
    pkts.append((t, 7503, bytes(imu)))
    return pkts


def test_pcap_roundtrip(tmp_path, rng):
    info = _simple_info()
    pkts = _capture_packets(info, rng=rng)
    path = str(tmp_path / "cap.pcap")
    n = pcap.write_pcap(path, pkts)
    assert n == len(pkts)
    back = list(pcap.read_pcap(path))
    assert len(back) == len(pkts)
    for (ts0, p0, d0), (ts1, p1, d1) in zip(pkts, back):
        assert p0 == p1 and d0 == d1
        assert abs(ts0 - ts1) < 1e-5
    # port filter
    only_imu = list(pcap.read_pcap(path, port=7503))
    assert len(only_imu) == 1


def test_pcap_scan_replay(tmp_path, rng):
    info = _simple_info()
    pkts = _capture_packets(info, n_frames=3, rng=rng)
    path = str(tmp_path / "cap.pcap")
    pcap.write_pcap(path, pkts)
    events = list(pcap.replay_pcap_scans(path, info))
    scans = [e for e in events if e[0] == "scan"]
    imus = [e for e in events if e[0] == "imu"]
    assert len(scans) == 3
    assert len(imus) == 1
    _, _, scan = scans[0]
    assert scan.status.all()
    np.testing.assert_allclose(imus[0][2], [0, 0, ou.STANDARD_G], rtol=1e-6)


def test_scan_images(rng):
    info = _simple_info()
    pf = ou.PacketFormat(info)
    batcher = ou.ScanBatcher(info)
    for p in range(info.columns_per_frame // 8):
        m_ids = np.arange(p * 8, p * 8 + 8)
        ts = 10 ** 9 + m_ids.astype(np.uint64) * 1000
        batcher.push(_build_packet(pf, 0, m_ids, ts,
                                   rng.integers(500, 60_000, size=(pf.h, 8))))
    scan = batcher.flush()
    imgs = ou.scan_images(scan, info)
    assert imgs["range"].shape == (4, 32)
    assert (imgs["range"] > 0).all()
    assert imgs["signal_norm"].min() >= 0 and imgs["signal_norm"].max() <= 1


def test_live_driver_over_udp(rng):
    """End-to-end: synthesize packets over loopback UDP; the live driver
    must batch frames and push IMU into the SLAM sink."""
    lib = __import__("noetic_slam_tpu.runtime.native",
                     fromlist=["load"]).load()
    if lib is None:
        pytest.skip("native toolchain unavailable")

    from noetic_slam_tpu.runtime.live import LiveDriver

    info = _simple_info()
    pf = ou.PacketFormat(info)

    class SinkSlam:
        def __init__(self):
            self.imu = []
            self.scans = []

        def push_imu(self, stamp, gyro, accel):
            self.imu.append(stamp)

        def process_scan(self, header, xyz, pt):
            self.scans.append((header, xyz))

    sink = SinkSlam()
    drv = LiveDriver(sink, info, lidar_port=47901, imu_port=47902)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for f in range(2):
            for p in range(info.columns_per_frame // 8):
                m_ids = np.arange(p * 8, p * 8 + 8)
                ts = 10 ** 9 * (f + 1) + m_ids.astype(np.uint64) * 1000
                pkt = _build_packet(pf, f, m_ids, ts,
                                    rng.integers(500, 60_000, size=(pf.h, 8)))
                tx.sendto(pkt, ("127.0.0.1", 47901))
        imu = bytearray(48)
        imu[24:48] = np.zeros(6, np.float32).tobytes()
        tx.sendto(bytes(imu), ("127.0.0.1", 47902))
        time.sleep(0.3)
        for _ in range(20):
            drv.poll_once(timeout_ms=50)
        # frame 0 completes when frame 1's first packet arrives
        assert drv.n_scans >= 1
        assert len(sink.scans) >= 1
        assert len(sink.imu) == 1
        header, xyz = sink.scans[0]
        assert xyz.shape == (4 * 32, 3)
    finally:
        drv.close()


@pytest.mark.parametrize("mode", ["sensor", "ptp", "host"])
def test_live_driver_timestamp_modes(rng, mode):
    """The three reference timestamp strategies
    (lidar_packet_handler.h:111-128): sensor clock, PTP with TAI offset,
    host receive time extrapolated to column 0."""
    lib = __import__("noetic_slam_tpu.runtime.native",
                     fromlist=["load"]).load()
    if lib is None:
        pytest.skip("native toolchain unavailable")

    from noetic_slam_tpu.runtime.live import LiveDriver

    info = _simple_info()
    pf = ou.PacketFormat(info)

    class SinkSlam:
        def __init__(self):
            self.imu = []
            self.scans = []

        def push_imu(self, stamp, gyro, accel):
            self.imu.append(stamp)

        def process_scan(self, header, xyz, pt):
            self.scans.append(header)

    sink = SinkSlam()
    port = {"sensor": 47911, "ptp": 47913, "host": 47915}[mode]
    drv = LiveDriver(sink, info, lidar_port=port, imu_port=port + 1,
                     timestamp_mode=mode, ptp_utc_tai_offset_s=-37.0)
    t_wall0 = time.time()
    base = 100_000_000_000
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for f in range(2):
            for p in range(info.columns_per_frame // 8):
                m_ids = np.arange(p * 8, p * 8 + 8)
                ts = base * (f + 1) + m_ids.astype(np.uint64) * 1000
                pkt = _build_packet(pf, f, m_ids, ts,
                                    rng.integers(500, 60_000, size=(pf.h, 8)))
                tx.sendto(pkt, ("127.0.0.1", port))
        imu = bytearray(48)
        imu[0:8] = (base + 500).to_bytes(8, "little")
        imu[24:48] = np.zeros(6, np.float32).tobytes()
        tx.sendto(bytes(imu), ("127.0.0.1", port + 1))
        time.sleep(0.3)
        for _ in range(30):
            drv.poll_once(timeout_ms=50)
        assert len(sink.scans) >= 1 and len(sink.imu) == 1
        header = sink.scans[0]
        if mode == "sensor":
            assert abs(header - base * 1e-9) < 1e-6
            assert abs(sink.imu[0] - (base + 500) * 1e-9) < 1e-9
        elif mode == "ptp":
            assert abs(header - (base * 1e-9 - 37.0)) < 1e-6
            assert abs(sink.imu[0] - ((base + 500) * 1e-9 - 37.0)) < 1e-9
        else:  # host: wall-clock time around the send window
            assert t_wall0 - 1.0 < header < time.time() + 1.0
    finally:
        drv.close()


def test_pcapng_reader(tmp_path, rng):
    """pcapng (SHB/IDB/EPB) captures parse identically to classic pcap,
    honoring per-interface if_tsresol."""
    import struct

    from noetic_slam_tpu.io import pcap as pc

    payloads = [rng.integers(0, 255, 64, dtype=np.uint8).tobytes()
                for _ in range(5)]
    stamps = [1.25 + 0.1 * i for i in range(5)]

    def block(btype, body):
        blen = 12 + len(body)
        pad = (4 - blen % 4) % 4
        blen += pad
        return (struct.pack("<II", btype, blen) + body + b"\0" * pad
                + struct.pack("<I", blen))

    # SHB: byte-order magic, version 1.0, section length -1
    shb = block(0x0A0D0D0A,
                struct.pack("<IHHq", 0x1A2B3C4D, 1, 0, -1))
    # IDB: linktype 1 (ethernet), snaplen, if_tsresol=9 (ns), endofopt
    idb = block(1, struct.pack("<HHI", 1, 0, 0)
                + struct.pack("<HH", 9, 1) + b"\x09\0\0\0"
                + struct.pack("<HH", 0, 0))
    blocks = [shb, idb]
    for ts, pl in zip(stamps, payloads):
        frame = pc._build_frame(7502, 7502, pl)
        ts_ns = int(ts * 1e9)
        body = struct.pack("<IIIII", 0, ts_ns >> 32, ts_ns & 0xFFFFFFFF,
                           len(frame), len(frame)) + frame
        blocks.append(block(6, body))
    path = str(tmp_path / "t.pcapng")
    with open(path, "wb") as f:
        f.write(b"".join(blocks))

    got = list(pc.read_pcap(path, port=7502))
    assert len(got) == 5
    for (ts, dst, pl), ts_e, pl_e in zip(got, stamps, payloads):
        assert dst == 7502 and pl == pl_e
        assert abs(ts - ts_e) < 1e-9

    # classic writer output parses to the same stream
    classic = str(tmp_path / "t.pcap")
    pc.write_pcap(classic, [(t, 7502, p) for t, p in zip(stamps, payloads)])
    got2 = list(pc.read_pcap(classic, port=7502))
    assert [p for _, _, p in got2] == payloads
