"""Native (C++) runtime components: build, ring buffer semantics, batch
packet parser vs the Python reference parser, UDP source loopback."""

import socket
import threading
import time

import numpy as np
import pytest

from noetic_slam_tpu.runtime import native
from noetic_slam_tpu.io import ouster as ou
from tests.test_ouster import _build_packet, _simple_info


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_ring_buffer_fifo(lib):
    rb = native.RingBuffer(8, 4)
    for i in range(4):
        rb.write(i.to_bytes(8, "little"))
    assert len(rb) == 4
    for i in range(4):
        assert int.from_bytes(rb.read(), "little") == i
    assert rb.read(timeout_ms=10) is None
    rb.close()


def test_ring_buffer_overwrite(lib):
    rb = native.RingBuffer(8, 2)
    assert not rb.write_overwrite((1).to_bytes(8, "little"))
    assert not rb.write_overwrite((2).to_bytes(8, "little"))
    assert rb.write_overwrite((3).to_bytes(8, "little"))  # drops oldest
    assert int.from_bytes(rb.read(), "little") == 2
    assert int.from_bytes(rb.read(), "little") == 3
    rb.close()


def test_ring_buffer_producer_consumer(lib):
    """Threaded smoke test mirroring the reference's ring_buffer_test.cpp
    fixture (random payloads through producer/consumer threads)."""
    rb = native.RingBuffer(16, 8)
    rng = np.random.default_rng(0)
    items = [rng.bytes(16) for _ in range(100)]
    got = []

    def producer():
        for it in items:
            rb.write(it)

    def consumer():
        for _ in items:
            got.append(rb.read())

    tp, tc = threading.Thread(target=producer), threading.Thread(
        target=consumer)
    tc.start(); tp.start()
    tp.join(5); tc.join(5)
    assert got == items
    rb.close()


def test_native_parser_matches_python(lib):
    info = _simple_info()
    pf = ou.PacketFormat(info)
    rng = np.random.default_rng(2)
    pkts = []
    for p in range(4):
        m_ids = np.arange(p * 8, p * 8 + 8)
        ts = 7_000_000 + m_ids * 250
        rngs = rng.integers(100, 200_000, size=(pf.h, 8))
        pkts.append(_build_packet(pf, 3, m_ids, ts, rngs))
    buf = b"".join(pkts)

    out = native.parse_lidar_packets(buf, 4, pf)
    # compare against the Python parser packet by packet
    for p in range(4):
        ts, m_id, status, rng_i, sig, refl, nir = pf.parse_lidar_packet(
            pkts[p])
        sl = slice(p * 8, p * 8 + 8)
        np.testing.assert_array_equal(out["ts"][sl], ts)
        np.testing.assert_array_equal(out["m_id"][sl], m_id)
        np.testing.assert_array_equal(out["status"][sl], status)
        np.testing.assert_array_equal(out["range"][:, sl], rng_i)
        np.testing.assert_array_equal(out["signal"][:, sl], sig)
        np.testing.assert_array_equal(out["reflectivity"][:, sl], refl)
    assert (out["frame_id"] == 3).all()


def test_udp_source_loopback(lib):
    info = _simple_info()
    pf = ou.PacketFormat(info)
    src = native.UdpSource(47857, 47858, pf.lidar_packet_size, 48)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        m_ids = np.arange(8)
        pkt = _build_packet(pf, 9, m_ids, 1000 + m_ids,
                            np.full((pf.h, 8), 5000))
        imu_pkt = bytes(48)
        for _ in range(3):
            tx.sendto(pkt, ("127.0.0.1", 47857))
        tx.sendto(imu_pkt, ("127.0.0.1", 47858))
        time.sleep(0.2)
        got = src.read_lidar(timeout_ms=1000)
        assert got == pkt
        assert src.read_imu(timeout_ms=1000) == imu_pkt
    finally:
        src.close()


def test_udp_read_lidar_many(lib):
    """Batched drain: one native call returns all queued packets
    contiguously (the live path's per-packet-hop elimination)."""
    info = _simple_info()
    pf = ou.PacketFormat(info)
    src = native.UdpSource(47861, 0, pf.lidar_packet_size, 48)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pkts = []
        for k in range(5):
            m_ids = np.arange(8) + 8 * k
            pkts.append(_build_packet(pf, 9, m_ids, 1000 + m_ids,
                                      np.full((pf.h, 8), 4000 + k)))
            tx.sendto(pkts[-1], ("127.0.0.1", 47861))
        time.sleep(0.3)
        buf, n = src.read_lidar_many(max_n=16, timeout_ms=1000)
        assert n == 5
        sz = pf.lidar_packet_size
        for k in range(5):
            assert buf[k * sz:(k + 1) * sz] == pkts[k]
        # queue drained
        buf2, n2 = src.read_lidar_many(max_n=16, timeout_ms=50)
        assert n2 == 0 and buf2 == b""
    finally:
        src.close()
