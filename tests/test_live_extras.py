"""Live-driver extras: multicast ingest, sensor self-reset, profiling utils."""

import socket
import time

import numpy as np
import pytest

from noetic_slam_tpu.io import ouster as ou
from noetic_slam_tpu.runtime import native
from noetic_slam_tpu.runtime.profiling import StageTimer, slope_timer


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_udp_source_multicast_receive():
    if native.load() is None:
        pytest.skip("native lib unavailable")
    group = "239.201.7.42"
    port = _free_port()
    src = native.UdpSource(port, 0, lidar_packet_size=256,
                           mtp_group=group)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 1)
        tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
        payload = bytes(range(200))
        got = None
        for _ in range(20):
            tx.sendto(payload, (group, port))
            got = src.read_lidar(timeout_ms=100)
            if got is not None:
                break
        tx.close()
        assert got == payload
    finally:
        src.close()


class _FakeSlam:
    def push_imu(self, *a):
        pass

    def process_scan(self, *a):
        pass


def _tiny_info():
    h = 16
    return ou.SensorInfo(
        pixels_per_column=h, columns_per_frame=64, columns_per_packet=16,
        pixel_shift_by_row=np.zeros(h, int),
        beam_azimuth_angles=np.zeros(h), beam_altitude_angles=np.zeros(h),
        beam_to_lidar=np.eye(4), lidar_to_sensor=np.eye(4),
        udp_profile_lidar=ou.PROFILE_SINGLE, lidar_mode="512x10")


def test_live_driver_self_reset_then_escalate():
    if native.load() is None:
        pytest.skip("native lib unavailable")
    from noetic_slam_tpu.runtime.live import LiveDriver

    drv = LiveDriver(_FakeSlam(), _tiny_info(), lidar_port=_free_port(),
                     imu_port=0, max_read_errors=2,
                     sensor_hostname="127.0.0.1:1",  # unroutable -> best effort
                     max_resets=2)
    try:
        first_source = drv.source
        # errors accumulate; reset should swap the source without raising
        drv.poll_once(timeout_ms=1)
        drv.poll_once(timeout_ms=1)
        assert drv.n_resets == 1
        assert drv.source is not first_source
        # exhaust resets -> escalates
        with pytest.raises(TimeoutError):
            for _ in range(10):
                drv.poll_once(timeout_ms=1)
        assert drv.n_resets == 2
    finally:
        drv.close()


def test_live_driver_no_hostname_raises():
    if native.load() is None:
        pytest.skip("native lib unavailable")
    from noetic_slam_tpu.runtime.live import LiveDriver

    drv = LiveDriver(_FakeSlam(), _tiny_info(), lidar_port=_free_port(),
                     imu_port=0, max_read_errors=2)
    try:
        with pytest.raises(TimeoutError):
            for _ in range(5):
                drv.poll_once(timeout_ms=1)
    finally:
        drv.close()


# ------------------------------------------------------------------ profiling
def test_slope_timer_cancels_fixed_overhead():
    per_op = 0.004
    fixed = 0.05

    def run_window(k):
        time.sleep(fixed + per_op * k)

    est = slope_timer(run_window, n1=2, n2=6)
    assert abs(est - per_op) < per_op * 0.5


def test_stage_timer_table():
    st = StageTimer()
    with st("a"):
        time.sleep(0.01)
    with st("b"):
        pass
    with st("a"):
        pass
    assert st.counts["a"] == 2
    txt = st.table()
    assert "a" in txt and "b" in txt and "mean_ms" in txt


def test_device_trace_tolerates_backend(tmp_path):
    from noetic_slam_tpu.runtime.profiling import device_trace

    with device_trace(str(tmp_path)) as started:
        assert started in (True, False)
