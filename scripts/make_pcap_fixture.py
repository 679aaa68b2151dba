"""Generate an Ouster-wire-format pcap fixture + metadata + ground truth.

Synthesizes the EXACT UDP stream a live OS-16-class sensor produces —
RNG19_RFL8_SIG16_NIR16 lidar packets (parsing.cpp column layout) and
48-byte IMU packets (parsing.cpp:450-498) — from an analytic scene
(cylinder room + floor + ceiling) traversed by a C1 trajectory with a
stationary hold for IMU calibration. Ranges are exact ray intersections
per column-firing pose, so the stream is properly motion-distorted and
the per-point timestamps are real column timestamps.

This closes the pcap half of the real-format fixture story (VERDICT r1
item 1): `cli slam --pcap cap.pcap --metadata meta.json` runs the full
packet -> ScanBatcher -> XYZ LUT -> deskew -> odometry stack on it, and
tests/test_pcap_e2e.py pins the ATE against the generator's ground truth.

The fixture is generated (deterministic, seeded) rather than committed:
~7 MB of packets rebuild in ~2 s from this script.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from noetic_slam_tpu.io import ouster as ou  # noqa: E402
from noetic_slam_tpu.io import pcap as pcap_mod  # noqa: E402
from noetic_slam_tpu.utils import synthetic  # noqa: E402
from scripts.make_mulran_fixture import still_then  # noqa: E402

BASE_NS = 1_600_000_000_000_000_000
G = synthetic.GRAVITY


def make_info(h=16, w=512):
    return ou.SensorInfo(
        pixels_per_column=h, columns_per_frame=w, columns_per_packet=16,
        pixel_shift_by_row=np.zeros(h, int),
        beam_azimuth_angles=np.zeros(h),
        beam_altitude_angles=np.linspace(-15.0, 15.0, h),
        beam_to_lidar=np.eye(4), lidar_to_sensor=np.eye(4),
        udp_profile_lidar=ou.PROFILE_SINGLE)


# Vertical pillars inside the room: a bare cylinder room is rotationally
# symmetric (yaw + tangential translation near-degenerate for
# registration); pillars break the symmetry like furniture/columns would.
_PILLARS = np.array([[3.0, 1.0, 0.45], [-2.0, 4.0, 0.6], [1.5, -3.5, 0.5],
                     [-4.0, -2.0, 0.4], [5.0, -1.0, 0.35],
                     [-1.0, 6.0, 0.5], [6.0, 3.0, 0.45]])


def _ranges_m(dirs_w, origin, radius=8.0, z_floor=-0.8, z_ceil=3.0,
              rng=None):
    """Exact ray ranges from ``origin`` along world directions into the
    cylinder room (+ pillars); 5 mm surface noise."""
    ux, uy, uz = dirs_w[:, 0], dirs_w[:, 1], dirs_w[:, 2]
    px, py, pz = origin
    a = ux * ux + uy * uy
    b = 2 * (px * ux + py * uy)
    c = px * px + py * py - radius * radius
    disc = np.maximum(b * b - 4 * a * c, 0.0)
    r_cyl = np.where(a > 1e-9, (-b + np.sqrt(disc)) / np.maximum(
        2 * a, 1e-9), np.inf)
    r_fl = np.where(uz < -1e-6, (z_floor - pz) / uz, np.inf)
    r_ce = np.where(uz > 1e-6, (z_ceil - pz) / uz, np.inf)
    r = np.minimum(np.minimum(np.where(r_cyl > 0, r_cyl, np.inf), r_fl),
                   r_ce)
    for cx, cy, pr in _PILLARS:
        qx, qy = px - cx, py - cy
        bp = 2 * (qx * ux + qy * uy)
        cp = qx * qx + qy * qy - pr * pr
        dp = bp * bp - 4 * a * cp
        hit = (dp > 0) & (a > 1e-9)
        r_p = np.where(hit, (-bp - np.sqrt(np.maximum(dp, 0.0)))
                       / np.maximum(2 * a, 1e-9), np.inf)
        r_p = np.where(r_p > 0.1, r_p, np.inf)
        r = np.minimum(r, r_p)
    if rng is not None:
        r = r + rng.normal(scale=0.005, size=r.shape)
    return r


def _lidar_packet(pf, frame_id, m_ids, ts_ns, rng_mm):
    buf = bytearray(pf.lidar_packet_size)
    buf[2:4] = int(frame_id).to_bytes(2, "little")
    for c in range(pf.cols):
        base = pf.packet_header_size + c * pf.col_size
        buf[base:base + 8] = int(ts_ns[c]).to_bytes(8, "little")
        buf[base + 8:base + 10] = int(m_ids[c]).to_bytes(2, "little")
        buf[base + 10:base + 12] = (1).to_bytes(2, "little")
        for u in range(pf.h):
            px = base + pf.col_header_size + u * pf.chan
            word = int(rng_mm[u, c]) & 0x0007FFFF
            buf[px:px + 4] = word.to_bytes(4, "little")
            buf[px + 4] = 200                       # reflectivity
    return bytes(buf)


def _imu_packet(ts_ns, accel_ms2, gyro_rads):
    """48-byte IMU packet: sys ts at 0:8, accel [g] f32 at 24:36, gyro
    [deg/s] f32 at 36:48 (parse_imu_packet's inverse)."""
    buf = bytearray(48)
    buf[0:8] = int(ts_ns).to_bytes(8, "little")
    f = np.empty(6, np.float32)
    f[0:3] = np.asarray(accel_ms2) / G
    f[3:6] = np.asarray(gyro_rads) * 180.0 / np.pi
    buf[24:48] = f.tobytes()
    return bytes(buf)


def write_fixture(out_dir: str, hold: float = 3.5, drive: float = 4.0,
                  seed: int = 9, h: int = 16, w: int = 512,
                  frame_hz: float = 10.0) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    info = make_info(h, w)
    pf = ou.PacketFormat(info)
    direction, offset = ou.make_xyz_lut(info)
    # the LUT folds the mm->m range unit into direction (xyz = dir *
    # range_mm); the raycast needs unit directions
    dirs = direction.reshape(h, w, 3)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rng = np.random.default_rng(seed)
    fn = still_then(synthetic._pose_of, hold)

    packets = []
    # IMU stream at 100 Hz
    T = hold + drive
    for t in np.arange(0.0, T, 0.01):
        wv, f = synthetic._numeric_imu(t, pose_fn=fn)
        packets.append((t, 7503, _imu_packet(BASE_NS + int(t * 1e9),
                                             f, wv)))

    # lidar frames: column v of frame k fires at k/hz + v * (1/hz)/w
    dt_col = (1.0 / frame_hz) / w
    cpp = info.columns_per_packet
    n_frames = int(T * frame_hz) - 1
    for k in range(n_frames):
        t0 = k / frame_hz
        for p in range(w // cpp):
            m_ids = np.arange(cpp) + p * cpp
            t_cols = t0 + m_ids * dt_col
            ts_ns = (BASE_NS + (t_cols * 1e9)).astype(np.uint64)
            rng_mm = np.empty((h, cpp), np.uint32)
            for ci, (tv, v) in enumerate(zip(t_cols, m_ids)):
                R, ppos = fn(tv)
                dw = dirs[:, v, :] @ R.T
                r = _ranges_m(dw, ppos, rng=rng)
                rng_mm[:, ci] = np.clip(r * 1000.0, 0, 40_000).astype(
                    np.uint32)
            packets.append((float(t_cols[0]), 7502,
                            _lidar_packet(pf, k + 1, m_ids, ts_ns, rng_mm)))

    packets.sort(key=lambda e: e[0])
    pcap_path = os.path.join(out_dir, "fixture.pcap")
    n = pcap_mod.write_pcap(pcap_path, packets)

    meta_path = os.path.join(out_dir, "metadata.json")
    with open(meta_path, "w") as f:
        f.write(info.to_json())

    gt_path = os.path.join(out_dir, "gt.tum")
    with open(gt_path, "w") as f:
        for t in np.arange(0.0, T, 0.05):
            R, p = fn(t)
            q = synthetic._mat_to_quat(R)
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")

    return {"pcap": pcap_path, "metadata": meta_path, "gt": gt_path,
            "n_packets": n, "n_frames": n_frames,
            "bytes": os.path.getsize(pcap_path)}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "out/pcap_fixture"
    print(write_fixture(out))
