"""Live-driver endurance run: loopback UDP at the 2048x20 sensor mode with
injected loss/reorder/jitter through the native ingest path.

The VERDICT r2 item 8 artifact: stream >= ENDURANCE_SECS seconds of
synthetic 2048-columns-per-frame, 20 fps packets (5,120 pkt/s, the
sensor's fastest mode — driver.launch:15-21) through

    native UdpSource (C++ ring + receiver thread)
    -> ScanBatcher.push_many (native batch parse)
    -> make_xyz_lut projection (the full ingest pipeline of
       runtime/live.LiveDriver's sensor-timestamp path)

while a sender thread injects:
- random packet LOSS (~0.4 %),
- in-frame REORDERING (windowed shuffles),
- timing JITTER (0-2 ms bursts),
- one mid-run 50-packet BURST loss.

Every completed frame's RANGE image is verified bit-exactly against the
deterministic template pattern for every column the batcher marks valid —
"zero scan corruption" means zero mismatched pixels over the whole run.
Missing columns must be bounded by the injected loss (each lost packet
costs exactly columns_per_packet columns; the burst costs its span).

Writes ENDURANCE_r{N}.json with scans-assembled/s, packet accounting, and
the native ring's own drop counter. Reference behavior being matched:
ThreadSafeRingBuffer backpressure + poll-error accounting of
os_sensor_nodelet.cpp:432-469.

Env: ENDURANCE_SECS (default 60), ENDURANCE_OUT, ENDURANCE_PORT.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noetic_slam_tpu.io import ouster as ou  # noqa: E402
from noetic_slam_tpu.runtime import native  # noqa: E402

NF = 4                      # distinct template frames (pattern period)
FPS = 20.0


def sensor_info(w=2048, h=64):
    return ou.SensorInfo(
        pixels_per_column=h, columns_per_frame=w, columns_per_packet=8,
        pixel_shift_by_row=np.zeros(h, int),
        beam_azimuth_angles=np.zeros(h),
        beam_altitude_angles=np.linspace(-16, 16, h),
        beam_to_lidar=np.eye(4), lidar_to_sensor=np.eye(4),
        udp_profile_lidar=ou.PROFILE_SINGLE)


def expected_range(h, w, f):
    """Deterministic RANGE pattern of template frame f (uint32 mm)."""
    u = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return ((1000 + (u * 131 + c * 17 + f * 7919) % 40000)
            .astype(np.uint32))


def build_packet(pf, frame_id, m_ids, ts, rngs):
    """One RNG19 single-return packet (parsing.cpp layout) — same builder
    as tests/test_ouster._build_packet."""
    buf = bytearray(pf.lidar_packet_size)
    buf[2:4] = int(frame_id).to_bytes(2, "little")
    for c in range(pf.cols):
        base = pf.packet_header_size + c * pf.col_size
        buf[base:base + 8] = int(ts[c]).to_bytes(8, "little")
        buf[base + 8:base + 10] = int(m_ids[c]).to_bytes(2, "little")
        buf[base + 10:base + 12] = (1).to_bytes(2, "little")
        for u in range(pf.h):
            px = base + pf.col_header_size + u * pf.chan
            word = int(rngs[u, c]) & 0x0007FFFF
            buf[px:px + 4] = word.to_bytes(4, "little")
    return buf


def main():
    secs = float(os.environ.get("ENDURANCE_SECS", "60"))
    port = int(os.environ.get("ENDURANCE_PORT", "47921"))
    out_path = os.environ.get(
        "ENDURANCE_OUT", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ENDURANCE_r04.json"))

    lib = native.load()
    if lib is None:
        print("native library unavailable", file=sys.stderr)
        return 2

    info = sensor_info()
    pf = ou.PacketFormat(info)
    h, w = info.pixels_per_column, info.columns_per_frame
    cpp = info.columns_per_packet
    ppf = w // cpp                      # packets per frame (256)
    pkt_rate = ppf * FPS

    print(f"endurance: {secs:.0f}s @ {w}x{FPS:.0f} = {pkt_rate:.0f} pkt/s, "
          f"{pf.lidar_packet_size} B/pkt", file=sys.stderr)

    # template packets: NF frames x ppf packets, frame_id patched per send
    t0 = time.perf_counter()
    templates = []
    for f in range(NF):
        rngs = expected_range(h, w, f)
        frame = []
        for p in range(ppf):
            m_ids = np.arange(p * cpp, (p + 1) * cpp)
            ts = (np.uint64(1 + f) * np.uint64(10 ** 9)
                  + m_ids.astype(np.uint64) * np.uint64(25_000))
            frame.append(build_packet(pf, f, m_ids, ts,
                                      rngs[:, p * cpp:(p + 1) * cpp]))
        templates.append(frame)
    print(f"template build: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    exp = [expected_range(h, w, f) for f in range(NF)]

    # 16 frames of ring depth: the Python consumer projects/verifies a
    # whole frame (~10 ms) between drains, and host scheduling jitter must
    # be absorbed by the ring, not dropped (ThreadSafeRingBuffer role).
    src = native.UdpSource(port, port + 1, pf.lidar_packet_size,
                           pf.imu_packet_size, depth=16 * ppf)
    batcher = ou.ScanBatcher(info)
    direction, offset = ou.make_xyz_lut(info)

    stats = {"sent": 0, "loss_injected": 0, "reorder_injected": 0,
             "burst_lost": 0}
    stop = threading.Event()

    def sender():
        import socket

        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rng = np.random.default_rng(7)
        frame = 0
        t_start = time.monotonic()
        burst_at = int(secs * FPS) // 2     # frame index of the burst
        while not stop.is_set() and time.monotonic() - t_start < secs:
            f = frame % NF
            order = list(range(ppf))
            # windowed in-frame reordering (~1% of 4-packet windows)
            for k in range(0, ppf - 4, 4):
                if rng.random() < 0.01:
                    seg = order[k:k + 4]
                    rng.shuffle(seg)
                    order[k:k + 4] = seg
                    stats["reorder_injected"] += 1
            drop_burst = range(100, 150) if frame == burst_at else ()
            for p in order:
                if p in drop_burst:
                    stats["burst_lost"] += 1
                    continue
                if rng.random() < 0.004:
                    stats["loss_injected"] += 1
                    continue
                tpl = templates[f][p]
                tpl[2:4] = (frame & 0xFFFF).to_bytes(2, "little")
                tx.sendto(tpl, ("127.0.0.1", port))
                stats["sent"] += 1
                if rng.random() < 0.002:     # jitter burst
                    time.sleep(rng.random() * 0.002)
            frame += 1
            # pace to FPS
            t_next = t_start + frame / FPS
            d = t_next - time.monotonic()
            if d > 0:
                time.sleep(d)
        stop.set()

    th = threading.Thread(target=sender, daemon=True)

    scans = 0
    corrupt_pixels = 0
    missing_cols = 0
    complete_frames = 0
    proj_points = 0
    t_run0 = time.monotonic()
    th.start()
    windows = []
    win_t, win_scans = time.monotonic(), 0
    while True:
        buf, n = src.read_lidar_many(max_n=256, timeout_ms=100)
        if n == 0:
            if stop.is_set():
                break                   # sender done and queue drained
            continue
        for scan in batcher.push_many(buf, n):
            fid = scan.frame_id % NF
            valid = scan.status != 0
            missing_cols += int((~valid).sum())
            if valid.all():
                complete_frames += 1
            # bit-exact content check on every valid column
            bad = (scan.range[:, valid] != exp[fid][:, valid]).sum()
            corrupt_pixels += int(bad)
            # full projection (the LiveDriver ingest cost)
            xyz, _rel_t, vmask, _ = ou.scan_to_points(
                scan, direction, offset, scan_ts_ns=int(scan.timestamp[0]))
            proj_points += int(vmask.sum())
            scans += 1
            win_scans += 1
            now = time.monotonic()
            if now - win_t >= 10.0:
                windows.append(round(win_scans / (now - win_t), 2))
                win_t, win_scans = now, 0
    wall = time.monotonic() - t_run0
    th.join(timeout=5)

    expected_frames = int(secs * FPS)
    lost_pkts = stats["loss_injected"] + stats["burst_lost"]
    # each lost packet blanks exactly cpp columns of one frame (the last
    # in-flight frame at shutdown also counts as missing-by-truncation)
    missing_bound = (lost_pkts + 2 * ppf) * cpp
    result = {
        "artifact": "live ingest endurance (scripts/endurance.py)",
        "mode": f"{w}x{FPS:.0f}",
        "seconds": round(wall, 1),
        "packet_rate_target": pkt_rate,
        "packets_sent": stats["sent"],
        "loss_injected": stats["loss_injected"],
        "burst_lost": stats["burst_lost"],
        "reorder_windows_injected": stats["reorder_injected"],
        "native_ring_dropped": src.lidar_dropped,
        "scans_assembled": scans,
        "scans_per_sec": round(scans / max(wall, 1e-9), 2),
        "scans_per_sec_windows": windows,
        "complete_frames": complete_frames,
        "missing_columns": missing_cols,
        "missing_columns_bound": missing_bound,
        "corrupt_pixels": corrupt_pixels,
        "projected_points": proj_points,
    }
    src.close()
    with open(out_path, "w") as fjs:
        json.dump(result, fjs, indent=1)
    print(json.dumps(result, indent=1))
    ok = (corrupt_pixels == 0
          and scans >= expected_frames - 3
          and missing_cols <= missing_bound
          and result["native_ring_dropped"] == 0)
    print(f"ENDURANCE {'OK' if ok else 'FAILED'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
