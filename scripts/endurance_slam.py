"""Endurance with the FULL SLAM system attached (VERDICT r4 item #8).

The r4 endurance artifact proved packet->scan assembly at 2048x20 under
injected faults, ingest-only. This harness closes the loop: a sender
thread streams a SYNTHETIC DRIVE (utils.synthetic world + spiral
trajectory) encoded as real Ouster UDP packets — RNG19 lidar packets at
the 1024x20 sensor mode plus 100 Hz IMU packets — over loopback into the
COMPLETE live stack:

    native UdpSource (C++ ring) -> ScanBatcher -> XYZ LUT
      -> SlamSystem (odometry + TSDF + archive + descriptors + closures,
         pipelined sync protocol) via runtime.live.LiveDriver

with the same fault injection as scripts/endurance.py (random ~0.4 %
packet loss, windowed in-frame reordering, jitter bursts). The lidar
packets are produced by RASTERIZING each simulated sweep into the (H, W)
range image the LUT inverts — the receive side reconstructs a resampled
point cloud of the same world surfaces, exactly like a real sensor
resamples the scene every sweep.

Pass criteria (ENDURANCE_r05.json):
  - sustained processed-scan rate >= ~sensor rate (20 fps) after warmup;
  - zero native-ring drops;
  - zero lost keyframes (outbox contract under live load);
  - end-pose sanity: final estimated position within a few meters of the
    ground-truth trajectory end (odometry stayed locked through faults).

Reference contract: the driver's live chain os_sensor_nodelet.cpp:510-570
+ the odometry node consuming it online at the sensor rate
(odom.cc:1966-1971).

Env: ESLAM_SECS (default 60), ESLAM_OUT, ESLAM_PORT, ESLAM_TINY=1.
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

FPS = 20.0
IMU_HZ = 100.0
BASE_NS = 1_700_000_000_000_000_000


def sensor_info(w=1024, h=64):
    return ou.SensorInfo(
        pixels_per_column=h, columns_per_frame=w, columns_per_packet=8,
        pixel_shift_by_row=np.zeros(h, int),
        beam_azimuth_angles=np.zeros(h),
        beam_altitude_angles=np.linspace(-16.0, 16.0, h),
        beam_to_lidar=np.eye(4), lidar_to_sensor=np.eye(4),
        udp_profile_lidar=ou.PROFILE_SINGLE)


def rasterize(xyz: np.ndarray, h: int, w: int, alt_lo=-16.0, alt_hi=16.0):
    """Sensor-frame points -> (h, w) uint32 range image (mm), inverting
    the make_xyz_lut convention (beam_to_lidar = I, beam_azimuth = 0:
    direction(u, v) = [cos e cos a, sin e cos a, sin a], e = 2pi - v dv).
    Bin collisions keep the NEAREST return, like a real sensor."""
    r = np.linalg.norm(xyz, axis=-1)
    ok = r > 0.3
    xyz, r = xyz[ok], r[ok]
    alt = np.degrees(np.arcsin(np.clip(xyz[:, 2] / r, -1, 1)))
    u = np.clip(np.round((alt - alt_lo) / (alt_hi - alt_lo) * (h - 1)),
                0, h - 1).astype(np.int64)
    enc = np.arctan2(xyz[:, 1], xyz[:, 0]) % (2 * np.pi)
    v = np.round((2 * np.pi - enc) / (2 * np.pi / w)).astype(np.int64) % w
    rng_mm = np.round(r * 1000.0).astype(np.uint32)
    img = np.zeros((h, w), np.uint32)
    # nearest-return collision rule: sort by descending range so the
    # nearest lands last
    order = np.argsort(-r)
    img[u[order], v[order]] = rng_mm[order]
    return img


def build_lidar_packets(pf, frame_id, img, t0_ns, col_dt_ns):
    """Encode one (h, w) range image as RNG19 single-return packets."""
    w = img.shape[1]
    cpp = pf.cols
    pkts = []
    for p in range(w // cpp):
        buf = bytearray(pf.lidar_packet_size)
        buf[2:4] = int(frame_id & 0xFFFF).to_bytes(2, "little")
        for c in range(cpp):
            m_id = p * cpp + c
            base = pf.packet_header_size + c * pf.col_size
            ts = t0_ns + m_id * col_dt_ns
            buf[base:base + 8] = int(ts).to_bytes(8, "little")
            buf[base + 8:base + 10] = int(m_id).to_bytes(2, "little")
            buf[base + 10:base + 12] = (1).to_bytes(2, "little")
            col = img[:, m_id]
            for u in range(pf.h):
                px = base + pf.col_header_size + u * pf.chan
                word = int(col[u]) & 0x0007FFFF
                buf[px:px + 4] = word.to_bytes(4, "little")
        pkts.append(bytes(buf))
    return pkts


def build_imu_packet(t_ns, accel_ms2, gyro_rads):
    buf = bytearray(48)
    buf[0:8] = int(t_ns).to_bytes(8, "little")
    vals = np.concatenate([np.asarray(accel_ms2) / ou.STANDARD_G,
                           np.degrees(np.asarray(gyro_rads))]
                          ).astype(np.float32)
    buf[24:48] = vals.tobytes()
    return bytes(buf)


def main():
    tiny = os.environ.get("ESLAM_TINY") == "1"
    secs = float(os.environ.get("ESLAM_SECS", "8" if tiny else "60"))
    port = int(os.environ.get("ESLAM_PORT", "47931"))
    out_path = os.environ.get(
        "ESLAM_OUT", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ENDURANCE_r05.json"))

    if native.load() is None:
        print("native library unavailable", file=sys.stderr)
        return 2

    import jax

    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               KeyframeConfig, TsdfConfig)
    from noetic_slam_tpu.runtime import compile_cache
    from noetic_slam_tpu.runtime.live import LiveDriver
    from noetic_slam_tpu.runtime.slam import SlamSystem
    from noetic_slam_tpu.utils import synthetic

    compile_cache.enable()
    if tiny:
        info = sensor_info(w=256, h=32)
        cap = CapacityConfig(
            max_points=4096, max_ds_points=1024, max_deskew_frames=512,
            max_imu_window=64, max_keyframes=24, max_submap_kf=8,
            max_trajectory=4096)
        tsdf = TsdfConfig(voxel_size=0.25, truncation=0.75, max_blocks=4096,
                          space_carving=False, scan_block_cap=1024)
        n_pts = 2048
    else:
        info = sensor_info(w=1024, h=64)
        cap = CapacityConfig(
            max_points=8192, max_ds_points=4096, max_deskew_frames=1024,
            max_imu_window=128, max_keyframes=128, max_submap_kf=16,
            max_trajectory=16384)
        tsdf = TsdfConfig(voxel_size=0.2, truncation=0.6, max_blocks=16384,
                          space_carving=False, scan_block_cap=2048)
        n_pts = 8192
    cfg = DlioConfig(capacity=cap, adaptive=False,
                     keyframe=KeyframeConfig(thresh_dist=0.5,
                                             thresh_rot=45.0),
                     tsdf=tsdf)
    pf = ou.PacketFormat(info)
    h, w = info.pixels_per_column, info.columns_per_frame
    ppf = w // info.columns_per_packet
    calib = 3.1
    dur = calib + secs + 0.3

    print(f"endurance+slam: {secs:.0f}s drive @ {w}x{FPS:.0f} "
          f"({ppf * FPS:.0f} pkt/s) + {IMU_HZ:.0f} Hz IMU, "
          f"backend={jax.default_backend()}", file=sys.stderr)
    sim = synthetic.make_sim(duration=secs + 0.3, scan_hz=FPS,
                             imu_hz=IMU_HZ, n_points=n_pts,
                             calib_time=calib, seed=41,
                             pose_fn=synthetic.spiral_pose_of,
                             imu_noise=0.0005)

    # pre-encode every frame + IMU packet (sender must hit 20 fps pacing)
    t_enc = time.perf_counter()
    col_dt_ns = int(1e9 / FPS / w)
    frames = []
    for i, t in enumerate(sim.scan_stamps):
        _, xyz, _ = sim.scan(i)
        img = rasterize(xyz, h, w)
        t0_ns = BASE_NS + int(round(t * 1e9))
        frames.append(build_lidar_packets(pf, i, img, t0_ns, col_dt_ns))
    imu_pkts = [build_imu_packet(BASE_NS + int(round(t * 1e9)),
                                 sim.imu_acc[k], sim.imu_ang[k])
                for k, t in enumerate(sim.imu_stamps)]
    print(f"encode: {time.perf_counter() - t_enc:.1f}s "
          f"({len(frames)} frames)", file=sys.stderr)

    slam = SlamSystem(cfg, enable_tsdf=True, enable_loop_closure=True,
                      loop_radius=4.0, loop_min_gap=15, pipelined=True)
    t_w = time.perf_counter()
    slam.warmup()
    warmup_s = time.perf_counter() - t_w
    print(f"warmup: {warmup_s:.1f}s", file=sys.stderr)

    driver = LiveDriver(slam, info, lidar_port=port, imu_port=port + 1,
                        timestamp_mode="sensor", max_read_errors=10**9)

    stats = {"sent": 0, "loss": 0, "reorder": 0, "imu_sent": 0}
    stop = threading.Event()

    def sender():
        import socket

        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rng = np.random.default_rng(7)
        t_start = time.monotonic()
        # wall time 0 maps to sim time -calib (static IMU first)
        imu_i = 0
        frame = 0
        n_imu = len(sim.imu_stamps)
        while not stop.is_set() and (imu_i < n_imu or frame < len(frames)):
            now = time.monotonic() - t_start
            sim_now = now - calib
            # IMU due
            while imu_i < n_imu and sim.imu_stamps[imu_i] <= sim_now:
                tx.sendto(imu_pkts[imu_i], ("127.0.0.1", port + 1))
                stats["imu_sent"] += 1
                imu_i += 1
            # frame due (scan i at sim time scan_stamps[i])
            if frame < len(frames) and sim.scan_stamps[frame] <= sim_now:
                order = list(range(ppf))
                for k in range(0, ppf - 4, 4):
                    if rng.random() < 0.01:
                        seg = order[k:k + 4]
                        rng.shuffle(seg)
                        order[k:k + 4] = seg
                        stats["reorder"] += 1
                for p in order:
                    if rng.random() < 0.004:
                        stats["loss"] += 1
                        continue
                    tx.sendto(frames[frame][p], ("127.0.0.1", port))
                    stats["sent"] += 1
                    if rng.random() < 0.002:
                        time.sleep(rng.random() * 0.002)
                frame += 1
            else:
                time.sleep(0.0015)
        stop.set()

    th = threading.Thread(target=sender, daemon=True)
    t_run = time.monotonic()
    th.start()
    windows = []
    win_t, win_n = time.monotonic(), driver.n_scans
    last_closure_attempt = 0
    while True:
        driver.poll_once(timeout_ms=50)
        if driver.n_scans - last_closure_attempt >= 16:
            slam.maybe_close_loop()
            last_closure_attempt = driver.n_scans
        now = time.monotonic()
        if now - win_t >= 10.0:
            windows.append(round((driver.n_scans - win_n) / (now - win_t),
                                 2))
            win_t, win_n = now, driver.n_scans
        if stop.is_set():
            # drain what's left, then exit
            for _ in range(50):
                driver.poll_once(timeout_ms=20)
            break
    wall = time.monotonic() - t_run
    th.join(timeout=5)
    slam.sync_graph()

    traj = slam.flush()
    end_err = None
    if len(traj):
        t_end = traj[-1, 0] - BASE_NS * 1e-9 + 0.0   # abs ns -> sim secs
        gt_end = np.stack([np.interp(t_end, sim.gt_stamps,
                                     sim.gt_pos[:, k]) for k in range(3)])
        end_err = float(np.linalg.norm(traj[-1, 1:4] - gt_end))
    drops = int(driver.source.lidar_dropped())

    steady = windows[1:] or windows
    result = {
        "artifact": "live endurance WITH full SLAM attached "
                    "(scripts/endurance_slam.py)",
        "backend": jax.default_backend(),
        "mode": f"{w}x{int(FPS)}",
        "seconds": secs,
        "frames_sent": len(frames),
        "scans_processed": driver.n_scans,
        "imu_received": driver.n_imu,
        "packets": stats,
        "ring_drops": drops,
        "windows_scans_per_sec": windows,
        "sustained_scans_per_sec": (round(float(np.median(steady)), 2)
                                    if steady else None),
        "warmup_seconds": round(warmup_s, 1),
        "wall_seconds": round(wall, 1),
        "loop_closures": slam.loop_closures,
        "sync_lost_keyframes": slam.sync_lost_keyframes,
        "loop_raced": slam.loop_raced,
        "end_pose_error_m": None if end_err is None else round(end_err, 3),
        "trajectory_poses": int(len(traj)),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    ok = (driver.n_scans >= 0.9 * len(frames)
          and slam.sync_lost_keyframes == 0
          and (end_err is None or end_err < 5.0))
    print(f"ENDURANCE+SLAM {'OK' if ok else 'FAILED'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
