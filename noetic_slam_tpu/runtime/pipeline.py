"""Host-side odometry pipeline driver.

This is the replacement for the reference's ROS node wiring + callbacks
(odom_node.cc:15-28, the rosparam/topic surface of OdomNode): a plain Python
object that

- buffers IMU samples (the reference's 5000-deep circular buffer,
  odom.h:220-223) in float64 absolute time on the host;
- performs the 3-second static IMU calibration + gravity alignment
  (odom.cc:863-948) before the first scan is processed;
- rebases every per-step time to the scan header stamp (device arrays are
  float32 *relative* seconds — absolute float64 stays here);
- pads/truncates scans to the static capacities and invokes the jitted
  odometry step with donated state;
- accumulates the trajectory + keyframe/map outputs.

The blocking LiDAR↔IMU sync (odom.cc:1024-1028 cv wait) becomes a data-
availability precondition: ``process_scan`` raises ``NeedMoreImu`` when the
buffer does not yet cover the sweep end, and the caller (replay harness or
live ingest loop) feeds more IMU and retries.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from noetic_slam_tpu.config.params import DlioConfig
from noetic_slam_tpu.models.odometry import (
    OdomState,
    StepInput,
    init_state,
    make_odometry_step,
)


class NeedMoreImu(Exception):
    """Raised when the IMU buffer does not yet cover the scan sweep."""


@dataclasses.dataclass
class TrajectoryEntry:
    stamp: float                 # absolute seconds
    p: np.ndarray                # (3,)
    q: np.ndarray                # (4,) wxyz


class OdometryPipeline:
    def __init__(self, cfg: DlioConfig | None = None, jit: bool = True):
        self.cfg = cfg or DlioConfig()
        self._step = make_odometry_step(self.cfg)
        if jit:
            self._step = jax.jit(self._step, donate_argnums=(0,))
        self.state: Optional[OdomState] = None

        # IMU circular buffer (host, float64 stamps).
        n = self.cfg.imu.buffer_size
        self._imu_stamps = np.zeros((0,), np.float64)
        self._imu_ang = np.zeros((0, 3), np.float64)
        self._imu_acc = np.zeros((0, 3), np.float64)
        self._imu_max = n

        # Calibration accumulator (odom.cc:863-948).
        self.calibrated = not (self.cfg.imu.calibrate_gyro
                               or self.cfg.imu.calibrate_accel
                               or self.cfg.imu.gravity_align)
        self._calib_first_stamp: Optional[float] = None
        self._calib_gyro: List[np.ndarray] = []
        self._calib_accel: List[np.ndarray] = []

        self.prev_scan_stamp: Optional[float] = None   # absolute
        self.prop_boundary: Optional[float] = None     # absolute
        self.first_scan_stamp: Optional[float] = None
        self.trajectory: List[TrajectoryEntry] = []
        self.num_processed = 0
        self.num_skipped = 0

    # ------------------------------------------------------------------ IMU
    def push_imu(self, stamp: float, ang_vel, lin_accel) -> None:
        """Feed one raw IMU sample (absolute stamp, sensor frame)."""
        ang_vel = np.asarray(ang_vel, np.float64)
        lin_accel = np.asarray(lin_accel, np.float64)

        if not self.calibrated:
            if self._calib_first_stamp is None:
                self._calib_first_stamp = stamp
            if stamp - self._calib_first_stamp < self.cfg.imu.calib_time:
                self._calib_gyro.append(ang_vel)
                self._calib_accel.append(lin_accel)
                return
            self._finish_calibration()

        self._imu_stamps = np.append(self._imu_stamps, stamp)[-self._imu_max:]
        self._imu_ang = np.vstack([self._imu_ang, ang_vel])[-self._imu_max:]
        self._imu_acc = np.vstack([self._imu_acc, lin_accel])[-self._imu_max:]

    def _finish_calibration(self) -> None:
        """Static bias + gravity-alignment estimate (odom.cc:889-948).

        Note: raw samples here are in the IMU frame; the reference calibrates
        on extrinsically-rotated samples. For identity-rotation extrinsics
        (the common config) these coincide; otherwise rotate first.
        """
        R = np.asarray(self.cfg.extrinsics.baselink2imu_R).reshape(3, 3)
        gyro_avg = R @ np.mean(self._calib_gyro, axis=0)
        accel_avg = R @ np.mean(self._calib_accel, axis=0)
        g = self.cfg.gravity

        q0 = np.array([1.0, 0, 0, 0])
        ba = np.asarray(self.cfg.imu.accel_bias, np.float64)
        bg = np.asarray(self.cfg.imu.gyro_bias, np.float64)

        grav_vec = np.array([0.0, 0.0, g])
        if self.cfg.imu.gravity_align:
            grav_est = accel_avg - ba
            grav_est = grav_est / np.linalg.norm(grav_est) * abs(g)
            # FromTwoVectors(grav_est, +g e_z) (odom.cc:901-903).
            a, b = grav_est / np.linalg.norm(grav_est), np.array([0.0, 0, 1.0])
            c = np.cross(a, b)
            w = 1.0 + a.dot(b)
            q0 = np.concatenate([[w], c])
            q0 = q0 / np.linalg.norm(q0)
            grav_vec = grav_est
        if self.cfg.imu.calibrate_accel:
            ba = accel_avg - grav_vec
        if self.cfg.imu.calibrate_gyro:
            bg = gyro_avg

        self.state = init_state(self.cfg, q0=q0, ba0=ba, bg0=bg)
        self.calibrated = True

    # ----------------------------------------------------------------- scan
    def imu_covers(self, stamp: float) -> bool:
        return len(self._imu_stamps) > 0 and self._imu_stamps[-1] >= stamp

    def process_scan(self, header_stamp: float, xyz: np.ndarray,
                     point_times: Optional[np.ndarray] = None) -> dict:
        """Process one scan. ``point_times`` are per-point offsets [s] from
        ``header_stamp`` (None -> no deskew, HESAI-style absolute stamps must
        be rebased by the caller). Returns a dict of step outputs.
        """
        if not self.calibrated:
            raise NeedMoreImu("IMU calibration in progress")
        if self.state is None:
            self.state = init_state(self.cfg)

        cap = self.cfg.capacity
        n = cap.max_points
        m = xyz.shape[0]
        if m > n:
            keep = np.random.default_rng(0).choice(m, n, replace=False)
            keep.sort()
            xyz = xyz[keep]
            point_times = None if point_times is None else point_times[keep]
            m = n

        deskew = (point_times is not None and self.cfg.preproc.deskew)
        pt = np.zeros(m, np.float64) if point_times is None else point_times
        sweep_end_abs = header_stamp + (float(pt.max()) if deskew else 0.0)
        if not self.imu_covers(sweep_end_abs):
            raise NeedMoreImu(f"IMU must cover {sweep_end_abs:.6f}")

        if self.first_scan_stamp is None:
            self.first_scan_stamp = header_stamp
        prev_stamp = (self.prev_scan_stamp if self.prev_scan_stamp is not None
                      else header_stamp)
        prop_start = (self.prop_boundary if self.prop_boundary is not None
                      else header_stamp)

        xyz_p = np.full((n, 3), 1e6, np.float32)
        t_p = np.zeros((n,), np.float32)
        valid = np.zeros((n,), bool)
        xyz_p[:m] = xyz
        t_p[:m] = pt
        valid[:m] = np.all(np.isfinite(xyz), axis=-1)

        # IMU window: rebase stamps to header, take the most recent samples.
        rel = (self._imu_stamps - header_stamp).astype(np.float32)
        M = cap.max_imu_window
        # keep samples from a bit before prev scan through the end.
        lo = np.searchsorted(self._imu_stamps,
                             min(prev_stamp, prop_start)) - 4
        lo = max(lo, 0)
        sl = slice(lo, lo + M)
        imu_stamps = np.full((M,), np.float32(1e6), np.float32)
        imu_ang = np.zeros((M, 3), np.float32)
        imu_acc = np.zeros((M, 3), np.float32)
        k = len(self._imu_stamps[sl])
        imu_stamps[:k] = rel[sl]
        if k:
            imu_stamps[k:] = imu_stamps[k - 1] + 1.0 + np.arange(M - k)
        imu_ang[:k] = self._imu_ang[sl]
        imu_acc[:k] = self._imu_acc[sl]

        inp = StepInput(
            xyz=jnp.asarray(xyz_p), t=jnp.asarray(t_p),
            valid=jnp.asarray(valid), deskew=jnp.asarray(deskew),
            imu_stamps=jnp.asarray(imu_stamps), imu_ang=jnp.asarray(imu_ang),
            imu_acc=jnp.asarray(imu_acc), imu_count=jnp.int32(k),
            prev_stamp=jnp.float32(prev_stamp - header_stamp),
            prop_start=jnp.float32(prop_start - header_stamp),
        )
        self.state, out = self._step(self.state, inp)

        processed = bool(out.processed)
        scan_stamp_abs = header_stamp + float(out.scan_stamp)
        if processed:
            self.prev_scan_stamp = scan_stamp_abs
            self.prop_boundary = header_stamp + float(out.sweep_end)
            self.trajectory.append(TrajectoryEntry(
                scan_stamp_abs, np.asarray(out.lidar_p),
                np.asarray(out.lidar_q)))
            self.num_processed += 1
        else:
            self.num_skipped += 1

        return {
            "processed": processed,
            "stamp": scan_stamp_abs,
            "p": np.asarray(out.lidar_p),
            "q": np.asarray(out.lidar_q),
            "state_p": np.asarray(out.pose_p),
            "state_q": np.asarray(out.pose_q),
            "world_xyz": out.world_xyz,
            "world_valid": out.world_valid,
            "is_keyframe": bool(out.is_keyframe),
            "deskew_ok": bool(out.deskew_ok),
            "gicp_iterations": int(out.gicp_iterations),
            "num_corr": int(out.num_corr),
        }

    # ------------------------------------------------------------- exports
    def trajectory_array(self) -> np.ndarray:
        """(T, 8) array: stamp, px, py, pz, qw, qx, qy, qz."""
        if not self.trajectory:
            return np.zeros((0, 8))
        return np.array([[e.stamp, *e.p, *e.q] for e in self.trajectory])
