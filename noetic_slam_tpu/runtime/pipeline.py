"""Host-side odometry pipeline driver.

This is the replacement for the reference's ROS node wiring + callbacks
(odom_node.cc:15-28, the rosparam/topic surface of OdomNode): a plain Python
object that

- buffers IMU samples (the reference's 5000-deep circular buffer,
  odom.h:220-223) in float64 absolute time on the host;
- performs the 3-second static IMU calibration + gravity alignment
  (odom.cc:863-948) before the first scan is processed;
- rebases per-step times: the device only ever receives *header-to-header
  deltas* plus point/IMU times relative to the current header — all other
  time bookkeeping (previous scan stamp, propagation boundary) lives in the
  device state, so a scan can be submitted without any device->host fetch;
- packs each scan into three device transfers (points / imu / scalars) and
  invokes the jitted odometry step with donated state — fully async. The
  device appends each pose to an on-device trajectory ring which ``flush()``
  retrieves in one bulk transfer (the reference's per-scan publish threads,
  odom.cc:315-488, become this batched readback).

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
    is_keyframe: bool
    num_corr: int
    gicp_iterations: int


class OdometryPipeline:
    def __init__(self, cfg: DlioConfig | None = None, jit: bool = True,
                 align_fn=None, with_tsdf: bool = False):
        self.cfg = cfg or DlioConfig()
        self.with_tsdf = with_tsdf
        if with_tsdf:
            from noetic_slam_tpu.models.odometry import make_slam_step

            self._step = make_slam_step(self.cfg, align_fn=align_fn)
            # tsdf_state holds whichever dense-map backend cfg.map_backend
            # selects (tsdf | occupancy); the name is kept for the stable
            # checkpoint key.
            if self.cfg.map_backend == "occupancy":
                from noetic_slam_tpu.models.occupancy import init_occupancy

                self.tsdf_state = init_occupancy(self.cfg.occupancy)
            else:
                from noetic_slam_tpu.models.tsdf import init_tsdf

                self.tsdf_state = init_tsdf(self.cfg.tsdf)
        else:
            self._step = make_odometry_step(self.cfg, align_fn=align_fn)
            self.tsdf_state = None
        self._step_raw = self._step          # unjitted, for lax.scan batching
        self._multi_cache: dict = {}
        if jit:
            self._step = jax.jit(self._step, donate_argnums=(0,))
        self.state: Optional[OdomState] = None

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

        self.prev_header: Optional[float] = None
        self.headers: List[float] = []      # header stamp per submitted step
        self.first_scan_stamp: Optional[float] = None
        self.trajectory: List[TrajectoryEntry] = []
        self._flushed_scans = 0
        self.last_output = None             # StepOutput of last submit
        self.imu_dropped = 0                # out-of-order samples rejected
        self._decim_rng = np.random.default_rng(0)  # scan-overflow decimation

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

        # Out-of-order/duplicate guard: the device window logic assumes a
        # chronologically sorted buffer (the reference's circular buffer
        # gets this for free from single-threaded callbacks). Late samples
        # are dropped and counted.
        if len(self._imu_stamps) and stamp <= self._imu_stamps[-1]:
            self.imu_dropped += 1
            return
        self._imu_stamps = np.append(self._imu_stamps, stamp)[-self._imu_max:]
        self._imu_ang = np.vstack([self._imu_ang, ang_vel])[-self._imu_max:]
        self._imu_acc = np.vstack([self._imu_acc, lin_accel])[-self._imu_max:]

    def _finish_calibration(self) -> None:
        """Static bias + gravity-alignment estimate (odom.cc:889-948).

        Note: raw samples here are in the IMU frame; the reference calibrates
        on extrinsically-rotated samples, so rotate first.
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
            a = grav_est / np.linalg.norm(grav_est)
            b = np.array([0.0, 0, 1.0])
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

    def _pack_scan(self, header_stamp: float, xyz: np.ndarray,
                   point_times: Optional[np.ndarray], header_delta: float):
        """Host-side packing of one scan into the fixed-shape StepInput
        arrays (numpy; no device transfer). Raises NeedMoreImu if the IMU
        buffer does not cover the sweep end."""
        cap = self.cfg.capacity
        n = cap.max_points
        m = xyz.shape[0]
        if m > n:
            # Stateful RNG: decimation patterns must decorrelate across
            # scans (a fixed per-call seed would thin the same angular
            # sectors every sweep; the reference keeps all points).
            keep = self._decim_rng.choice(m, n, replace=False)
            keep.sort()
            xyz = xyz[keep]
            point_times = None if point_times is None else point_times[keep]
            m = n

        deskew = (point_times is not None and self.cfg.preproc.deskew)
        pt = np.zeros(m, np.float64) if point_times is None else point_times
        sweep_end_abs = header_stamp + (float(pt.max()) if deskew and m else 0.0)
        if not self.imu_covers(sweep_end_abs):
            raise NeedMoreImu(f"IMU must cover {sweep_end_abs:.6f}")

        # Wire format (upload bandwidth ~14 ms/MB through the tunnel, and it
        # sits on the critical path — see StepInput docstring):
        # - quantized (default): int16 xyz at adaptive per-scan scale
        #   (worst case ~2 mm at 130 m) + f16 rel-times, 8 B/point;
        # - exact: f32 (N, 4) xyz+t, 16 B/point.
        # Validity never ships: sentinel rows are detected on device.
        # Non-finite rows are mapped to the sentinel here (NaN would
        # otherwise poison reductions before masking).
        xyz_f = np.where(np.isfinite(xyz), xyz, 1e6).astype(np.float32)
        row_ok = np.all(np.abs(xyz_f) < 1e5, axis=-1)
        if self.cfg.preproc.quantized_wire:
            amax = float(np.abs(np.where(row_ok[:, None], xyz_f, 0.0)).max()
                         ) if m else 0.0
            scale = max(amax / 32766.0, 1e-4)
            q = np.full((n, 3), 32767, np.int16)
            q[:m] = np.clip(np.round(xyz_f / scale), -32766, 32766
                            ).astype(np.int16)
            q[:m][~row_ok] = 32767
            pt16 = np.zeros((n,), np.float16)
            pt16[:m] = pt
            points = q
            pts_t = pt16
            scalars_extra = [scale, 0.0, 0.0, 0.0]
        else:
            points = np.full((n, 4), 1e6, np.float32)
            points[:m, :3] = xyz_f
            points[:m, 3] = pt
            pts_t = None
            scalars_extra = []

        # IMU window rebased to this header (float64 subtraction on host).
        M = cap.max_imu_window
        lo = np.searchsorted(
            self._imu_stamps,
            min(header_stamp + header_delta * -1.0, header_stamp) - 0.3) - 4
        lo = max(int(lo), 0)
        sl = slice(lo, lo + M)
        k = len(self._imu_stamps[sl])
        imu = np.zeros((M, 7), np.float32)
        imu[:k, 0] = self._imu_stamps[sl] - header_stamp
        if k:
            imu[k:, 0] = imu[k - 1, 0] + 1.0 + np.arange(M - k)
        imu[:k, 1:4] = self._imu_ang[sl]
        imu[:k, 4:7] = self._imu_acc[sl]

        head = [header_delta, 1.0 if deskew else 0.0, float(k)]
        if scalars_extra:                     # quantized: + scale, offset(3)
            scalars = np.array(head + scalars_extra + [0.0], np.float32)
        else:
            scalars = np.array(head + [0.0], np.float32)
        return points, imu, scalars, pts_t

    def _submit(self, inp: StepInput):
        if self.with_tsdf:
            (self.state, self.tsdf_state), out = self._step(
                (self.state, self.tsdf_state), inp)
        else:
            self.state, out = self._step(self.state, inp)
        return out

    def _pre_submit_checks(self):
        if not self.calibrated:
            raise NeedMoreImu("IMU calibration in progress")
        if self.state is None:
            self.state = init_state(self.cfg)

    def _post_submit(self, header_stamp: float, out):
        self.prev_header = header_stamp
        self.headers.append(header_stamp)
        self.last_output = out
        # Guard the device trajectory ring: flush (one bulk readback) well
        # before max_trajectory processed scans accumulate.
        if len(self.headers) % (self.cfg.capacity.max_trajectory // 2) == 0:
            self.flush()

    def process_scan(self, header_stamp: float, xyz: np.ndarray,
                     point_times: Optional[np.ndarray] = None):
        """Submit one scan (async — no device sync). ``point_times`` are
        per-point offsets [s] from ``header_stamp`` (None -> no deskew).
        Returns the raw StepOutput (device arrays; don't force them unless
        needed). Trajectory/pose results are collected via ``flush()``.
        """
        self._pre_submit_checks()
        if self.first_scan_stamp is None:
            self.first_scan_stamp = header_stamp
        header_delta = (0.0 if self.prev_header is None
                        else header_stamp - self.prev_header)
        points, imu, scalars, pts_t = self._pack_scan(
            header_stamp, xyz, point_times, header_delta)
        out = self._submit(StepInput(
            points=jnp.asarray(points), imu=jnp.asarray(imu),
            scalars=jnp.asarray(scalars),
            pt=None if pts_t is None else jnp.asarray(pts_t)))
        self._post_submit(header_stamp, out)
        return out

    def _multi_step(self, K: int):
        """Jitted K-step driver: ONE dispatch advances the state through K
        stacked scans via lax.scan. Cached per batch size."""
        fn = self._multi_cache.get(K)
        if fn is None:
            step = self._step_raw

            def run(state, inputs):
                return jax.lax.scan(
                    lambda st, inp: step(st, inp), state, inputs)

            fn = jax.jit(run, donate_argnums=(0,))
            self._multi_cache[K] = fn
        return fn

    def process_scans(self, batch) -> None:
        """Submit a micro-batch of scans in ONE device dispatch.

        ``batch``: list of (header_stamp, xyz, point_times|None). Semantics
        are identical to calling process_scan per element (the device step
        runs sequentially under lax.scan); the win is host-side — one
        stacked upload + one program dispatch instead of K, which through a
        high-latency transport (e.g. the dev-environment device relay)
        dominates per-scan wall time. The reference's analogue is the queue
        drain in its processing threads (os_sensor_nodelet.cpp:549-570).

        The whole batch must already have IMU coverage (NeedMoreImu
        otherwise); per-scan StepOutputs are not returned — results flow
        through the device trajectory ring / flush().
        """
        if not batch:
            return
        self._pre_submit_checks()
        if self.first_scan_stamp is None:
            self.first_scan_stamp = batch[0][0]

        pts_l, imu_l, sc_l, t_l = [], [], [], []
        prev = self.prev_header
        for header_stamp, xyz, point_times in batch:
            header_delta = 0.0 if prev is None else header_stamp - prev
            p, i, s, pt16 = self._pack_scan(header_stamp, xyz, point_times,
                                            header_delta)
            pts_l.append(p)
            imu_l.append(i)
            sc_l.append(s)
            t_l.append(pt16)
            prev = header_stamp

        inputs = StepInput(
            points=jnp.asarray(np.stack(pts_l)),
            imu=jnp.asarray(np.stack(imu_l)),
            scalars=jnp.asarray(np.stack(sc_l)),
            pt=(None if t_l[0] is None else jnp.asarray(np.stack(t_l))))
        run = self._multi_step(len(batch))
        if self.with_tsdf:
            (self.state, self.tsdf_state), outs = run(
                (self.state, self.tsdf_state), inputs)
        else:
            self.state, outs = run(self.state, inputs)
        for (header_stamp, _, _) in batch:
            self._post_submit(header_stamp, None)
        self.last_output = outs

    # ------------------------------------------------------------- results
    def flush(self) -> np.ndarray:
        """Fetch the device trajectory ring accumulated so far (one bulk
        transfer) and append to ``self.trajectory``. Returns the full
        trajectory as an (T, 8) array: stamp, p, q."""
        if self.state is None:
            return np.zeros((0, 8))
        traj, nproc = jax.device_get((self.state.traj, self.state.num_scans))
        nproc = int(nproc)
        for i in range(self._flushed_scans, min(nproc,
                                                traj.shape[0])):
            row = traj[i]
            step_idx = int(row[0])
            stamp = self.headers[step_idx] + float(row[1])
            self.trajectory.append(TrajectoryEntry(
                stamp, row[2:5].copy(), row[5:9].copy(),
                bool(row[9] > 0.5), int(row[10]), int(row[11])))
        self._flushed_scans = max(self._flushed_scans, min(nproc,
                                                           traj.shape[0]))
        return self.trajectory_array()

    @property
    def num_processed(self) -> int:
        self.flush()
        return self._flushed_scans

    @property
    def submap_overflow(self) -> int:
        """Cumulative keyframes selected for the submap but dropped because
        max_submap_kf was exceeded (0 = the registration target always held
        the full reference-equivalent selection)."""
        if self.state is None:
            return 0
        return int(jax.device_get(self.state.submap_overflow))

    @property
    def num_skipped(self) -> int:
        total = int(jax.device_get(self.state.total_steps))
        return total - self.num_processed

    def trajectory_array(self) -> np.ndarray:
        """(T, 8) array: stamp, px, py, pz, qw, qx, qy, qz."""
        if not self.trajectory:
            return np.zeros((0, 8))
        return np.array([[e.stamp, *e.p, *e.q] for e in self.trajectory])
