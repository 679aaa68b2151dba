"""Synthetic LiDAR+IMU world simulator.

Generates physically-consistent scan + IMU streams for a vehicle moving
through a structured world — the framework's equivalent of the reference's
test bags (src/dlio/README.md "Test Data"): used by the end-to-end odometry
tests, the benchmark harness, and the compile-check entry point.

The simulated sensor samples fresh surface points every sweep (no fixed
correspondence between scans), per-point timestamps advance across the
sweep, and the IMU reports body-frame angular velocity and specific force
consistent with the trajectory (f = R^T (a_world + g e_z))."""

from __future__ import annotations

import dataclasses

import numpy as np

GRAVITY = 9.80665


def loop_pose_of(t, period=20.0, radius=8.0):
    """Closed-loop trajectory: circle of given period/radius with yaw
    following the path — returns to the start, for loop-closure tests."""
    t = float(t)
    ang = 2 * np.pi * t / period
    p = np.array([radius * np.sin(ang), radius * (1 - np.cos(ang)),
                  0.02 * np.sin(0.7 * t)])
    yaw = ang
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz, p


def spiral_pose_of(t, period=20.0, r0=8.0, dr=0.6):
    """Expanding-spiral trajectory: every lap runs ``dr`` meters outside
    the previous one, so the vehicle keeps covering NEW ground (keyframe
    creation never stops — the km-scale soak regime) while each lap passes
    within ``dr`` of the previous lap (loop-closure candidates the whole
    run). Yaw follows the path."""
    t = float(t)
    ang = 2 * np.pi * t / period
    r = r0 + dr * t / period
    p = np.array([r * np.sin(ang), r0 - r * np.cos(ang),
                  0.02 * np.sin(0.7 * t)])
    yaw = ang
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz, p


@dataclasses.dataclass
class Sim:
    world: np.ndarray            # (W, 3) surface points
    imu_stamps: np.ndarray       # (M,)
    imu_ang: np.ndarray          # (M, 3) body frame
    imu_acc: np.ndarray          # (M, 3) body frame specific force
    scan_stamps: np.ndarray      # (T,) sweep start times
    gt_stamps: np.ndarray        # dense gt sample times
    gt_pos: np.ndarray           # (G, 3)
    gt_quat: np.ndarray          # (G, 4) wxyz
    duration: float
    rng: np.random.Generator
    sweep_time: float
    n_points: int
    max_range: float
    pose_fn: object = None

    def pose(self, t):
        """Ground-truth pose at time t: (R (3,3), p (3,))."""
        fn = self.pose_fn or _pose_of
        return fn(np.asarray(t))

    def scan(self, i: int):
        """Generate sweep i: (header_stamp, xyz (N,3) sensor frame,
        point_times (N,) offsets from header)."""
        t0 = self.scan_stamps[i]
        # Column-quantized per-point times, like a spinning LiDAR (Ouster
        # columns_per_frame; lidar_scan.h data_format): many points share
        # each firing timestamp.
        cols = 512
        pt = np.sort(self.rng.integers(0, cols, self.n_points)
                     * (self.sweep_time / cols))
        # sample world points within range of the mid-sweep position
        fn = self.pose_fn or _pose_of
        R_mid, p_mid = fn(t0 + 0.5 * self.sweep_time)
        d = np.linalg.norm(self.world - p_mid, axis=-1)
        cand = np.flatnonzero(d < self.max_range)
        pick = self.world[self.rng.choice(cand, self.n_points)]
        xyz = np.empty((self.n_points, 3), np.float32)
        for k in range(self.n_points):
            R, p = fn(t0 + pt[k])
            xyz[k] = R.T @ (pick[k] - p)
        return t0, xyz, pt.astype(np.float64)


def _pose_of(t):
    """Smooth trajectory: gentle arc + slight bobbing, yaw following path."""
    t = float(t)
    vx, vy = 1.2, 0.5
    p = np.array([vx * t + 0.3 * np.sin(0.5 * t),
                  vy * t + 0.2 * np.cos(0.4 * t) - 0.2,
                  0.05 * np.sin(0.8 * t)])
    yaw = 0.25 * np.sin(0.6 * t)
    pitch = 0.03 * np.sin(0.9 * t)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    return Rz @ Ry, p


def _numeric_imu(t, dt=1e-4, pose_fn=None):
    """Body rates + specific force by numeric differentiation of the pose."""
    fn = pose_fn or _pose_of
    R0, p0 = fn(t - dt)
    R1, p1 = fn(t)
    R2, p2 = fn(t + dt)
    # angular velocity: vee(R^T dR/dt)
    dR = (R2 - R0) / (2 * dt)
    W = R1.T @ dR
    w = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) / 2
    a_world = (p2 - 2 * p1 + p0) / dt ** 2
    f = R1.T @ (a_world + np.array([0.0, 0.0, GRAVITY]))
    return w, f


def make_world(rng, extent=30.0, n=20000) -> np.ndarray:
    """Structured world: ground plane, boundary walls, scattered boxes."""
    pts = []
    m = n // 4
    # ground
    g = np.c_[rng.uniform(-extent, extent, m), rng.uniform(-extent, extent, m),
              np.zeros(m)]
    pts.append(g)
    # walls
    for k in range(2):
        s = extent if k == 0 else -extent
        pts.append(np.c_[np.full(m // 2, s), rng.uniform(-extent, extent, m // 2),
                         rng.uniform(0, 5, m // 2)])
        pts.append(np.c_[rng.uniform(-extent, extent, m // 2), np.full(m // 2, s),
                         rng.uniform(0, 5, m // 2)])
    # boxes
    for _ in range(12):
        c = rng.uniform(-extent * 0.7, extent * 0.7, 2)
        w, h = rng.uniform(0.5, 2.0, 2)
        face = rng.integers(0, 3)
        q = n // 48
        u = rng.uniform(-w, w, q)
        v = rng.uniform(0, h, q)
        if face == 0:
            pts.append(np.c_[c[0] + u, np.full(q, c[1] + w), v])
        elif face == 1:
            pts.append(np.c_[np.full(q, c[0] + w), c[1] + u, v])
        else:
            pts.append(np.c_[c[0] + u, c[1] + rng.uniform(-w, w, q),
                             np.full(q, h)])
    return np.concatenate(pts).astype(np.float32)


def make_sim(duration=3.0, imu_hz=100.0, scan_hz=10.0, n_points=2048,
             max_range=45.0, calib_time=0.0, seed=0, pose_fn=None,
             imu_noise=0.0) -> Sim:
    """Build a simulation. ``calib_time`` seconds of stationary IMU samples
    (pure gravity) are prepended for the static calibration procedure.
    ``pose_fn`` overrides the trajectory (e.g. ``loop_pose_of``);
    ``imu_noise`` adds white noise to gyro/accel (drift injection)."""
    rng = np.random.default_rng(seed)
    world = make_world(rng)
    fn = pose_fn or _pose_of

    imu_t = np.arange(-calib_time, duration + 0.2, 1.0 / imu_hz)
    ang = np.zeros((len(imu_t), 3))
    acc = np.zeros((len(imu_t), 3))
    R0, _ = fn(0.0)
    for i, t in enumerate(imu_t):
        if t < 0:
            ang[i] = 0.0
            acc[i] = R0.T @ np.array([0.0, 0.0, GRAVITY])
        else:
            ang[i], acc[i] = _numeric_imu(max(t, 1e-3), pose_fn=fn)
            if imu_noise > 0:
                ang[i] += rng.normal(scale=imu_noise, size=3)
                acc[i] += rng.normal(scale=imu_noise * 10, size=3)

    scan_t = np.arange(0.0, duration, 1.0 / scan_hz)
    gt_t = np.arange(0.0, duration + 0.1, 0.01)
    gt_pos = np.stack([fn(t)[1] for t in gt_t])
    gt_quat = np.stack([_mat_to_quat(fn(t)[0]) for t in gt_t])
    return Sim(world, imu_t, ang, acc, scan_t, gt_t, gt_pos, gt_quat,
               duration, rng, 1.0 / scan_hz, n_points, max_range, fn)


def _mat_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w < 1e-8:
        return np.array([1.0, 0, 0, 0])
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def ate_rmse(traj_stamps, traj_pos, gt_stamps, gt_pos,
             align: bool = True) -> float:
    """Absolute trajectory error RMSE vs time-interpolated ground truth.

    With ``align=True`` (default, standard TUM/evo methodology) a rigid
    SE(3) Umeyama alignment is applied first — the estimate's world frame is
    anchored to the first keyframe, which bakes in the motion during the
    bootstrap sweep (the reference does the same, odom.cc:712-718)."""
    gt = np.stack([np.interp(traj_stamps, gt_stamps, gt_pos[:, k])
                   for k in range(3)], axis=-1)
    est = np.asarray(traj_pos, np.float64)
    if align and len(est) >= 3:
        mu_e, mu_g = est.mean(0), gt.mean(0)
        H = (est - mu_e).T @ (gt - mu_g)
        U, _, Vt = np.linalg.svd(H)
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T
        est = (R @ (est - mu_e).T).T + mu_g
    err = est - gt
    return float(np.sqrt(np.mean(np.sum(err ** 2, axis=-1))))
