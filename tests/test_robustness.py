"""Fault injection: IMU dropouts, out-of-order samples, degenerate scans.

The reference's failure handling is minimal (SURVEY §5: FATAL log +
prior-only deskew on bad time sync, skip on low point count, block on
missing IMU); these tests pin the framework's equivalents under injected
faults.
"""

import numpy as np
import pytest

from noetic_slam_tpu.runtime.pipeline import NeedMoreImu, OdometryPipeline
from noetic_slam_tpu.utils import synthetic
from tests.test_odometry_e2e import small_cfg


def _run(sim, pipe, drop_imu_between=None, n_scans=None):
    imu_i = 0
    outs = []
    pending = []
    n = n_scans or len(sim.scan_stamps)
    for s in range(n):
        header, xyz, pt = sim.scan(s)
        sweep_end = header + pt.max()
        while (imu_i < len(sim.imu_stamps)
               and sim.imu_stamps[imu_i] <= sweep_end + 0.02):
            t = sim.imu_stamps[imu_i]
            imu_i += 1
            if drop_imu_between and drop_imu_between[0] <= t <= drop_imu_between[1]:
                continue
            pipe.push_imu(t, sim.imu_ang[imu_i - 1], sim.imu_acc[imu_i - 1])
        # the cv-wait analog: defer scans until IMU coverage resumes
        pending.append((header, xyz, pt))
        still = []
        for args in pending:
            try:
                outs.append(pipe.process_scan(*args))
            except NeedMoreImu:
                still.append(args)
        pending = still
    return outs


@pytest.mark.slow
def test_imu_dropout_degrades_gracefully():
    """A 0.3 s IMU gap mid-run: deskew falls back to the rigid prior
    (deskew_ok False for affected scans) but tracking survives."""
    sim = synthetic.make_sim(duration=1.5, n_points=2048, calib_time=3.1,
                             seed=21)
    pipe = OdometryPipeline(small_cfg())
    outs = _run(sim, pipe, drop_imu_between=(0.55, 0.85))
    traj = pipe.flush()
    assert pipe.num_processed == len(sim.scan_stamps)
    ate = synthetic.ate_rmse(traj[:, 0], traj[:, 1:4], sim.gt_stamps,
                             sim.gt_pos)
    assert ate < 0.25, ate  # degraded but not lost
    assert np.all(np.isfinite(traj[:, 1:4]))


def test_out_of_order_imu_dropped():
    cfg = small_cfg().replace(imu=small_cfg().imu.__class__(
        calibrate_gyro=False, calibrate_accel=False, gravity_align=False))
    pipe = OdometryPipeline(cfg)
    pipe.push_imu(1.0, [0, 0, 0], [0, 0, 9.8])
    pipe.push_imu(0.5, [0, 0, 0], [0, 0, 9.8])   # late
    pipe.push_imu(1.0, [0, 0, 0], [0, 0, 9.8])   # duplicate
    pipe.push_imu(1.1, [0, 0, 0], [0, 0, 9.8])
    assert pipe.imu_dropped == 2
    assert list(pipe._imu_stamps) == [1.0, 1.1]


@pytest.mark.slow
def test_all_points_out_of_range_skipped():
    """A scan whose points all sit inside the crop box is skipped like the
    low-point-count guard (odom.cc:764-767)."""
    sim = synthetic.make_sim(duration=0.5, n_points=512, calib_time=3.1,
                             seed=22)
    pipe = OdometryPipeline(small_cfg())
    imu_i = 0
    while imu_i < len(sim.imu_stamps) and sim.imu_stamps[imu_i] <= 0.3:
        pipe.push_imu(sim.imu_stamps[imu_i], sim.imu_ang[imu_i],
                      sim.imu_acc[imu_i])
        imu_i += 1
    tiny = np.random.default_rng(0).uniform(-0.5, 0.5, (512, 3)).astype(
        np.float32)
    out = pipe.process_scan(0.1, tiny, np.zeros(512))
    assert not bool(out.processed)
    assert pipe.num_skipped == 1


@pytest.mark.slow
def test_duplicate_scan_stamp_no_nan():
    """Submitting the same scan twice (dt = 0 between scans) must not
    produce NaNs in the state."""
    import jax.numpy as jnp

    sim = synthetic.make_sim(duration=0.5, n_points=2048, calib_time=3.1,
                             seed=23)
    pipe = OdometryPipeline(small_cfg())
    imu_i = 0
    header, xyz, pt = sim.scan(0)
    while (imu_i < len(sim.imu_stamps)
           and sim.imu_stamps[imu_i] <= header + pt.max() + 0.02):
        pipe.push_imu(sim.imu_stamps[imu_i], sim.imu_ang[imu_i],
                      sim.imu_acc[imu_i])
        imu_i += 1
    pipe.process_scan(header, xyz, pt)
    out = pipe.process_scan(header, xyz, pt)  # same stamp again
    st = pipe.state
    assert bool(jnp.all(jnp.isfinite(st.p)))
    assert bool(jnp.all(jnp.isfinite(st.q)))
    assert bool(jnp.all(jnp.isfinite(st.v)))


@pytest.mark.slow
def test_degenerate_registration_gate_bounds_failure():
    """Feature-poor geometry (pure ground plane mid-run): the GICP cost
    is flat along the plane and the solver can slide meters per solve.
    The gicp.max_correction gate must reject such scans (prior-only
    fallback, reg_rejected counts them) and geo.max_velocity must bound
    the observer, so the state stays FINITE and the position excursion
    stays bounded — the pre-gate failure mode was a velocity runaway into
    NaN (soak_drift bring-up: 13-40 m/s jumps, km-scale glides)."""
    import jax
    import jax.numpy as jnp

    # world = ground plane ONLY: every scan is translation-degenerate in
    # the plane
    rng = np.random.default_rng(9)
    g = np.c_[rng.uniform(-60, 60, 30000), rng.uniform(-60, 60, 30000),
              np.zeros(30000)].astype(np.float32)
    sim = synthetic.make_sim(duration=4.0, n_points=1024, calib_time=3.1,
                             seed=24, imu_noise=0.003, world_pts=g)
    pipe = OdometryPipeline(small_cfg())
    imu_i = 0
    for s in range(len(sim.scan_stamps)):
        header, xyz, pt = sim.scan(s)
        sweep_end = header + pt.max()
        while (imu_i < len(sim.imu_stamps)
               and sim.imu_stamps[imu_i] <= sweep_end + 0.02):
            pipe.push_imu(sim.imu_stamps[imu_i], sim.imu_ang[imu_i],
                          sim.imu_acc[imu_i])
            imu_i += 1
        pipe.process_scan(header, xyz, pt)
    st = jax.device_get(pipe.state)
    assert bool(np.all(np.isfinite(np.asarray(st.p)))), st.p
    assert bool(np.all(np.isfinite(np.asarray(st.v))))
    # velocity bounded by the observer clamp
    assert float(np.linalg.norm(st.v)) <= small_cfg().geo.max_velocity + 1.0
    # the 4 s drive covers ~8 m of truth; even fully prior-only the
    # bounded-velocity estimate cannot leave a modest neighborhood
    assert float(np.linalg.norm(st.p)) < 150.0, st.p
