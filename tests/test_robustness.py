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
