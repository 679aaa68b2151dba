"""Checkpoint/resume, metrics, config YAML loading."""

import numpy as np
import jax.numpy as jnp

from noetic_slam_tpu.config.params import CapacityConfig, DlioConfig, load_config
from noetic_slam_tpu.models.odometry import init_state
from noetic_slam_tpu.models.posegraph import add_node, init_graph
from noetic_slam_tpu.models.tsdf import init_tsdf
from noetic_slam_tpu.runtime import checkpoint as ckpt
from noetic_slam_tpu.runtime.metrics import SlamMetrics
from noetic_slam_tpu.runtime.pipeline import OdometryPipeline


def tiny_cfg():
    return DlioConfig(capacity=CapacityConfig(
        max_points=256, max_ds_points=128, max_deskew_frames=64,
        max_imu_window=16, max_keyframes=8, max_submap_kf=2,
        max_trajectory=64))


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    st = init_state(cfg)
    st = st._replace(p=jnp.asarray([1.0, 2, 3]), kf_count=jnp.int32(2))
    tsdf = init_tsdf(cfg.tsdf.__class__(max_blocks=16))
    g = init_graph(8, 8)
    g = add_node(g, jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([5.0, 0, 0]))

    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, st, tsdf, g, host={"foo": 1})
    odom2, tsdf2, g2, host = ckpt.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(odom2.p), [1, 2, 3])
    assert int(odom2.kf_count) == 2
    assert int(tsdf2.num_blocks) == 0
    assert int(g2.n_nodes) == 1
    np.testing.assert_allclose(np.asarray(g2.node_p)[0], [5, 0, 0])
    assert host == {"foo": 1}


def test_pipeline_checkpoint_resume(tmp_path):
    cfg = tiny_cfg().replace(imu=DlioConfig().imu.__class__(
        calibrate_gyro=False, calibrate_accel=False, gravity_align=False))
    pipe = OdometryPipeline(cfg)
    for i in range(10):
        pipe.push_imu(i * 0.01, [0, 0, 0], [0, 0, 9.80665])
    path = str(tmp_path / "pipe.npz")
    ckpt.save_pipeline(path, pipe)

    pipe2 = OdometryPipeline(cfg)
    ckpt.load_pipeline(path, pipe2)
    assert pipe2.calibrated
    assert len(pipe2._imu_stamps) == 10
    np.testing.assert_allclose(pipe2._imu_acc[0], [0, 0, 9.80665])


def test_metrics_dashboard():
    m = SlamMetrics()
    for i in range(5):
        m.scan_done(i * 0.1, 0.02, [i * 1.0, 0, 0], i % 2 == 0)
        m.imu_seen(i * 0.1)
    s = m.summary()
    assert s["scans"] == 5
    assert s["keyframes"] == 3
    assert abs(s["distance_m"] - 4.0) < 1e-6
    assert s["comp_ms_avg"] == 20.0
    assert abs(s["lidar_hz"] - 10.0) < 0.1
    text = m.dashboard(pose_p=[1, 2, 3])
    assert "scans" in text and "noetic_slam_tpu" in text


def test_load_config_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("""
adaptive: false
gicp:
  max_corr_dist: 0.75
  nn_engine: grid
capacity:
  max_points: 1024
extrinsics:
  baselink2imu_t: [0.1, 0.2, 0.3]
""")
    cfg = load_config(str(p))
    assert cfg.adaptive is False
    assert cfg.gicp.max_corr_dist == 0.75
    assert cfg.gicp.nn_engine == "grid"
    assert cfg.capacity.max_points == 1024
    assert cfg.extrinsics.baselink2imu_t == (0.1, 0.2, 0.3)
    # untouched defaults survive
    assert cfg.gicp.max_iterations == 32


def test_load_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("gicp:\n  nonexistent_knob: 1\n")
    import pytest

    with pytest.raises(KeyError):
        load_config(str(p))


def test_quantized_wire_matches_exact():
    """The int16+f16 wire format must match the exact f32 format to within
    its quantization bound (~2 mm at the test's ~10 m scene scale)."""
    import dataclasses

    import numpy as np

    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               PreprocConfig)
    from noetic_slam_tpu.runtime.pipeline import OdometryPipeline
    from noetic_slam_tpu.utils import synthetic

    cap = CapacityConfig(max_points=2048, max_ds_points=1024,
                         max_deskew_frames=256, max_imu_window=64,
                         max_keyframes=32, max_submap_kf=4)
    ates = []
    for quant in (True, False):
        cfg = DlioConfig(capacity=cap, adaptive=False,
                         preproc=PreprocConfig(quantized_wire=quant))
        sim = synthetic.make_sim(duration=4.5, n_points=2048,
                                 calib_time=3.1, seed=5)
        pipe = OdometryPipeline(cfg)
        imu_i = 0
        for i in range(len(sim.scan_stamps)):
            h, xyz, pt = sim.scan(i)
            while (imu_i < len(sim.imu_stamps)
                   and sim.imu_stamps[imu_i] <= h + 0.15):
                pipe.push_imu(sim.imu_stamps[imu_i], sim.imu_ang[imu_i],
                              sim.imu_acc[imu_i])
                imu_i += 1
            pipe.process_scan(h, xyz, pt)
        traj = pipe.flush()
        ates.append(synthetic.ate_rmse(traj[:, 0], traj[:, 1:4],
                                       sim.gt_stamps, sim.gt_pos))
    ate_q, ate_x = ates
    # ~0.2 mm/point quantization perturbs the (chaotic) estimate at the
    # level of its own drift; ACCURACY must be unaffected: both formats
    # within the e2e bound and within 30% + 5 mm of each other.
    assert ate_x < 0.06 and ate_q < 0.06, (ate_q, ate_x)
    assert ate_q < ate_x * 1.3 + 0.005, (ate_q, ate_x)
