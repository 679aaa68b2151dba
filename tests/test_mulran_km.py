"""Multi-loop MulRan-format sequence through the REAL ingest path with
loop closures on (VERDICT r3 #8: the BASELINE "full MulRan sequence"
measurement config, shrunk to CI scale; the chip artifact runs the same
harness at km scale).

The fixture is generated on the fly in the exact on-disk formats the
reference file player parses (scripts/make_mulran_fixture.py ↔
src/file_player_mulran/src/ROSThread.cpp): data_stamp.csv dispatch,
17-field xsens_imu.csv, float32 x,y,z,i Ouster bins, 3x4 global_pose.csv.
No per-point times exist in this format, so scans are motion-distorted
and the pipeline runs WITHOUT deskew — exactly as on real MulRan.
"""

import functools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from make_mulran_fixture import write_fixture  # noqa: E402


@pytest.mark.slow
def test_mulran_multiloop_slam_closures(tmp_path):
    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               KeyframeConfig, TsdfConfig)
    from noetic_slam_tpu.io.mulran import MulranDataset
    from noetic_slam_tpu.io.replay import replay_dataset
    from noetic_slam_tpu.runtime.slam import SlamSystem
    from noetic_slam_tpu.utils import synthetic
    from noetic_slam_tpu.utils.synthetic import loop_pose_of

    seq = tmp_path / "seq"
    stats = write_fixture(
        str(seq), duration=40.0, hold=3.5, n_points=2048, seed=33,
        pose_fn=functools.partial(loop_pose_of, period=20.0, radius=5.0))
    assert stats["n_scans"] >= 380

    ds = MulranDataset.load(str(seq))
    cfg = DlioConfig(
        capacity=CapacityConfig(
            max_points=2048, max_ds_points=1024, max_deskew_frames=128,
            max_imu_window=64, max_keyframes=48, max_submap_kf=8,
            max_trajectory=4096),
        adaptive=False,
        keyframe=KeyframeConfig(thresh_dist=1.0, thresh_rot=45.0),
        tsdf=TsdfConfig(voxel_size=0.25, truncation=0.75, max_blocks=4096,
                        space_carving=False, scan_block_cap=1024))
    slam = SlamSystem(cfg, enable_tsdf=True, enable_loop_closure=True,
                      loop_radius=4.0, loop_min_gap=15)

    def on_batch(n):
        slam.maybe_close_loop()

    replay_dataset(ds, slam, rate=0.0, batch=8, on_batch=on_batch)
    slam.maybe_close_loop()

    traj = slam.flush()
    assert len(traj) >= 350
    ate = synthetic.ate_rmse(traj[:, 0], traj[:, 1:4],
                             ds.gt_stamps, ds.gt_poses[:, :, 3])
    # two+ laps, no deskew (format carries no per-point times): the pin is
    # the reference-class bound for the distorted-scan regime
    assert ate < 0.30, ate
    # loop machinery exercised for real: closures fired, nothing lost
    assert slam.loop_closures >= 1
    assert slam.sync_lost_keyframes == 0
    assert int(slam.graph.n_nodes) == int(slam.odometry.state.kf_total)
