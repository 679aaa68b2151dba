"""Descriptor-based place recognition (models/placedesc) + its SlamSystem
integration: loop detection that survives drift and keyframe eviction.

The proximity detector (posegraph.detect_loop_candidate) needs the pose
estimate already within loop_radius of the truth; descriptors match the
latest keyframe against every keyframe ever created, with the matched yaw
shift seeding the GICP verification guess. Calibration (synthetic world,
loop trajectory, fresh sampling per visit): same-place scores 0.84-0.99
under 0-170 degree yaw offsets with the shift recovered to one sector;
far-place best score 0.43 — the 0.55 threshold splits them with margin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noetic_slam_tpu.models.placedesc import (N_SECTORS, DescriptorStore,
                                              ring_descriptor)
from noetic_slam_tpu.utils import synthetic


def _local_scan(sim, t, extra_yaw=0.0, seed=None, n=4096):
    """World points visible from the pose at t, in the (yaw-offset) local
    frame — a fresh sampling per call, like a real revisit."""
    R, p = sim.pose(t)
    cy, sy = np.cos(extra_yaw), np.sin(extra_yaw)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    R = R @ Rz
    rng = np.random.default_rng(seed if seed is not None else int(t * 997))
    d = np.linalg.norm(sim.world - p, axis=-1)
    cand = np.flatnonzero(d < 40.0)
    pick = sim.world[rng.choice(cand, n)]
    return ((pick - p) @ R).astype(np.float32)


@pytest.fixture(scope="module")
def loop_sim():
    return synthetic.make_sim(duration=20.0, n_points=4096, seed=3,
                              pose_fn=synthetic.loop_pose_of)


def test_rotation_invariant_matching_and_shift(loop_sim):
    valid = np.ones(4096, bool)
    store = DescriptorStore()
    times = np.arange(0.5, 19.5, 0.5)
    for i, t in enumerate(times):
        store.add(i, ring_descriptor(_local_scan(loop_sim, t), valid))

    for yaw_deg in (0, 45, 90, 170):
        q = ring_descriptor(
            _local_scan(loop_sim, 2.0, extra_yaw=np.radians(yaw_deg),
                        seed=12345), valid)
        node, score, shift = store.query(q, min_gap=0)
        assert abs(times[node] - 2.0) <= 0.5, (yaw_deg, times[node])
        assert score > 0.75, (yaw_deg, score)
        psi_est = np.degrees(2 * np.pi * shift / N_SECTORS)
        err = (psi_est - yaw_deg + 180) % 360 - 180
        assert abs(err) <= 360 / N_SECTORS + 1e-6, (yaw_deg, psi_est)


def test_score_separation_same_vs_far(loop_sim):
    """Same-place scores clear the 0.55 acceptance threshold with margin;
    far places stay well below it."""
    valid = np.ones(4096, bool)
    q = ring_descriptor(_local_scan(loop_sim, 2.0, seed=7), valid)
    same = DescriptorStore()
    same.add(0, ring_descriptor(_local_scan(loop_sim, 2.0, seed=8), valid))
    _, s_same, _ = same.query(q, min_gap=0)
    # far side of the loop (opposite point of the circle)
    far = DescriptorStore()
    far.add(0, ring_descriptor(_local_scan(loop_sim, 10.0, seed=9), valid))
    _, s_far, _ = far.query(q, min_gap=0)
    assert s_same > 0.75
    assert s_far < 0.5
    assert s_same > s_far + 0.3


def test_store_growth_and_persistence():
    store = DescriptorStore(cap=4)
    rng = np.random.default_rng(0)
    descs = rng.random((11, 20, 60)).astype(np.float32)
    for i in range(11):
        store.add(i, descs[i])
    assert store.count == 11 and store._host.shape[0] >= 11
    packed = store.pack()
    store2 = DescriptorStore()
    store2.unpack(packed)
    assert store2.count == 11
    np.testing.assert_array_equal(store2._host[:11], descs)
    q = descs[3]
    node, score, _ = store2.query(q, min_gap=0)
    assert node == 3 and score > 0.99


@pytest.mark.slow
def test_descriptor_closure_fires_under_drift():
    """End-to-end: the current keyframe is TRULY back at a mapped corner
    but its estimate has drifted 4 m — outside the proximity detector's
    radius. The descriptor path must find the revisit over the keyframe
    history, seed GICP with the matched yaw, pass the drift-budget gate
    (the intermediate keyframes span a long path), and snap the pose
    back."""
    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               GicpConfig)
    from noetic_slam_tpu.models.odometry import init_state
    from noetic_slam_tpu.ops import gicp as gicp_ops
    from noetic_slam_tpu.runtime.slam import SlamSystem
    from tests.test_loop_verification import make_cloud

    CFG = GicpConfig()
    cfg = DlioConfig(capacity=CapacityConfig(
        max_points=2048, max_ds_points=1536, max_deskew_frames=64,
        max_imu_window=32, max_keyframes=16, max_submap_kf=8))
    slam = SlamSystem(cfg, enable_tsdf=False, enable_loop_closure=True,
                      loop_radius=2.0, loop_min_gap=3)

    K, Nk = 16, 1536
    st = init_state(cfg)
    kf_xyz = np.full((K, Nk, 3), 1e6, np.float32)
    kf_valid = np.zeros((K, Nk), bool)
    kf_cov = np.zeros((K, Nk, 6), np.float32)
    kf_pos = np.zeros((K, 3), np.float32)
    kf_quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))

    def put(i, cloud, pos):
        cov, _ = gicp_ops.plane_covariances(
            jnp.asarray(cloud), jnp.ones((cloud.shape[0],), bool),
            CFG.k_correspondences)
        kf_xyz[i, : cloud.shape[0]] = cloud
        kf_valid[i, : cloud.shape[0]] = True
        kf_cov[i, : cloud.shape[0]] = np.asarray(cov)
        kf_pos[i] = pos

    corner = make_cloud("corner", seed=12)        # local geometry at kf0
    put(0, corner, [0.0, 0.0, 0.0])
    # intermediate keyframes far away with DIFFERENT local geometry
    # (clutter/corridor/vegetation): identical-geometry fillers would be
    # perfect aliases — the descriptor would match them and the budget
    # gate would (correctly) reject the closure. The chain spans ~130 m so
    # the 4 m correction fits the 5% drift budget.
    kinds = ["clutter", "corridor", "vegetation", "clutter", "corridor"]
    for i, (x, kind) in enumerate(zip([30.0, 60.0, 90.0, 60.0, 30.0],
                                      kinds), start=1):
        put(i, make_cloud(kind, offset=np.array([x + 200, 50, 0]),
                          seed=20 + i, structure_seed=40 + i),
            [x + 200, 50, 0])
    # the revisit: the SAME corner scene observed on TWO consecutive
    # keyframes (fresh noise each), estimated 4 m away from where it
    # really is — two because a descriptor closure requires temporal
    # consistency (consecutive keyframes matching the same place)
    drift = np.array([4.0, 0.0, 0.0], np.float32)
    put(6, make_cloud("corner", offset=drift, seed=13), drift)
    put(7, make_cloud("corner", offset=drift + [0.2, 0, 0], seed=14),
        drift + [0.2, 0, 0])

    kf_seq = np.zeros((K,), np.int32)
    kf_seq[:8] = np.arange(1, 9)
    slam.odometry.state = st._replace(
        kf_xyz=jnp.asarray(kf_xyz), kf_valid=jnp.asarray(kf_valid),
        kf_cov=jnp.asarray(kf_cov), kf_pos=jnp.asarray(kf_pos),
        kf_quat=jnp.asarray(kf_quat), kf_count=jnp.int32(8),
        kf_total=jnp.int32(8), kf_seq=jnp.asarray(kf_seq))

    closed = slam.maybe_close_loop()
    assert closed, "descriptor closure must fire"
    assert slam.loop_closures_descriptor == 1
    # the revisit keyframe snapped back onto the mapped corner
    p7 = np.asarray(jax.device_get(slam.odometry.state.kf_pos[7]))
    assert np.linalg.norm(p7 - np.asarray([0.2, 0, 0])) < 0.5, p7


@pytest.mark.slow
def test_descriptor_alias_rejected_by_budget():
    """Safety: when the descriptor's best match is a structurally
    IDENTICAL scene elsewhere (perfect alias — locally indistinguishable
    by construction), the drift-budget gate must reject the oversized
    correction instead of deforming the map."""
    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               GicpConfig)
    from noetic_slam_tpu.models.odometry import init_state
    from noetic_slam_tpu.ops import gicp as gicp_ops
    from noetic_slam_tpu.runtime.slam import SlamSystem
    from tests.test_loop_verification import make_cloud

    CFG = GicpConfig()
    cfg = DlioConfig(capacity=CapacityConfig(
        max_points=2048, max_ds_points=1536, max_deskew_frames=64,
        max_imu_window=32, max_keyframes=16, max_submap_kf=8))
    slam = SlamSystem(cfg, enable_tsdf=False, enable_loop_closure=True,
                      loop_radius=2.0, loop_min_gap=3)
    K, Nk = 16, 1536
    st = init_state(cfg)
    kf_xyz = np.full((K, Nk, 3), 1e6, np.float32)
    kf_valid = np.zeros((K, Nk), bool)
    kf_cov = np.zeros((K, Nk, 6), np.float32)
    kf_pos = np.zeros((K, 3), np.float32)
    kf_quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))

    def put(i, cloud, pos):
        cov, _ = gicp_ops.plane_covariances(
            jnp.asarray(cloud), jnp.ones((cloud.shape[0],), bool),
            CFG.k_correspondences)
        kf_xyz[i, : cloud.shape[0]] = cloud
        kf_valid[i, : cloud.shape[0]] = True
        kf_cov[i, : cloud.shape[0]] = np.asarray(cov)
        kf_pos[i] = pos

    # ALL keyframes are the same corner geometry at different places
    # (short 20 m chain: any cross-chain match needs a huge correction)
    for i, x in enumerate([0.0, 5.0, 10.0, 15.0, 20.0]):
        put(i, make_cloud("corner", offset=np.array([x, 0, 0]),
                          seed=12 + i), [x, 0, 0])
    put(5, make_cloud("corner", offset=np.array([20.0, 5.0, 0]), seed=30),
        [20.0, 5.0, 0])
    kf_seq = np.zeros((K,), np.int32)
    kf_seq[:6] = np.arange(1, 7)
    slam.odometry.state = st._replace(
        kf_xyz=jnp.asarray(kf_xyz), kf_valid=jnp.asarray(kf_valid),
        kf_cov=jnp.asarray(kf_cov), kf_pos=jnp.asarray(kf_pos),
        kf_quat=jnp.asarray(kf_quat), kf_count=jnp.int32(6),
        kf_total=jnp.int32(6), kf_seq=jnp.asarray(kf_seq))

    closed = slam.maybe_close_loop()
    assert not closed
    assert slam.loop_rejected_budget >= 1, \
        "the alias match must be killed by the BUDGET gate"
    assert slam.loop_closures == 0
