"""Adversarial loop-closure verification tests.

Pins the calibrated acceptance criteria of posegraph.verify_loop (mean
Mahalanobis residual + translation-observability eigenvalue — see its
docstring's measured table) against the failure modes that corrupt maps:

- degenerate geometry (corridor): GICP converges to a confident WRONG
  slide along the unobservable direction — must reject;
- wrong-place candidates with different geometry — must reject;
- structurally identical scenes elsewhere (perfect alias): locally
  unrejectable by construction — the SlamSystem drift-budget gate must
  reject the oversized correction.

A wrongly accepted closure feeds pg.optimize + apply_pose_update and
permanently deforms the whole keyframe map, so false positives are the
costly direction.
"""

import jax.numpy as jnp
import numpy as np

from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                           GicpConfig)
from noetic_slam_tpu.models import posegraph as pg
from noetic_slam_tpu.ops import gicp as gicp_ops

CFG = GicpConfig()


def make_cloud(kind, offset=np.zeros(3), n=1500, seed=1,
               structure_seed=None):
    """Structured test scenes (walls have ~1 cm surface noise). For the
    outdoor kinds, ``structure_seed`` fixes the underlying STRUCTURE
    (clump/rock layout) while ``seed`` varies the point sampling — a true
    revisit pair shares structure_seed with different seeds."""
    r = np.random.default_rng(seed)
    rs = np.random.default_rng(
        99 if structure_seed is None else structure_seed)
    m = n // 3
    if kind == "corner":     # two perpendicular walls + floor: observable
        a = np.c_[r.uniform(0, 6, m), np.full(m, 3.0) + r.normal(0, .01, m),
                  r.uniform(0, 2.5, m)]
        b = np.c_[np.full(m, 6.0) + r.normal(0, .01, m), r.uniform(-3, 3, m),
                  r.uniform(0, 2.5, m)]
        c = np.c_[r.uniform(0, 6, m), r.uniform(-3, 3, m),
                  r.normal(0, .01, m)]
        pts = np.concatenate([a, b, c])
    elif kind == "corridor":  # parallel walls + floor: x-translation blind
        a = np.c_[r.uniform(-5, 5, m), np.full(m, 2.0) + r.normal(0, .01, m),
                  r.uniform(0, 2.5, m)]
        b = np.c_[r.uniform(-5, 5, m), np.full(m, -2.0) + r.normal(0, .01, m),
                  r.uniform(0, 2.5, m)]
        c = np.c_[r.uniform(-5, 5, m), r.uniform(-2, 2, m),
                  r.normal(0, .01, m)]
        pts = np.concatenate([a, b, c])
    elif kind == "vegetation":  # clumped volumetric scatter over rough
        nc = 30                 # ground: noisy normals, fat-tail residuals
        centers = np.c_[rs.uniform(-4, 4, (nc, 2)), rs.uniform(0.3, 2.2, nc)]
        k = r.integers(0, nc, 2 * m)
        veg = centers[k] + r.normal(0, 0.35, (2 * m, 3))
        ground = np.c_[r.uniform(-4, 4, m), r.uniform(-4, 4, m),
                       r.normal(0, 0.05, m)]
        pts = np.concatenate([veg, ground])
    elif kind == "slope":       # 15 % sloped rough ground + sparse rocks:
        g = np.c_[r.uniform(-5, 5, 2 * m), r.uniform(-5, 5, 2 * m)]
        z = 0.15 * g[:, 0] + r.normal(0, 0.03, 2 * m)   # near-planar
        nr = 6
        rocks_c = np.c_[rs.uniform(-4, 4, (nr, 2)), rs.uniform(0.1, 0.4, nr)]
        k = r.integers(0, nr, m)
        rocks = rocks_c[k] + r.normal(0, 0.15, (m, 3))
        pts = np.concatenate([np.c_[g, z], rocks])
    else:                     # clutter: unstructured noise normals
        pts = r.uniform(-4, 4, (3 * m, 3)) * np.array([1, 1, 0.4])
    return (pts + offset).astype(np.float32)


def _verify(src, tgt):
    sv = jnp.ones((src.shape[0],), bool)
    scov, _ = gicp_ops.plane_covariances(jnp.asarray(src), sv,
                                         CFG.k_correspondences)
    tcov, _ = gicp_ops.plane_covariances(jnp.asarray(tgt),
                                         jnp.ones((tgt.shape[0],), bool),
                                         CFG.k_correspondences)
    T, ok = pg.verify_loop(jnp.asarray(src), sv, scov, jnp.asarray(tgt),
                           tcov, CFG, max_corr_dist=2 * CFG.max_corr_dist)
    return np.asarray(T), bool(ok)


def test_true_match_accepted():
    src = make_cloud("corner", seed=2)
    tgt = make_cloud("corner", offset=np.array([0.15, -0.1, 0.05]), seed=3)
    T, ok = _verify(src, tgt)
    assert ok
    np.testing.assert_allclose(T[:3, 3], [0.15, -0.1, 0.05], atol=0.03)


def test_degenerate_corridor_rejected_even_when_correct():
    """A corridor pair at the RIGHT place: GICP fits it, but the sliding
    direction is unobservable — the closure is unverifiable and must be
    rejected (accepting it risks applying an arbitrary slide)."""
    src = make_cloud("corridor", seed=4)
    tgt = make_cloud("corridor", offset=np.array([0.1, 0.05, 0.0]), seed=5)
    _, ok = _verify(src, tgt)
    assert not ok


def test_aliased_corridor_rejected():
    """The classic false positive: a corridor section 4 m down the hall.
    GICP slides into a deep overlap optimum with LOW residual; the
    observability criterion is what rejects it."""
    src = make_cloud("corridor", seed=6)
    tgt = make_cloud("corridor", offset=np.array([4.0, 0.0, 0.0]), seed=7)
    T, ok = _verify(src, tgt)
    assert not ok, f"aliased corridor accepted with T={T[:3, 3]}"


def test_wrong_place_clutter_rejected():
    src = make_cloud("corner", seed=8)
    tgt = make_cloud("clutter", offset=np.array([1.0, 2.0, 0.0]), seed=9)
    _, ok = _verify(src, tgt)
    assert not ok


def _metrics(src, tgt):
    """verify_loop's decision metrics for one candidate pair."""
    sv = jnp.ones((src.shape[0],), bool)
    scov, _ = gicp_ops.plane_covariances(jnp.asarray(src), sv,
                                         CFG.k_correspondences)
    tcov, _ = gicp_ops.plane_covariances(jnp.asarray(tgt),
                                         jnp.ones((tgt.shape[0],), bool),
                                         CFG.k_correspondences)
    res = gicp_ops.gicp_align(jnp.asarray(src), sv, scov, jnp.asarray(tgt),
                              tcov, CFG, max_corr_dist=2 * CFG.max_corr_dist)
    nc = max(float(res.num_corr), 1.0)
    return (float(res.error) / nc,
            float(jnp.linalg.eigvalsh(res.H[3:, 3:] / nc)[0]))


def test_outdoor_roc_margins():
    """ROC margins of the verify_loop thresholds on the outdoor battery
    (measured table in verify_loop's docstring): every false candidate —
    wrong-place vegetation and sloped ground, the hardest outdoor aliases —
    must sit BELOW half the observability threshold, and the structured
    true match (corner at 2/3 overlap) ABOVE twice it, so any threshold in
    [2x max-false, 0.5x min-true-structured] yields zero false positives;
    the chosen 5.0 is inside that window."""
    false_eigs = []
    for s in range(2):
        src = make_cloud("vegetation", seed=2 + s, structure_seed=50 + s)
        tgt = make_cloud("vegetation", offset=np.array([0.5, 0.3, 0.0]),
                         seed=30 + s, structure_seed=70 + s)
        false_eigs.append(_metrics(src, tgt)[1])
        src = make_cloud("slope", seed=2 + s, structure_seed=60 + s)
        tgt = make_cloud("slope", offset=np.array([0.3, 0.2, 0.0]),
                         seed=30 + s, structure_seed=80 + s)
        false_eigs.append(_metrics(src, tgt)[1])

    # structured true match at partial (2/3) overlap
    src = make_cloud("corner", seed=2)
    t_full = make_cloud("corner", offset=np.array([0.15, -0.1, 0.05]),
                        seed=30)
    tgt = t_full[t_full[:, 0] > 2.5]
    me_true, eig_true = _metrics(src, tgt)

    thresh = 5.0                     # verify_loop min_trans_eig default
    assert max(false_eigs) < 0.5 * thresh, false_eigs
    assert eig_true > 2.0 * thresh, eig_true
    assert me_true < 0.5 * 1.5      # max_error margin

    # end-to-end: the partial-overlap true pair is ACCEPTED by verify_loop
    _, ok = _verify(src, tgt)
    assert ok


def test_outdoor_unverifiable_true_pairs_rejected():
    """Vegetation-only / slope-only TRUE revisits are rejected as
    UNVERIFIABLE (measured: their recovered translation undershoots the
    true offset — the slide is unconstrained, so even a right-place match
    would contribute a wrong measurement). Conservative direction: cost is
    unclosed drift, never map corruption."""
    src = make_cloud("vegetation", seed=2, structure_seed=50)
    tgt = make_cloud("vegetation", offset=np.array([0.15, -0.1, 0.05]),
                     seed=30, structure_seed=50)
    _, ok = _verify(src, tgt)
    assert not ok
    src = make_cloud("slope", seed=2, structure_seed=60)
    tgt = make_cloud("slope", offset=np.array([0.1, 0.08, 0.02]),
                     seed=30, structure_seed=60)
    _, ok = _verify(src, tgt)
    assert not ok


def test_drift_budget_rejects_perfect_alias():
    """A structurally identical corner 3 m away verifies PERFECTLY (no
    local metric can tell) — the SlamSystem drift-budget gate must reject
    the closure because a 3 m correction over a ~4-keyframe path is far
    beyond plausible odometry drift."""
    from noetic_slam_tpu.models.odometry import init_state
    from noetic_slam_tpu.runtime.slam import SlamSystem

    cfg = DlioConfig(capacity=CapacityConfig(
        max_points=2048, max_ds_points=1536, max_deskew_frames=64,
        max_imu_window=32, max_keyframes=16, max_submap_kf=8))
    slam = SlamSystem(cfg, enable_tsdf=False, enable_loop_closure=True,
                      loop_radius=2.0, loop_min_gap=3)

    # Keyframe store: kf0 = corner as mapped on the FIRST visit; kf1..3
    # filler along the way; kf4 = identical corner geometry as re-observed
    # now, but the re-observation is really 3 m away (alias). Estimated
    # positions put kf4 near kf0 so the detector proposes the pair.
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

    put(0, make_cloud("corner", seed=12), [0.0, 0.0, 0.0])
    for i, x in enumerate([4.0, 8.0, 4.0], start=1):
        put(i, make_cloud("corner", offset=np.array([x + 20, 10, 0]),
                          seed=20 + i), [x + 20, 10, 0])
    # the alias: same local geometry, shifted 3 m; estimated pose near kf0
    put(4, make_cloud("corner", offset=np.array([3.0, 0.0, 0.0]), seed=13),
        [0.5, 0.0, 0.0])

    kf_seq = np.zeros((K,), np.int32)
    kf_seq[:5] = np.arange(1, 6)
    slam.odometry.state = st._replace(
        kf_xyz=jnp.asarray(kf_xyz), kf_valid=jnp.asarray(kf_valid),
        kf_cov=jnp.asarray(kf_cov), kf_pos=jnp.asarray(kf_pos),
        kf_quat=jnp.asarray(kf_quat), kf_count=jnp.int32(5),
        kf_seq=jnp.asarray(kf_seq), kf_total=jnp.int32(5))

    closed = slam.maybe_close_loop()
    assert not closed
    # >= 1: the proximity candidate is budget-rejected; the descriptor
    # second stage (models/placedesc) may surface another alias that the
    # same gate also rejects
    assert slam.loop_rejected_budget >= 1, \
        "the alias must be rejected by the BUDGET gate (verify passes)"
    assert slam.loop_closures == 0
