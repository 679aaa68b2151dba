"""Descriptor-led loop recovery at drift scale (VERDICT r4 item #2).

The failure mode place recognition exists for: multi-meter drift, a
revisit after a long excursion, and the original keyframes already
EVICTED from the resident store. Proximity detection
(posegraph.detect_loop_candidate) needs the estimate already within
``loop_radius`` of the truth — this scenario is built so it CANNOT fire
at the revisit, and recovery must come from the descriptor store
(models/placedesc) matching against the archive.

Scenario (utils.synthetic.path_pose_of, constant 2 m/s):

  1. HOME: two laps of a 6 m circle at the origin (keyframes +
     descriptors of the home place);
  2. OUT:  a long straight excursion (no revisit inside loop_radius);
  3. U-TURN + BACK: return along a 2.4 m-offset parallel corridor;
  4. HOME again: a lap through the starting area.

Drift injection: a gyro-bias RAMP (make_sim imu_gyro_ramp) starting
after static calibration — a constant bias would be calibrated away; the
ramp outruns the observer's bias tracking and accumulates yaw-driven
position drift that reaches >> 10x voxel by the return leg.

Asserted (artifact SOAK_r05_drift.json):
  - zero proximity-sourced closures before the first descriptor closure
    (proximity failed at the revisit, by construction);
  - the FIRST closure is descriptor-sourced with correction >= 10x voxel,
    passing the drift-budget gate;
  - the matched candidate came from the ARCHIVE (resident slot evicted);
  - the trajectory error at the end (post-recovery) is a small fraction
    of the peak drift (the closure actually recovered the pose);
  - zero lost keyframes.

Run on the chip:   python scripts/soak_drift.py
CPU regression:    DRIFT_TINY=1 python scripts/soak_drift.py
                   (tests/test_drift_recovery.py runs this)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corridor_world(path_fn, total_len: float, seed: int,
                   ground_half_width: float = 30.0,
                   building_offset: float = 9.0,
                   building_every: float = 9.0,
                   sparse_span=None, sparse_mode: str = "anchors"
                   ) -> np.ndarray:
    """Street-canyon world along the path: a ground strip plus rows of
    randomized 'buildings' (box faces) lining BOTH sides of the route.
    The default make_world keeps its walls at the world boundary — on a
    long straight leg they fall out of sensor range and the scan loses
    its lateral constraint (measured ~1 m/10 s of y-drift with zero
    injected error). Buildings every ~9 m keep every scan fully
    constrained AND give place recognition distinctive local geometry
    (heights/sizes are per-building random — the height profile is what
    the ring descriptor keys on).

    ``sparse_span`` [(s0, s1), ...]: arc-length windows where buildings
    thin out (every ~4x spacing, 60 % skipped) — the excursion's
    feature-poor stretch where registration noise accumulates REAL drift
    (injected IMU error alone cannot: scan-to-map locks the pose to the
    local map whenever geometry is strong). Buildings whose footprint
    would intrude on another part of the path (the offset return lane)
    are skipped."""
    rng = np.random.default_rng(seed)
    pts = []
    # path centerline samples
    ss = np.arange(0.0, total_len + 1.0, 2.0)
    centers = np.stack([path_fn(s / 2.0)[1][:2] for s in ss])  # v = 2 m/s
    # ground: jittered strip around the path (dense enough for plane fits)
    reps = max(int(ground_half_width * 2 * 2.0), 8)
    g = (centers[:, None, :]
         + rng.uniform(-ground_half_width, ground_half_width,
                       (len(centers), reps, 2)))
    g = g.reshape(-1, 2)
    pts.append(np.c_[g, np.zeros(len(g))])
    # buildings: alternating sides, jittered footprint/height. Sparse
    # spans place ONE smaller, farther anchor per (2x) step
    # DETERMINISTICALLY — weak-but-present geometry degrades registration
    # gracefully (random gaps produced fully unconstrained stretches that
    # destabilized, not drifted).
    s = 0.0
    flip = 1.0
    while s < total_len:
        in_sparse = any(a <= s <= b for a, b in (sparse_span or ()))
        step = building_every * (2.0 if in_sparse else 1.0)
        R, p = path_fn(s / 2.0)
        heading = np.arctan2(R[1, 0], R[0, 0])
        anchors = in_sparse and sparse_mode == "anchors"
        sides = (flip,) if anchors else (-1.0, 1.0)
        flip = -flip
        for side in sides:
            if not anchors and rng.random() < (0.35 if in_sparse else 0.2):
                continue                      # gaps: skyline varies
            off = (building_offset + 6.0 + rng.uniform(0, 3.0)
                   if anchors else building_offset + rng.uniform(0, 4.0))
            cx = p[0] + off * -np.sin(heading) * side
            cy = p[1] + off * np.cos(heading) * side
            # never drop a building onto another part of the route (the
            # return lane runs offset-parallel to the out lane, 8 m away;
            # 3.2 m keeps the roadway clear without pruning the far rows)
            if np.min(np.linalg.norm(centers - [cx, cy], axis=-1)) < 3.2:
                continue
            if anchors:
                w, h, q = rng.uniform(1.0, 2.0), rng.uniform(1.2, 2.5), 120
            else:
                w, h, q = rng.uniform(1.5, 4.0), rng.uniform(2.0, 8.0), 260
            d = rng.uniform(1.5, 4.0)
            u = rng.uniform(-w, w, q)
            v = rng.uniform(0, h, q)
            face = rng.integers(0, 2)
            if face == 0:      # face toward the street
                fx = cx - d * -np.sin(heading) * side
                fy = cy - d * np.cos(heading) * side
                pts.append(np.c_[fx + u * np.cos(heading),
                                 fy + u * np.sin(heading), v])
            else:              # roof edge / top
                pts.append(np.c_[cx + u * np.cos(heading),
                                 cy + u * np.sin(heading),
                                 np.full(q, h)])
            # always add a vertical corner edge (sharp feature)
            e = rng.uniform(0, h, 60)
            pts.append(np.c_[np.full(60, cx + w * np.cos(heading)),
                             np.full(60, cy + w * np.sin(heading)), e])
        s += step
    return np.concatenate(pts).astype(np.float32)


def build(tiny: bool):
    from noetic_slam_tpu.config.params import (CapacityConfig, DlioConfig,
                                               GicpConfig, KeyframeConfig,
                                               TsdfConfig)
    from noetic_slam_tpu.utils import synthetic

    if tiny:
        cap = CapacityConfig(
            max_points=2048, max_ds_points=1024, max_deskew_frames=512,
            max_imu_window=64, max_keyframes=24, max_submap_kf=8,
            max_trajectory=8192)
        tsdf = TsdfConfig(voxel_size=0.2, truncation=0.6, max_blocks=4096,
                          space_carving=False, scan_block_cap=1024)
        segments = [("arc", 4.0, 2 * np.pi),          # home lap
                    ("straight", 30.0),               # out
                    ("arc", 4.0, np.pi),              # U-turn (8 m offset;
                                                      # 0.5 rad/s like the
                                                      # home arc — a 1.2 m
                                                      # turn at 95 deg/s
                                                      # broke tracking)
                    ("straight", 30.0),               # back
                    ("arc", 4.0, 1.5 * np.pi)]        # home again
        # drift target at the revisit: inside [10x voxel, drift budget) =
        # [2.5 m, ~5% of the ~100 m loop path) — big enough that
        # proximity cannot fire, small enough that the budget gate admits
        # the honest recovery. Drift comes from the sparse mid-corridor
        # (weak geometry -> registration random walk), not the gyro ramp
        # alone (scan-to-map absorbs pure IMU error when geometry is
        # strong).
        ramp = [0.0, 0.0, 1.0e-4]
        n_pts = 2048
    else:
        # The chip-scale run is the TINY scenario at 2x excursion length
        # with the same small-capacity configuration: the lean 1024-point
        # downsample is exactly what lets registration noise accumulate
        # GRACEFUL multi-meter drift through the sparse stretches.
        # (Large-capacity configs on the same geometry don't drift — they
        # either hold centimeter accuracy or, on harsher sparseness, lose
        # registration outright; that failure mode is bounded by
        # gicp.max_correction + geo.max_velocity and is a different
        # regime from the drift-then-recover capability under test.)
        cap = CapacityConfig(
            max_points=2048, max_ds_points=1024, max_deskew_frames=512,
            max_imu_window=64, max_keyframes=24, max_submap_kf=8,
            max_trajectory=16384)
        tsdf = TsdfConfig(voxel_size=0.2, truncation=0.6, max_blocks=8192,
                          space_carving=False, scan_block_cap=1024)
        segments = [("arc", 4.0, 2 * np.pi),          # home lap
                    ("straight", 45.0),               # out
                    ("arc", 4.0, np.pi),              # U-turn (8 m offset)
                    ("straight", 45.0),               # back
                    ("arc", 4.0, 1.5 * np.pi)]        # home again
        ramp = [0.0, 0.0, 1.0e-4]
        n_pts = 2048
    cfg = DlioConfig(capacity=cap, adaptive=False,
                     keyframe=KeyframeConfig(thresh_dist=0.5,
                                             thresh_rot=45.0),
                     gicp=GicpConfig(), tsdf=tsdf)
    path = synthetic.path_pose_of(segments, v=2.0)
    pose_fn = synthetic.ramp_start(path, ramp_s=1.5)
    # sparse stretches: the middle of each straight leg (the turn and the
    # home area keep full geometry — turns need strong constraint, and
    # the home place must stay descriptor-distinctive)
    if tiny:
        sparse = [(33.0, 52.0), (71.0, 90.0)]
        loop_radius = 2.5
        imu_noise = 0.003
    else:
        # mid-leg sparse windows close to the tiny scenario's absolute
        # span (the registration random walk is stable through ~20-25 m
        # of weak geometry; 37 m windows tipped into a velocity runaway)
        sparse = [(35.0, 60.0), (90.0, 115.0)]
        loop_radius = 2.5
        imu_noise = 0.003
    if os.environ.get("DRIFT_DENSE") == "1":
        sparse = []
    world = corridor_world(path, path.total_length, seed=91,
                           sparse_span=sparse, sparse_mode="anchors")
    return (cfg, pose_fn, path, ramp, world, n_pts, loop_radius,
            imu_noise)


def main():
    tiny = os.environ.get("DRIFT_TINY") == "1"
    out_path = os.environ.get(
        "DRIFT_OUT", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SOAK_r05_drift.json"))
    K = int(os.environ.get("DRIFT_BATCH", "8"))

    import jax

    from noetic_slam_tpu.runtime import compile_cache
    from noetic_slam_tpu.runtime.slam import SlamSystem
    from noetic_slam_tpu.utils import synthetic

    compile_cache.enable()
    (cfg, pose_fn, path, ramp, world, n_pts, loop_radius,
     imu_noise) = build(tiny)
    # bisection knobs (debugging runs only)
    if os.environ.get("DRIFT_RAMP") is not None:
        ramp = [0.0, 0.0, float(os.environ["DRIFT_RAMP"])]
    if os.environ.get("DRIFT_NOISE") is not None:
        imu_noise = float(os.environ["DRIFT_NOISE"])
    if os.environ.get("DRIFT_NPTS") is not None:
        n_pts = int(os.environ["DRIFT_NPTS"])
    max_scans = int(os.environ.get("DRIFT_SCANS", "0")) or None
    scan_hz = 10.0
    dur = path.duration_at_speed + 1.2
    print(f"drift soak: path {path.total_length:.0f} m, "
          f"{dur:.0f} s sim (~{int(dur * scan_hz)} scans), "
          f"gyro ramp {ramp[2]:.1e} rad/s^2, imu noise {imu_noise}, "
          f"world {len(world)} pts, "
          f"backend={jax.default_backend()}", file=sys.stderr)
    sim = synthetic.make_sim(duration=dur, scan_hz=scan_hz,
                             n_points=n_pts, calib_time=3.1, seed=31,
                             pose_fn=pose_fn, imu_noise=imu_noise,
                             imu_gyro_ramp=ramp, world_pts=world)

    slam = SlamSystem(cfg, enable_tsdf=True, enable_loop_closure=True,
                      loop_radius=loop_radius, loop_min_gap=15,
                      pipelined=True)

    t_gen = time.perf_counter()
    n_gen = len(sim.scan_stamps) if max_scans is None else \
        min(max_scans, len(sim.scan_stamps))
    scans = [sim.scan(i) for i in range(n_gen)]
    n_scans = len(scans)
    print(f"scan gen: {time.perf_counter() - t_gen:.1f} s", file=sys.stderr)

    t_w = time.perf_counter()
    slam.warmup()
    warmup_s = time.perf_counter() - t_w
    print(f"warmup: {warmup_s:.1f} s", file=sys.stderr)

    imu_i = 0
    gt_of = lambda t: np.stack(
        [np.interp(t, sim.gt_stamps, sim.gt_pos[:, k]) for k in range(3)],
        -1)

    t0 = time.perf_counter()
    closure_every = 2 * K
    for b0 in range(0, n_scans, K):
        chunk = scans[b0: b0 + K]
        through = max(h + pt.max() for h, _, pt in chunk) + 0.02
        while (imu_i < len(sim.imu_stamps)
               and sim.imu_stamps[imu_i] <= through):
            slam.push_imu(sim.imu_stamps[imu_i], sim.imu_ang[imu_i],
                          sim.imu_acc[imu_i])
            imu_i += 1
        slam.process_scans(chunk)
        if b0 % closure_every < K:
            had = slam.loop_closures
            slam.maybe_close_loop()
            if slam.loop_closures > had:
                slam.closure_log[-1]["scan"] = b0
                print(f"scan {b0}: closure "
                      f"{slam.closure_log[-1]['source']} corr="
                      f"{slam.closure_log[-1]['correction_m']:.2f} m",
                      file=sys.stderr)
    slam.sync_graph()
    wall = time.perf_counter() - t0

    traj = slam.flush()
    np.savez(os.environ.get("DRIFT_TRAJ", "/tmp/drift_traj.npz"),
             traj=traj, gt_stamps=sim.gt_stamps, gt_pos=sim.gt_pos)
    bad = ~np.isfinite(traj).all(axis=-1)
    if bad.any():
        print(f"DIVERGED: {int(bad.sum())}/{len(traj)} non-finite poses "
              f"(first at index {int(np.argmax(bad))})", file=sys.stderr)
        traj = traj[~bad]
        if len(traj) < 10:
            return 1
    ate = synthetic.ate_rmse(traj[:, 0], traj[:, 1:4], sim.gt_stamps,
                             sim.gt_pos)
    # unaligned error over time (drift visibility)
    gt_i = gt_of(traj[:, 0])
    err_t = np.linalg.norm(traj[:, 1:4] - gt_i, axis=-1)
    dec = max(1, len(err_t) // 10)
    err_deciles = [round(float(err_t[i:i + dec].mean()), 3)
                   for i in range(0, len(err_t), dec)][:10]

    log = slam.closure_log
    voxel = cfg.tsdf.voxel_size
    # The RECOVERY closure: the first applied closure whose correction is
    # >= 10x voxel. Early sub-voxel closures (lap overlap, corridor
    # self-matches) are healthy background behavior, not the event under
    # test — the assertions target the drift-scale correction.
    rec_i = next((i for i, c in enumerate(log)
                  if c["correction_m"] >= 10 * voxel), None)
    first = log[rec_i] if rec_i is not None else None
    big_prox_before = [c for c in (log[:rec_i] if rec_i is not None
                                   else log)
                       if c["source"] == "proximity"
                       and c["correction_m"] >= 10 * voxel]
    peak_drift = float(err_t.max())
    end_err = float(np.mean(err_t[-max(len(err_t) // 20, 1):]))
    # post-hoc drift trace: unaligned error sampled along the run
    step = max(len(err_t) // 40, 1)
    drift_trace = [[int(i), round(float(err_t[i]), 3)]
                   for i in range(0, len(err_t), step)]

    result = {
        "artifact": "descriptor-led drift recovery soak "
                    "(scripts/soak_drift.py)",
        "backend": jax.default_backend(),
        "scans": n_scans,
        "path_length_m": round(path.total_length, 1),
        "wall_seconds": round(wall, 1),
        "warmup_seconds": round(warmup_s, 1),
        "scans_per_sec_overall": round(n_scans / wall, 2),
        "gyro_ramp_rad_s2": ramp[2],
        "voxel_m": voxel,
        "peak_drift_m": round(peak_drift, 3),
        "end_error_m": round(end_err, 3),
        "err_deciles_unaligned_m": err_deciles,
        "ate_rmse_aligned_m": round(ate, 4),
        "drift_trace": drift_trace,
        "closures": [{k: c.get(k) for k in
                      ("scan", "source", "cand_archived", "cur_archived",
                       "correction_m", "cand_node", "cur_node",
                       "moved_keyframes")}
                     for c in log],
        "loop_skipped_small": slam.loop_skipped_small,
        "loop_closures_applied": slam.loop_closures,
        "loop_closures_descriptor": slam.loop_closures_descriptor,
        "loop_rejected_budget": slam.loop_rejected_budget,
        "loop_raced": slam.loop_raced,
        "reg_rejected": int(jax.device_get(
            slam.odometry.state.reg_rejected)),
        "sync_lost_keyframes": slam.sync_lost_keyframes,
        "archived_keyframes": len(slam.archive) if slam.archive else 0,
        "resident_capacity": cfg.capacity.max_keyframes,
        "descriptor_queries": len(slam.desc_log),
    }

    checks = {
        "recovery_closure_exists": first is not None,
        "recovery_is_descriptor":
            bool(first and first["source"] == "descriptor"),
        # proximity never bridged the drift (no >=10x-voxel proximity
        # closure before — or at all, when no recovery happened)
        "no_big_proximity_closure_before_recovery":
            len(big_prox_before) == 0,
        "candidate_from_archive_after_eviction":
            bool(first and first["cand_archived"]),
        "recovered_end_error_small":
            bool(end_err < max(0.25 * peak_drift, 3 * voxel)),
        "zero_lost_keyframes": slam.sync_lost_keyframes == 0,
    }
    result["checks"] = checks
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("drift_trace", "closures")}, indent=1))
    ok = all(checks.values())
    print(f"DRIFT SOAK {'OK' if ok else 'FAILED'}: {checks}",
          file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
