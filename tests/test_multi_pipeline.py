"""Multi-sequence batched pipeline (runtime/multi): lockstep execution of B
sequences through ONE vmapped (mesh-sharded) odometry step must match
running each sequence through its own OdometryPipeline — including idle
rounds (stalled / exhausted sequences), which must be exact no-ops."""

import os

import jax
import numpy as np
import pytest

from noetic_slam_tpu.config.params import CapacityConfig, DlioConfig, KeyframeConfig
from noetic_slam_tpu.parallel.mesh import make_mesh
from noetic_slam_tpu.runtime.multi import (ArrayFeed, MultiSequencePipeline,
                                           run_lockstep)
from noetic_slam_tpu.runtime.pipeline import OdometryPipeline
from noetic_slam_tpu.utils import synthetic


def _cfg():
    return DlioConfig(
        capacity=CapacityConfig(
            max_points=2048, max_ds_points=1024, max_deskew_frames=256,
            max_imu_window=64, max_keyframes=32, max_submap_kf=8,
            max_trajectory=128),
        keyframe=KeyframeConfig(thresh_dist=0.5),
        adaptive=False)


def _feed(sim_scans, max_scans=None):
    """Feed over PRE-GENERATED scans (Sim.scan is stateful-RNG: each call
    yields a fresh realization, so both runs must share one materialized
    scan list)."""
    sim, scans = sim_scans
    return ArrayFeed(sim.imu_stamps, sim.imu_ang, sim.imu_acc,
                     sim.scan_stamps, lambda i: scans[i],
                     max_scans=max_scans)


def _run_single(cfg, sim_scans, max_scans=None):
    """Reference: one sequence through its own OdometryPipeline."""
    pipe = OdometryPipeline(cfg)
    feed = _feed(sim_scans, max_scans=max_scans)
    while True:
        item = feed.next_ready_scan(pipe, pipe.push_imu)
        if item is None:
            break
        pipe.process_scan(*item)
    return pipe.flush()


@pytest.fixture(scope="module")
def sims():
    out = []
    for s in (3, 9):
        sim = synthetic.make_sim(duration=1.2, n_points=2048, calib_time=3.1,
                                 seed=s)
        out.append((sim, [sim.scan(i)
                          for i in range(len(sim.scan_stamps))]))
    return out


def test_lockstep_parity_sharded(sims):
    """Equal-length lockstep over a 2-device mesh == per-sequence runs."""
    cfg = _cfg()
    ref = [_run_single(cfg, s) for s in sims]
    assert all(len(r) > 4 for r in ref)

    mesh = make_mesh(2, axis="batch")
    mp = MultiSequencePipeline(cfg, n_seq=2, mesh=mesh)
    out = run_lockstep(mp, [_feed(s) for s in sims])
    # jit(step) vs jit(vmap(step)) differ in reduction order (~1e-5 in the
    # GICP cost), which the LM convergence gates amplify to mm over a
    # trajectory — parity is physical, not bitwise.
    for r, o in zip(ref, out):
        assert len(o) == len(r)
        np.testing.assert_allclose(o[:, 1:4], r[:, 1:4], atol=0.05)
        np.testing.assert_allclose(o[:, 0], r[:, 0], atol=1e-6)
    for (sim, _), o in zip(sims, out):
        ate = synthetic.ate_rmse(o[:, 0], o[:, 1:4], sim.gt_stamps,
                                 sim.gt_pos)
        assert ate < 0.08, ate


def test_lockstep_unequal_lengths(sims):
    """One sequence exhausts early and idles: its trajectory matches its
    truncated solo run; the longer sequence is unaffected."""
    cfg = _cfg()
    short = 5
    ref_long = _run_single(cfg, sims[0])
    ref_short = _run_single(cfg, sims[1], max_scans=short)

    mp = MultiSequencePipeline(cfg, n_seq=2)      # no mesh: plain vmap
    out = run_lockstep(mp, [
        _feed(sims[0]),
        _feed(sims[1], max_scans=short)])
    assert len(out[0]) == len(ref_long)
    assert len(out[1]) == len(ref_short)
    np.testing.assert_allclose(out[0][:, 1:4], ref_long[:, 1:4], atol=0.05)
    np.testing.assert_allclose(out[1][:, 1:4], ref_short[:, 1:4], atol=0.05)


def test_idle_round_is_exact_noop(sims):
    """An idle round (all sequences stalled) leaves the ENTIRE batched
    state bitwise unchanged except the step counter — the property that
    makes mid-stream stalls and ragged sequence ends safe."""
    import jax

    cfg = _cfg()
    mp = MultiSequencePipeline(cfg, n_seq=2)
    feeds = [_feed(s) for s in sims]

    def pull(i):
        return feeds[i].next_ready_scan(
            mp.frontends[i], lambda s, a, c, i=i: mp.push_imu(i, s, a, c))

    for _ in range(4):                     # a few real rounds first
        mp.step_round([pull(0), pull(1)])
    before = jax.device_get(mp.state)
    mp.step_round([None, None])
    after = jax.device_get(mp.state)
    for name, a, b in zip(before._fields, before, after):
        if name == "total_steps":
            np.testing.assert_array_equal(b, a + 1)
        else:
            np.testing.assert_array_equal(b, a, err_msg=name)


def test_midstream_stall_matches_solo(sims):
    """Idle rounds injected MID-sequence (an IMU-stalled sequence rides
    along) must not perturb that sequence's trajectory vs its solo run."""
    cfg = _cfg()
    ref = [_run_single(cfg, s) for s in sims]

    mp = MultiSequencePipeline(cfg, n_seq=2)
    feeds = [_feed(s) for s in sims]

    def pull(i):
        return feeds[i].next_ready_scan(
            mp.frontends[i], lambda s, a, c, i=i: mp.push_imu(i, s, a, c))

    pending = [pull(0), pull(1)]
    rounds = 0
    while any(p is not None for p in pending):
        scans = list(pending)
        # stall sequence 1 for rounds 3..5 (hold its scan back)
        if 3 <= rounds < 6 and scans[1] is not None:
            scans[1] = None
            mp.step_round(scans)
            pending[0] = pull(0) if pending[0] is not None else None
            rounds += 1
            continue                      # pending[1] stays queued
        mp.step_round(scans)
        pending = [pull(i) if pending[i] is not None else None
                   for i in range(2)]
        rounds += 1
    out = [mp.flush(0), mp.flush(1)]
    for r, o in zip(ref, out):
        assert len(o) == len(r)
        np.testing.assert_allclose(o[:, 1:4], r[:, 1:4], atol=0.05)
        np.testing.assert_allclose(o[:, 0], r[:, 0], atol=1e-6)


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "mulran_mini")


@pytest.mark.skipif(not os.path.isdir(FIXTURE),
                    reason="mulran_mini fixture not present")
def test_cli_batch_mulran(tmp_path):
    """cli batch: two MulRan-format sequences (the committed fixture) as
    one sharded SPMD program; per-sequence TUM outputs."""
    from noetic_slam_tpu import cli

    cfg_yaml = tmp_path / "small.yaml"
    cfg_yaml.write_text(
        "capacity:\n"
        "  max_points: 2048\n  max_ds_points: 1024\n"
        "  max_deskew_frames: 128\n  max_imu_window: 64\n"
        "  max_keyframes: 64\n  max_submap_kf: 32\n"
        "  max_trajectory: 512\n")
    out = tmp_path / "out"
    rc = cli.main([
        "batch", "--mulran", FIXTURE, "--mulran", FIXTURE,
        "--config", str(cfg_yaml), "--out", str(out),
        "--max-scans", "24", "--devices", "2"])
    assert rc == 0
    tums = sorted(p.name for p in out.glob("*.tum"))
    assert len(tums) == 2
    rows = np.loadtxt(out / tums[0])
    assert len(rows) >= 20


def test_checkpoint_resume_matches_uninterrupted(sims, tmp_path):
    """Kill-and-resume a 2-sequence batched run mid-stream: the combined
    (pre-save flushed + post-resume) trajectories must equal the
    uninterrupted run exactly (state round-trips bitwise; same program)."""
    cfg = _cfg()
    mp0 = MultiSequencePipeline(cfg, n_seq=2)
    full = run_lockstep(mp0, [_feed(s) for s in sims])

    mp1 = MultiSequencePipeline(cfg, n_seq=2)
    feeds = [_feed(s) for s in sims]

    def pull(i):
        return feeds[i].next_ready_scan(
            mp1.frontends[i], lambda s, a, c, i=i: mp1.push_imu(i, s, a, c))

    for _ in range(4):
        mp1.step_round([pull(0), pull(1)])
    part1 = [mp1.flush(0).copy(), mp1.flush(1).copy()]
    path = str(tmp_path / "batch.nst.npz")
    mp1.save(path, feeds)
    del mp1

    mp2 = MultiSequencePipeline(cfg, n_seq=2)     # "new process"
    feeds2 = [_feed(s) for s in sims]
    mp2.load(path, feeds2)
    assert mp2.rounds == 4
    part2 = run_lockstep(mp2, feeds2)

    for i in range(2):
        comb = np.vstack([part1[i], part2[i]])
        assert len(comb) == len(full[i])
        np.testing.assert_allclose(comb[:, 1:4], full[i][:, 1:4],
                                   atol=1e-6)
        np.testing.assert_allclose(comb[:, 0], full[i][:, 0], atol=1e-9)


def test_multi_round_dispatch_parity(sims):
    """K rounds per dispatch (lax.scan of the vmapped step) == one round
    per dispatch, including ragged tails (idle padding inside a K-batch)."""
    cfg = _cfg()
    mp1 = MultiSequencePipeline(cfg, n_seq=2)
    one = run_lockstep(mp1, [_feed(sims[0]), _feed(sims[1], max_scans=7)])

    mp3 = MultiSequencePipeline(cfg, n_seq=2)
    k3 = run_lockstep(mp3, [_feed(sims[0]), _feed(sims[1], max_scans=7)],
                      rounds_per_dispatch=3)
    assert mp3.rounds == mp1.rounds
    for a, b in zip(one, k3):
        assert len(a) == len(b)
        np.testing.assert_allclose(b[:, 1:4], a[:, 1:4], atol=0.05)
        np.testing.assert_allclose(b[:, 0], a[:, 0], atol=1e-9)


def test_checkpoint_roundtrip_sharded(sims, tmp_path):
    """save/load through a 2-device mesh: unstacking a sharded state and
    re-sharding on resume preserves trajectories exactly."""
    cfg = _cfg()
    mesh = make_mesh(2, axis="batch")
    mp1 = MultiSequencePipeline(cfg, n_seq=2, mesh=mesh)
    feeds = [_feed(s) for s in sims]

    def pull(i):
        return feeds[i].next_ready_scan(
            mp1.frontends[i], lambda s, a, c, i=i: mp1.push_imu(i, s, a, c))

    for _ in range(3):
        mp1.step_round([pull(0), pull(1)])
    part1 = [mp1.flush(0).copy(), mp1.flush(1).copy()]
    path = str(tmp_path / "batch_sharded.nst.npz")
    mp1.save(path, feeds)

    mp2 = MultiSequencePipeline(cfg, n_seq=2, mesh=mesh)
    feeds2 = [_feed(s) for s in sims]
    mp2.load(path, feeds2)
    part2 = run_lockstep(mp2, feeds2)

    mp0 = MultiSequencePipeline(cfg, n_seq=2, mesh=mesh)
    full = run_lockstep(mp0, [_feed(s) for s in sims])
    for i in range(2):
        comb = np.vstack([part1[i], part2[i]])
        assert len(comb) == len(full[i])
        np.testing.assert_allclose(comb[:, 1:4], full[i][:, 1:4],
                                   atol=1e-6)
