"""Deterministic dataset replay harness.

Replaces the reference file player's wall-clock pacing machinery
(ROSThread.cpp:287-399,454-467: 0.1 ms timer advancing processed_stamp_ by
wall-dt x play-rate, per-sensor queues, /clock publishing) with a
deterministic event-ordered replay: events are dispatched strictly in stamp
order, the "clock" is the data itself, and an optional real-time pacer
sleeps to emulate live rates. LiDAR-IMU availability follows the same rule
as the reference's cv wait (odom.cc:1024-1028): a scan is processed only
once IMU coverage reaches its sweep end, which event ordering guarantees.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class ReplayClock:
    """Deterministic clock with optional real-time pacing (play rate)."""
    rate: float = 0.0            # 0 = as fast as possible
    _start_wall: float = 0.0
    _start_data: float = 0.0
    started: bool = False

    def wait_until(self, stamp: float) -> None:
        if self.rate <= 0:
            return
        if not self.started:
            self._start_wall = time.monotonic()
            self._start_data = stamp
            self.started = True
            return
        target = self._start_wall + (stamp - self._start_data) / self.rate
        delay = target - time.monotonic()
        if delay > 0:
            time.sleep(delay)


def replay_dataset(dataset, pipeline, tsdf_integrator=None,
                   rate: float = 0.0, max_scans: Optional[int] = None,
                   on_scan: Optional[Callable] = None,
                   skip_stop_region: Optional[tuple] = None,
                   batch: int = 1,
                   on_batch: Optional[Callable] = None,
                   on_gps: Optional[Callable] = None,
                   on_radar: Optional[Callable] = None) -> dict:
    """Drive a MulranDataset (or any object with the same interface) through
    an OdometryPipeline (+ optional TSDF integrator callback).

    ``tsdf_integrator(out)`` receives each StepOutput (world cloud on
    device). ``skip_stop_region`` (t0, t1) drops events inside an absolute
    stamp window (the file player's stop-region skip,
    ROSThread.cpp:330-350).

    ``batch`` > 1 enables micro-batched submission (process_scans: one
    device dispatch per K scans — the offline-throughput mode); it requires
    rate == 0 and no per-scan callbacks, and produces identical results.
    ``on_batch(n_scans)`` fires after each flushed batch (keyframe-rate
    work such as loop-closure checks goes here).
    Returns {"n_scans", "n_imu", "wall_time"}.
    """
    from noetic_slam_tpu.runtime.pipeline import NeedMoreImu

    if batch > 1 and (rate > 0 or on_scan is not None
                      or tsdf_integrator is not None):
        raise ValueError("batch>1 requires rate=0 and no per-scan callbacks")

    clock = ReplayClock(rate=rate)
    n_scans = n_imu = 0
    pending = None       # scan waiting for IMU coverage (the cv-wait analog)
    ready: list = []     # batched mode: scans awaiting one dispatch
    t0 = time.perf_counter()

    def run_scan(stamp, idx):
        nonlocal n_scans
        raw = dataset.read_scan(idx)
        if batch > 1:
            # coverage gate BEFORE queueing: a flush must never fail on a
            # scan that was already accepted into the batch.
            if not pipeline.imu_covers(stamp):
                raise NeedMoreImu(f"IMU must cover {stamp:.6f}")
            ready.append((stamp, raw[:, :3], None))
            if len(ready) >= batch:
                pipeline.process_scans(ready)
                n_scans += len(ready)
                ready.clear()
                if on_batch is not None:
                    on_batch(n_scans)
            return
        out = pipeline.process_scan(stamp, raw[:, :3], point_times=None)
        if tsdf_integrator is not None:
            tsdf_integrator(out)
        if on_scan is not None:
            on_scan(idx, out)
        n_scans += 1

    if on_gps is None and on_radar is None:
        events = dataset.events()            # duck-typed datasets: no kinds
    else:
        kinds = ["imu", "scan"]
        if on_gps is not None:
            kinds.append("gps")
        if on_radar is not None:
            kinds.append("radar")
        events = dataset.events(tuple(kinds))
    for stamp, kind, idx in events:
        if (skip_stop_region
                and skip_stop_region[0] <= stamp <= skip_stop_region[1]):
            continue
        clock.wait_until(stamp)
        if kind == "gps":
            on_gps(stamp, dataset.gps[idx])
        elif kind == "radar":
            on_radar(stamp, idx)
        elif kind == "imu":
            pipeline.push_imu(dataset.imu_stamps[idx], dataset.imu_gyro[idx],
                              dataset.imu_accel[idx])
            n_imu += 1
            if pending is not None and pipeline.calibrated:
                try:
                    run_scan(*pending)
                    pending = None
                except NeedMoreImu:
                    pass
        elif kind == "scan":
            if not pipeline.calibrated:
                continue
            try:
                run_scan(stamp, idx)
            except NeedMoreImu:
                pending = (stamp, idx)   # retry after more IMU arrives
        if max_scans is not None and n_scans + len(ready) >= max_scans:
            break
    if ready:
        pipeline.process_scans(ready)
        n_scans += len(ready)
        ready.clear()
        if on_batch is not None:
            on_batch(n_scans)
    return {"n_scans": n_scans, "n_imu": n_imu,
            "wall_time": time.perf_counter() - t0}
