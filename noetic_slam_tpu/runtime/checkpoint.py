"""Checkpoint/resume of the full SLAM state.

The reference cannot checkpoint: a crash loses odometry state (SURVEY.md §5
— only map artifacts are saved, map.cc:81-110 / dliomapping.cpp:64-86).
Here the entire device state is an explicit pytree, so checkpointing is a
flat save of named leaves plus the host-side bookkeeping:

- OdomState / TsdfState / PoseGraph pytrees -> one compressed .npz
- host pipeline scalars (headers, flushed counts, IMU buffer, calibration)
  -> a JSON/npz sidecar inside the same file

Format: ``<name>.nst.npz`` with keys ``odom/<field>``, ``tsdf/<field>``,
``graph/<field>``, ``host/<field>``.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import numpy as np

from noetic_slam_tpu.models.odometry import OdomState
from noetic_slam_tpu.models.posegraph import PoseGraph
from noetic_slam_tpu.models.tsdf import TsdfState


def _pack(prefix: str, tree, out: dict) -> None:
    if tree is None:
        return
    for name, leaf in zip(type(tree)._fields, tree):
        out[f"{prefix}/{name}"] = np.asarray(jax.device_get(leaf))


def _unpack(prefix: str, cls, data, defaults=None) -> Optional[object]:
    """Rebuild one state pytree from the flat archive. Fields absent from
    the file (a checkpoint written before the field existed — e.g. the
    outbox ring added in r4) fall back to ``defaults`` (an init-shaped
    instance of ``cls``) when provided; otherwise the incompatibility is
    reported by name instead of a bare KeyError."""
    keys = [k for k in data.files if k.startswith(prefix + "/")]
    if not keys:
        return None
    import jax.numpy as jnp

    fields = {}
    missing = []
    for name in cls._fields:
        key = f"{prefix}/{name}"
        if key in data.files:
            fields[name] = jnp.asarray(data[key])
        elif defaults is not None:
            fields[name] = getattr(defaults, name)
        else:
            missing.append(name)
    if missing:
        raise ValueError(
            f"checkpoint is missing {prefix} fields {missing} — written by "
            f"an older version of this package; load it through "
            f"load_pipeline (which fills init-shaped defaults) or "
            f"re-create it")
    return cls(**fields)


def save_checkpoint(path: str, odom_state: OdomState,
                    tsdf_state: TsdfState | None = None,
                    graph: PoseGraph | None = None,
                    host: dict | None = None,
                    arrays: dict | None = None) -> None:
    """``arrays``: extra named host arrays saved under ``extra/<name>``
    (used for the keyframe archive — large int16 payloads that must not
    ride the JSON sidecar)."""
    out: dict = {}
    _pack("odom", odom_state, out)
    _pack("tsdf", tsdf_state, out)
    _pack("graph", graph, out)
    if host:
        out["host/json"] = np.frombuffer(
            json.dumps(host).encode(), dtype=np.uint8)
    for name, arr in (arrays or {}).items():
        out[f"extra/{name}"] = np.asarray(arr)
    np.savez_compressed(path, **out)


def load_checkpoint(path: str, odom_defaults: OdomState | None = None):
    """Returns (odom_state, map_state | None, graph | None, host dict).

    The "tsdf/" slot holds whichever dense-map backend was active; the
    class is detected from the payload field present (weight -> TsdfState,
    logodds -> OccupancyState). ``odom_defaults``: init-shaped OdomState
    supplying fields the file predates (see _unpack)."""
    data = np.load(path, allow_pickle=False)
    odom = _unpack("odom", OdomState, data, defaults=odom_defaults)
    if "tsdf/logodds" in data.files:
        from noetic_slam_tpu.models.occupancy import OccupancyState

        tsdf = _unpack("tsdf", OccupancyState, data)
    else:
        tsdf = _unpack("tsdf", TsdfState, data)
    graph = _unpack("graph", PoseGraph, data)
    host = {}
    if "host/json" in data.files:
        host = json.loads(bytes(data["host/json"]).decode())
    return odom, tsdf, graph, host


def load_extra_arrays(path: str) -> dict:
    """The ``extra/<name>`` host arrays of a checkpoint (empty if none)."""
    data = np.load(path, allow_pickle=False)
    return {k[len("extra/"):]: data[k] for k in data.files
            if k.startswith("extra/")}


def save_pipeline(path: str, pipeline, tsdf_state=None, graph=None,
                  extra_host: dict | None = None,
                  extra_arrays: dict | None = None) -> None:
    """Checkpoint an OdometryPipeline (+ optional map/graph) with its host
    bookkeeping so replay can resume mid-sequence."""
    host = {
        "prev_header": pipeline.prev_header,
        "headers": pipeline.headers,
        "first_scan_stamp": pipeline.first_scan_stamp,
        "flushed_scans": pipeline._flushed_scans,
        "calibrated": pipeline.calibrated,
        "imu_stamps": np.asarray(pipeline._imu_stamps).tolist(),
        "imu_ang": np.asarray(pipeline._imu_ang).tolist(),
        "imu_acc": np.asarray(pipeline._imu_acc).tolist(),
    }
    if extra_host:
        host.update(extra_host)
    save_checkpoint(path, pipeline.state, tsdf_state, graph, host,
                    arrays=extra_arrays)


def load_pipeline(path: str, pipeline):
    """Restore a checkpoint into an OdometryPipeline built with the same
    config. Returns (tsdf_state | None, graph | None). Fields the file
    predates (e.g. the r4 outbox ring) restore to init defaults — correct
    for the outbox because checkpoints are written post-sync (an empty
    ring has nothing left to drain)."""
    from noetic_slam_tpu.models.odometry import init_state

    odom, tsdf, graph, host = load_checkpoint(
        path, odom_defaults=init_state(pipeline.cfg))
    pipeline.state = odom
    pipeline.prev_header = host.get("prev_header")
    pipeline.headers = list(host.get("headers", []))
    pipeline.first_scan_stamp = host.get("first_scan_stamp")
    pipeline._flushed_scans = int(host.get("flushed_scans", 0))
    pipeline.calibrated = bool(host.get("calibrated", True))
    pipeline._imu_stamps = np.asarray(host.get("imu_stamps", []), np.float64)
    pipeline._imu_ang = np.asarray(host.get("imu_ang", []),
                                   np.float64).reshape(-1, 3)
    pipeline._imu_acc = np.asarray(host.get("imu_acc", []),
                                   np.float64).reshape(-1, 3)
    return tsdf, graph
