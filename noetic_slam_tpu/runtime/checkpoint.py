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


def _unpack(prefix: str, cls, data) -> Optional[object]:
    keys = [k for k in data.files if k.startswith(prefix + "/")]
    if not keys:
        return None
    import jax.numpy as jnp

    fields = {}
    for name in cls._fields:
        arr = data[f"{prefix}/{name}"]
        fields[name] = jnp.asarray(arr)
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


def load_checkpoint(path: str):
    """Returns (odom_state, map_state | None, graph | None, host dict).

    The "tsdf/" slot holds whichever dense-map backend was active; the
    class is detected from the payload field present (weight -> TsdfState,
    logodds -> OccupancyState)."""
    data = np.load(path, allow_pickle=False)
    odom = _unpack("odom", OdomState, data)
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
    config. Returns (tsdf_state | None, graph | None)."""
    odom, tsdf, graph, host = load_checkpoint(path)
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
