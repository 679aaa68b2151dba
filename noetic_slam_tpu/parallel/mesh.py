"""Device-mesh helpers.

The reference's "distribution" is ROS pub/sub between processes on one host
(SURVEY.md §2.6/P4); the TPU-native replacement is a single SPMD program over
a ``jax.sharding.Mesh``, with map/keyframe state sharded across devices and
XLA collectives carrying what used to be topic traffic.

Axis naming convention used across the framework:
- ``"map"``  — spatial sharding: submap/target points, TSDF blocks,
  keyframe shards (the per-chip axis; rides ICI within a host).
- ``"batch"`` — replay/data parallelism over independent sequences
  (multi-host axis; rides DCN between hosts). Added when N_hosts > 1.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "map",
              devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(n_map: int, n_batch: int, devices=None) -> Mesh:
    """2-D mesh: ("batch", "map"); batch outer so it maps to hosts/DCN."""
    devices = devices if devices is not None else jax.devices()
    grid = np.asarray(devices[: n_map * n_batch]).reshape(n_batch, n_map)
    return Mesh(grid, ("batch", "map"))
