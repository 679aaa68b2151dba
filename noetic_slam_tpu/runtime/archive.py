"""Host-side keyframe archive + incrementally corrected dense-map volume.

Long-run correctness component (no single reference counterpart; it fills
the contract gap between two reference behaviors):

- the reference's dense-map recorder accumulates EVERY deskewed cloud for
  the whole run, unbounded (src/dliomapping/dliomapping.cpp:41-99), and its
  keyframe store never evicts (src/dlio/src/dlio/odom.cc:1517-1598);
- the TPU odometry state is fixed-capacity by design (CapacityConfig), so
  the device keyframe store DOES evict on km-scale runs.

Without an archive, a loop closure late in a long run could only re-fuse
the dense map from the <=K resident keyframes — erasing all evicted
geometry. This module keeps every keyframe ever created on the HOST
(quantized int16 local-frame clouds, ~48 KB per 8k-point keyframe) and
maintains an "archive volume": an UNCLAMPED dense-map state that always
equals the sum of every archived keyframe's contribution at its
current-best pose.

Because the unclamped payload is a pure linear sum (models/tsdf.NO_CLAMP,
occupancy l_min/l_max at +-1e30) and sample generation is deterministic,
``integrate_signed`` with sign=-1 exactly removes a prior sign=+1
contribution. A pose-graph correction therefore costs
O(keyframes whose pose moved) — subtract at the old pose, re-add at the
optimized pose — instead of a full O(all keyframes ever) rebuild, and
voxels in regions no moved keyframe touches are left BIT-IDENTICAL
(untouched payload rows are never read or written).

``snapshot_live`` converts the archive volume into a fresh live-map state
(clamp applied once at conversion — algebraically identical to the
reference-class clamped weighted mean at keyframe granularity), which
SlamSystem installs as the post-closure dense map.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from noetic_slam_tpu.config.params import OccupancyConfig, TsdfConfig
from noetic_slam_tpu.models import occupancy as occ_mod
from noetic_slam_tpu.models import tsdf as tsdf_mod
from noetic_slam_tpu.utils.geometry import quat_to_mat

_QMAX = 32766.0


@dataclasses.dataclass
class ArchiveEntry:
    """One keyframe, local-frame quantized (int16 at adaptive per-keyframe
    scale: worst case ~4 mm at 130 m — under LiDAR noise), plus the pose at
    which it is currently fused into the archive volume."""
    q: np.ndarray          # (4,) f32 wxyz — fused-at pose
    p: np.ndarray          # (3,) f32
    xyz_q: np.ndarray      # (N, 3) int16 local-frame
    scale: float
    valid: np.ndarray      # (N,) bool


@partial(jax.jit, donate_argnums=(1,), static_argnames=("cfg", "backend"))
def _fuse_entry(cfg, vol, xyz_q, scale, valid, q, p, sign,
                backend: str = "tsdf"):
    """Dequantize + transform to world + signed-integrate ONE archived
    keyframe. One jitted program for both add and subtract: identical
    (xyz_q, scale, valid, q, p) produce an identical sample stream, so
    sign=-1 yields the bitwise negation of sign=+1 (exact de-fusion)."""
    local = xyz_q.astype(jnp.float32) * scale
    R = quat_to_mat(q)
    world = local @ R.T + p
    if backend == "occupancy":
        return occ_mod.integrate_signed(cfg, vol, world, valid, p, sign)
    return tsdf_mod.integrate_signed(cfg, vol, world, valid, p, sign)


@partial(jax.jit, static_argnames=("acfg", "lcfg"))
def _snapshot_tsdf(acfg: TsdfConfig, lcfg: TsdfConfig,
                   vol: tsdf_mod.TsdfState) -> tsdf_mod.TsdfState:
    """Archive volume -> fresh live TsdfState: apply the live config's
    max_weight clamp once (exact clamped-weighted-mean at keyframe
    granularity — see tsdf._integrate_samples docstring) and copy every
    leaf (the live state is donated per scan; no aliasing allowed)."""
    w = jnp.maximum(vol.weight, 0.0)        # signed-cancel residuals ~ -1ulp
    clamped = jnp.minimum(w, lcfg.max_weight)
    wsum = jnp.where(w > 1e-12, vol.wsum * (clamped / jnp.maximum(w, 1e-12)),
                     0.0)
    return tsdf_mod.TsdfState(
        dir_keys=vol.dir_keys + 0, dir_slots=vol.dir_slots + 0,
        num_blocks=vol.num_blocks + 0, wsum=wsum, weight=clamped,
        dropped=vol.dropped + 0)


@partial(jax.jit, static_argnames=("acfg", "lcfg"))
def _snapshot_occ(acfg: OccupancyConfig, lcfg: OccupancyConfig,
                  vol: occ_mod.OccupancyState) -> occ_mod.OccupancyState:
    return occ_mod.OccupancyState(
        dir_keys=vol.dir_keys + 0, dir_slots=vol.dir_slots + 0,
        num_blocks=vol.num_blocks + 0,
        logodds=jnp.clip(vol.logodds, lcfg.l_min, lcfg.l_max),
        dropped=vol.dropped + 0)


class KeyframeArchive:
    def __init__(self, map_cfg, backend: str = "tsdf"):
        self.backend = backend
        self.live_cfg = map_cfg
        if backend == "occupancy":
            self.cfg = dataclasses.replace(map_cfg, l_min=-1e30, l_max=1e30)
            self.volume = occ_mod.init_occupancy(self.cfg)
        else:
            self.cfg = dataclasses.replace(map_cfg,
                                           max_weight=tsdf_mod.NO_CLAMP)
            self.volume = tsdf_mod.init_tsdf(self.cfg)
        self.entries: Dict[int, ArchiveEntry] = {}

    def __len__(self) -> int:
        return len(self.entries)

    # ------------------------------------------------------------- ingest
    def add(self, node: int, q, p, xyz_world, valid) -> None:
        """Archive one keyframe (cloud given world-frame at pose (q, p))
        and fuse it into the archive volume at that pose."""
        from noetic_slam_tpu.utils.geometry import quat_to_mat_np

        q = np.asarray(q, np.float32)
        p = np.asarray(p, np.float32)
        valid = np.asarray(valid, bool)
        R = quat_to_mat_np(q)        # host: no per-keyframe device trip
        local = (np.asarray(xyz_world, np.float32) - p) @ R
        local = np.where(valid[:, None], local, 0.0).astype(np.float32)
        amax = float(np.abs(local).max()) if local.size else 0.0
        scale = max(amax / _QMAX, 1e-4)
        xyz_q = np.clip(np.round(local / scale), -_QMAX, _QMAX
                        ).astype(np.int16)
        entry = ArchiveEntry(q=q, p=p, xyz_q=xyz_q, scale=scale, valid=valid)
        self.entries[int(node)] = entry
        self.volume = _fuse_entry(
            self.cfg, self.volume, jnp.asarray(xyz_q),
            jnp.float32(scale), jnp.asarray(valid), jnp.asarray(q),
            jnp.asarray(p), jnp.float32(1.0), backend=self.backend)

    # ------------------------------------------------------- pose updates
    def apply_poses(self, node_q: np.ndarray, node_p: np.ndarray,
                    eps_t: float = 1e-4, eps_r: float = 1e-4) -> int:
        """Move archived keyframes to their optimized graph poses:
        for every entry whose pose moved more than (eps_t [m], eps_r [rad])
        subtract its contribution at the old pose and re-add at the new
        one. Returns the number of keyframes re-fused (the incremental
        closure cost driver recorded by the soak harness)."""
        moved = 0
        for node, e in self.entries.items():
            if node >= len(node_p):
                continue
            nq = np.asarray(node_q[node], np.float32)
            np_ = np.asarray(node_p[node], np.float32)
            dt = float(np.linalg.norm(np_ - e.p))
            # angle via |<q1,q2>|: 1 - |dot| ~ theta^2/8 for small theta
            dr = float(2.0 * np.arccos(np.clip(abs(np.dot(nq, e.q)), 0, 1)))
            if dt <= eps_t and dr <= eps_r:
                continue
            xq = jnp.asarray(e.xyz_q)
            vv = jnp.asarray(e.valid)
            sc = jnp.float32(e.scale)
            self.volume = _fuse_entry(
                self.cfg, self.volume, xq, sc, vv, jnp.asarray(e.q),
                jnp.asarray(e.p), jnp.float32(-1.0), backend=self.backend)
            self.volume = _fuse_entry(
                self.cfg, self.volume, xq, sc, vv, jnp.asarray(nq),
                jnp.asarray(np_), jnp.float32(1.0), backend=self.backend)
            e.q, e.p = nq, np_
            moved += 1
        return moved

    # ------------------------------------------------------------ outputs
    def snapshot_live(self):
        """Fresh live-map state (clamped per the live config, all leaves
        copied — safe against per-scan donation)."""
        if self.backend == "occupancy":
            return _snapshot_occ(self.cfg, self.live_cfg, self.volume)
        return _snapshot_tsdf(self.cfg, self.live_cfg, self.volume)

    # -------------------------------------------------------- persistence
    def pack(self) -> dict:
        """Stacked host arrays for checkpointing (runtime/checkpoint.py)."""
        if not self.entries:
            return {}
        nodes = np.asarray(sorted(self.entries), np.int32)
        es = [self.entries[int(n)] for n in nodes]
        return {
            "nodes": nodes,
            "q": np.stack([e.q for e in es]),
            "p": np.stack([e.p for e in es]),
            "xyz_q": np.stack([e.xyz_q for e in es]),
            "scale": np.asarray([e.scale for e in es], np.float32),
            "valid": np.stack([e.valid for e in es]),
        }

    def unpack(self, data: dict) -> None:
        """Restore entries AND replay them into a fresh archive volume
        (deterministic: same inputs, same jitted program)."""
        if self.backend == "occupancy":
            self.volume = occ_mod.init_occupancy(self.cfg)
        else:
            self.volume = tsdf_mod.init_tsdf(self.cfg)
        self.entries = {}
        if not data or "nodes" not in data:
            return
        for i, node in enumerate(np.asarray(data["nodes"])):
            e = ArchiveEntry(
                q=np.asarray(data["q"][i], np.float32),
                p=np.asarray(data["p"][i], np.float32),
                xyz_q=np.asarray(data["xyz_q"][i], np.int16),
                scale=float(data["scale"][i]),
                valid=np.asarray(data["valid"][i], bool))
            self.entries[int(node)] = e
            self.volume = _fuse_entry(
                self.cfg, self.volume, jnp.asarray(e.xyz_q),
                jnp.float32(e.scale), jnp.asarray(e.valid),
                jnp.asarray(e.q), jnp.asarray(e.p), jnp.float32(1.0),
                backend=self.backend)
