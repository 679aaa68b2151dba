"""Full SLAM system: odometry + TSDF fusion + pose graph + loop closure.

The composition root replacing the reference's multi-node roslaunch graph
(dlio odom node + map node + dliomapping + the absent tsdf_map node,
scripts/compound-launch.sh): one object owning

- the odometry pipeline (runtime.pipeline.OdometryPipeline),
- the TSDF map (models.tsdf), fed with every registered world-frame cloud
  (the stream dliomapping.cpp:44 subscribed to),
- a keyframe pose graph (models.posegraph) with proximity loop-closure
  detection, GICP verification, Gauss-Newton optimization, and map
  deformation applied back into the live odometry state.

Loop closure runs at keyframe rate (host-triggered, device-computed); all
hot per-scan work stays in the async odometry step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from noetic_slam_tpu.config.params import DlioConfig
from noetic_slam_tpu.models import posegraph as pg
from noetic_slam_tpu.models import tsdf as tsdf_mod
from noetic_slam_tpu.runtime.pipeline import OdometryPipeline
from noetic_slam_tpu.utils.geometry import quat_mul, quat_normalize, quat_rotate


class SlamSystem:
    def __init__(self, cfg: DlioConfig | None = None, enable_tsdf: bool = True,
                 enable_loop_closure: bool = True, loop_radius: float = 3.0,
                 loop_min_gap: int = 10, max_edges: int = 4096):
        self.cfg = cfg or DlioConfig()
        self.odometry = OdometryPipeline(self.cfg, with_tsdf=enable_tsdf)
        self.enable_tsdf = enable_tsdf
        self.enable_loop_closure = enable_loop_closure
        self.loop_radius = loop_radius
        self.loop_min_gap = loop_min_gap
        self.graph = pg.init_graph(self.cfg.capacity.max_keyframes, max_edges)
        self._graph_nodes = 0
        self.loop_closures = 0

    # ------------------------------------------------------------ per scan
    def push_imu(self, stamp, ang, acc):
        self.odometry.push_imu(stamp, ang, acc)

    @property
    def calibrated(self):
        return self.odometry.calibrated

    def imu_covers(self, stamp):
        return self.odometry.imu_covers(stamp)

    @property
    def tsdf(self):
        return self.odometry.tsdf_state

    def process_scan(self, header_stamp, xyz, point_times=None):
        # TSDF integration is fused into the same jitted program as the
        # odometry step (models.odometry.make_slam_step).
        return self.odometry.process_scan(header_stamp, xyz, point_times)

    def process_scans(self, batch):
        """Micro-batched submission (one dispatch for K scans); identical
        results to per-scan calls. Loop-closure checks happen between
        batches (keyframe-rate work, as in the per-scan path)."""
        return self.odometry.process_scans(batch)

    # ------------------------------------------------------- loop closures
    def sync_graph(self) -> int:
        """Add graph nodes/odometry edges for keyframes created since the
        last call. Returns number of new nodes."""
        st = self.odometry.state
        if st is None:
            return 0
        n = int(jax.device_get(st.kf_count))
        if n <= self._graph_nodes:
            return 0
        kf_q, kf_p = jax.device_get((st.kf_quat[:n], st.kf_pos[:n]))
        new = 0
        for k in range(self._graph_nodes, n):
            self.graph = pg.add_node(self.graph,
                                     jnp.asarray(kf_q[k]),
                                     jnp.asarray(kf_p[k]))
            if k > 0:
                dq, dp = pg.relative_pose(
                    jnp.asarray(kf_q[k - 1]), jnp.asarray(kf_p[k - 1]),
                    jnp.asarray(kf_q[k]), jnp.asarray(kf_p[k]))
                self.graph = pg.add_edge(self.graph, jnp.int32(k - 1),
                                         jnp.int32(k), dq, dp)
            new += 1
        self._graph_nodes = n
        return new

    def maybe_close_loop(self) -> bool:
        """Detect + verify + apply one loop closure for the latest keyframe.

        Returns True if a closure was applied."""
        if not self.enable_loop_closure:
            return False
        self.sync_graph()
        st = self.odometry.state
        n = self._graph_nodes
        if n < self.loop_min_gap + 2:
            return False
        cur = n - 1
        cand, ok = pg.detect_loop_candidate(
            st.kf_pos, st.kf_count, jnp.int32(cur),
            self.loop_radius, self.loop_min_gap)
        if not bool(ok):
            return False
        cand = int(cand)

        T_corr, accepted = pg.verify_loop(
            st.kf_xyz[cur], st.kf_valid[cur], st.kf_cov[cur],
            st.kf_xyz[cand], st.kf_cov[cand], self.cfg.gicp,
            max_corr_dist=2.0 * self.cfg.gicp.max_corr_dist)
        if not bool(accepted):
            return False

        # Corrected world pose of the current keyframe: T_corr moves its
        # cloud onto the candidate's map; the loop edge measures candidate ->
        # corrected-current.
        Tc = jax.device_get(T_corr)
        kq, kp = jax.device_get((st.kf_quat, st.kf_pos))
        from noetic_slam_tpu.utils.geometry import make_se3, se3_q_p

        T_cur = np.asarray(jax.device_get(make_se3(
            jnp.asarray(kq[cur]), jnp.asarray(kp[cur]))))
        T_fix = Tc @ T_cur
        q_fix, p_fix = jax.device_get(se3_q_p(jnp.asarray(T_fix)))
        dq, dp = pg.relative_pose(
            jnp.asarray(kq[cand]), jnp.asarray(kp[cand]),
            jnp.asarray(q_fix), jnp.asarray(p_fix))
        self.graph = pg.add_edge(self.graph, jnp.int32(cand),
                                 jnp.int32(cur), dq, dp,
                                 w_rot=2.0, w_trans=2.0)

        # Optimize and deform the map.
        self.graph = pg.optimize(self.graph, iters=10)
        self._apply_graph_to_state()
        self.loop_closures += 1
        return True

    def _apply_graph_to_state(self) -> None:
        """Write optimized keyframe poses back into the odometry state:
        re-transform keyframe clouds/covs, update the live pose by the last
        keyframe's correction, force a submap rebuild."""
        st = self.odometry.state
        g = self.graph
        old_q, old_p = st.kf_quat, st.kf_pos
        q, p, xyz, cov = pg.apply_pose_update(
            st.kf_quat, st.kf_pos, st.kf_xyz, st.kf_valid, st.kf_cov,
            g.node_q[: st.kf_quat.shape[0]],
            g.node_p[: st.kf_pos.shape[0]], st.kf_count)

        from noetic_slam_tpu.utils.geometry import quat_conj

        # Correction of the most recent keyframe (dq = q_new * conj(q_old)),
        # applied to the live pose.
        last = jnp.maximum(st.kf_count - 1, 0)
        dq = quat_normalize(quat_mul(q[last], quat_conj(old_q[last])))
        dp = p[last] - quat_rotate(dq, old_p[last])
        lidar_p = quat_rotate(dq, st.lidar_p) + dp
        lidar_q = quat_normalize(quat_mul(dq, st.lidar_q))
        new_p = quat_rotate(dq, st.p) + dp
        new_q = quat_normalize(quat_mul(dq, st.q))
        new_v = quat_rotate(dq, st.v)

        from noetic_slam_tpu.utils.geometry import make_se3

        self.odometry.state = st._replace(
            kf_quat=q, kf_pos=p, kf_xyz=xyz, kf_cov=cov,
            lidar_q=lidar_q, lidar_p=lidar_p,
            q=new_q, p=new_p, v=new_v, prev_vel=quat_rotate(dq, st.prev_vel),
            T=make_se3(lidar_q, lidar_p),
            submap_mask=jnp.zeros_like(st.submap_mask))

        # TSDF consistency: the volume was fused at pre-closure poses;
        # re-fuse it from the deformed keyframe clouds (keyframe-rate cost,
        # one scan-step per keyframe — see tsdf.rebuild_from_keyframes).
        if self.enable_tsdf and self.odometry.tsdf_state is not None:
            st2 = self.odometry.state
            self.odometry.tsdf_state = tsdf_mod.rebuild_from_keyframes(
                self.cfg.tsdf, st2.kf_xyz, st2.kf_valid, st2.kf_pos,
                st2.kf_count)

    # ------------------------------------------------------------- results
    def flush(self):
        return self.odometry.flush()

    def surface_points(self, min_weight: float = 1.0) -> np.ndarray:
        """Extract the TSDF zero-crossing point cloud (host array)."""
        if self.tsdf is None:
            return np.zeros((0, 3), np.float32)
        centers, d, mask = tsdf_mod.extract_surface(
            self.cfg.tsdf, self.tsdf, min_weight=min_weight)
        centers, mask = jax.device_get((centers, mask))
        return centers[mask]
