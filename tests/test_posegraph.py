import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from noetic_slam_tpu.models import posegraph as pg
from tests import reference_math as ref


def _to_q(R):
    q = Rotation.from_matrix(R).as_quat()
    return np.array([q[3], q[0], q[1], q[2]])


def _circle_graph(n=12, drift=0.05, rng=None):
    """Ground truth: poses around a circle; odometry edges measured exactly,
    but integrated node estimates accumulate drift. Loop edge closes it."""
    gt_q, gt_p = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        R = Rotation.from_rotvec([0, 0, ang]).as_matrix()
        p = np.array([np.cos(ang), np.sin(ang), 0.0]) * 5.0
        gt_q.append(_to_q(R))
        gt_p.append(p)
    gt_q, gt_p = np.stack(gt_q), np.stack(gt_p)

    # exact relative measurements
    edges = []
    for k in range(n - 1):
        dq = ref.quat_mul(gt_q[k] * [1, -1, -1, -1], gt_q[k + 1])
        dp = ref.quat_rotate(gt_q[k] * [1, -1, -1, -1], gt_p[k + 1] - gt_p[k])
        edges.append((k, k + 1, dq, dp))
    # loop closure last -> first
    dq = ref.quat_mul(gt_q[-1] * [1, -1, -1, -1], gt_q[0])
    dp = ref.quat_rotate(gt_q[-1] * [1, -1, -1, -1], gt_p[0] - gt_p[-1])
    edges.append((n - 1, 0, dq, dp))

    # drifted initial estimates: perturb each node increasingly
    est_q, est_p = [gt_q[0]], [gt_p[0]]
    for k in range(1, n):
        w = rng.normal(scale=drift * 0.2, size=3)
        dqp = ref.quat_mul(_to_q(Rotation.from_rotvec(w).as_matrix()),
                           gt_q[k])
        est_q.append(dqp / np.linalg.norm(dqp))
        est_p.append(gt_p[k] + rng.normal(scale=drift, size=3) * k / n * 5)
    return gt_q, gt_p, np.stack(est_q), np.stack(est_p), edges


def test_posegraph_converges_to_ground_truth(rng):
    gt_q, gt_p, est_q, est_p, edges = _circle_graph(rng=rng)
    g = pg.init_graph(16, 32)
    for k in range(len(gt_q)):
        g = pg.add_node(g, jnp.asarray(est_q[k], jnp.float32),
                        jnp.asarray(est_p[k], jnp.float32))
    for (i, j, dq, dp) in edges:
        g = pg.add_edge(g, jnp.int32(i), jnp.int32(j),
                        jnp.asarray(dq, jnp.float32),
                        jnp.asarray(dp, jnp.float32))

    cost0 = float(pg.graph_cost(g))
    g2 = pg.optimize(g, iters=15)
    cost1 = float(pg.graph_cost(g2))
    assert cost1 < cost0 * 1e-3, (cost0, cost1)

    # gauge: node 0 pinned; all nodes near ground truth
    p_err = np.linalg.norm(np.asarray(g2.node_p)[:12] - gt_p, axis=-1)
    assert p_err.max() < 0.02, p_err.max()
    qdot = np.abs(np.sum(np.asarray(g2.node_q)[:12] * gt_q, axis=-1))
    assert qdot.min() > 0.9999


def test_relative_pose_roundtrip(rng):
    q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
    q2 = rng.normal(size=4); q2 /= np.linalg.norm(q2)
    p1, p2 = rng.normal(size=3), rng.normal(size=3)
    dq, dp = pg.relative_pose(jnp.asarray(q1, jnp.float32),
                              jnp.asarray(p1, jnp.float32),
                              jnp.asarray(q2, jnp.float32),
                              jnp.asarray(p2, jnp.float32))
    # compose back: q2' = q1 * dq, p2' = p1 + R1 dp
    q2b = ref.quat_mul(q1, np.asarray(dq, np.float64))
    p2b = p1 + ref.quat_rotate(q1, np.asarray(dp, np.float64))
    assert min(np.linalg.norm(q2b - q2), np.linalg.norm(q2b + q2)) < 1e-5
    np.testing.assert_allclose(p2b, p2, atol=1e-5)


def test_detect_loop_candidate():
    pos = np.zeros((10, 3), np.float32)
    pos[:, 0] = np.arange(10)
    pos[9] = [0.3, 0.1, 0.0]   # returns near start
    idx, ok = pg.detect_loop_candidate(jnp.asarray(pos), jnp.int32(10),
                                       jnp.int32(9), radius=1.0, min_gap=5)
    assert bool(ok) and int(idx) == 0
    # gap guard: neighbor keyframes never match
    idx, ok = pg.detect_loop_candidate(jnp.asarray(pos), jnp.int32(10),
                                       jnp.int32(4), radius=1.5, min_gap=5)
    assert not bool(ok)


def test_apply_pose_update_moves_clouds(rng):
    K, N = 4, 16
    kf_q = np.tile([1.0, 0, 0, 0], (K, 1)).astype(np.float32)
    kf_p = np.zeros((K, 3), np.float32)
    kf_xyz = rng.normal(size=(K, N, 3)).astype(np.float32)
    kf_valid = np.ones((K, N), bool)
    kf_cov = np.tile(np.array([1, 0, 0, 1, 0, 1], np.float32), (K, N, 1))
    new_q = kf_q.copy()
    new_p = kf_p.copy()
    new_p[1] = [1.0, 2.0, 3.0]
    q, p, xyz, cov = pg.apply_pose_update(
        jnp.asarray(kf_q), jnp.asarray(kf_p), jnp.asarray(kf_xyz),
        jnp.asarray(kf_valid), jnp.asarray(kf_cov),
        jnp.asarray(new_q), jnp.asarray(new_p), jnp.int32(K))
    np.testing.assert_allclose(np.asarray(xyz)[1], kf_xyz[1] + [1, 2, 3],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz)[0], kf_xyz[0], atol=1e-6)


def _build_graph(gt_q, gt_p, est_q, est_p, edges, max_nodes, max_edges):
    g = pg.init_graph(max_nodes, max_edges)
    for k in range(len(gt_q)):
        g = pg.add_node(g, jnp.asarray(est_q[k], jnp.float32),
                        jnp.asarray(est_p[k], jnp.float32))
    for (i, j, dq, dp) in edges:
        g = pg.add_edge(g, jnp.int32(i), jnp.int32(j),
                        jnp.asarray(dq, jnp.float32),
                        jnp.asarray(dp, jnp.float32))
    return g


def test_cg_matches_dense(rng):
    """The matrix-free PCG solver must land on the dense solution (same GN
    iterations, same damping) to solver tolerance."""
    gt_q, gt_p, est_q, est_p, edges = _circle_graph(n=24, rng=rng)
    g = _build_graph(gt_q, gt_p, est_q, est_p, edges, 32, 64)
    gd = pg.optimize(g, iters=8, method="dense")
    gc = pg.optimize(g, iters=8, method="cg", cg_iters=150)
    n = len(gt_q)
    dp = np.linalg.norm(np.asarray(gd.node_p)[:n]
                        - np.asarray(gc.node_p)[:n], axis=-1)
    assert dp.max() < 1e-3, dp.max()
    qdot = np.abs(np.sum(np.asarray(gd.node_q)[:n]
                         * np.asarray(gc.node_q)[:n], axis=-1))
    assert qdot.min() > 1 - 1e-6
    assert float(pg.graph_cost(gc)) < float(pg.graph_cost(g)) * 1e-3


def test_cg_scales_to_k256(rng):
    """City-scale path: a 256-node circle (the dense path would build a
    1536^2 system; auto dispatches to CG) converges to ground truth."""
    gt_q, gt_p, est_q, est_p, edges = _circle_graph(n=256, drift=0.1,
                                                    rng=rng)
    g = _build_graph(gt_q, gt_p, est_q, est_p, edges, 256, 512)
    assert int(g.n_nodes) == 256
    g2 = pg.optimize(g, iters=12)          # auto -> cg at K=256
    cost0, cost1 = float(pg.graph_cost(g)), float(pg.graph_cost(g2))
    assert cost1 < cost0 * 1e-3, (cost0, cost1)
    p_err = np.linalg.norm(np.asarray(g2.node_p)[:256] - gt_p, axis=-1)
    assert p_err.max() < 0.05, p_err.max()


def test_grow_preserves_graph_and_optimize(rng):
    """pg.grow: building a graph through doubling growth yields the same
    optimize() result as building it directly at the final capacity —
    node ids stay valid, padded nodes/edges are inert."""
    gt_q, gt_p, est_q, est_p, edges = _circle_graph(rng=rng)

    big = pg.init_graph(16, 32)
    grown = pg.init_graph(4, 4)
    for k in range(len(gt_q)):
        if int(grown.n_nodes) + 1 > grown.node_q.shape[0]:
            grown = pg.grow(grown, max_nodes=2 * grown.node_q.shape[0])
        q, p = (jnp.asarray(est_q[k], jnp.float32),
                jnp.asarray(est_p[k], jnp.float32))
        big = pg.add_node(big, q, p)
        grown = pg.add_node(grown, q, p)
    for (i, j, dq, dp) in edges:
        if int(grown.n_edges) + 1 > grown.edge_i.shape[0]:
            grown = pg.grow(grown, max_edges=2 * grown.edge_i.shape[0])
        args = (jnp.int32(i), jnp.int32(j), jnp.asarray(dq, jnp.float32),
                jnp.asarray(dp, jnp.float32))
        big = pg.add_edge(big, *args)
        grown = pg.add_edge(grown, *args)

    assert int(grown.n_nodes) == len(gt_q)
    assert int(grown.n_edges) == len(edges)
    assert grown.node_q.shape[0] >= len(gt_q) > 4
    assert grown.edge_i.shape[0] >= len(edges) > 4

    ob = pg.optimize(big, iters=15)
    og = pg.optimize(grown, iters=15)
    n = len(gt_q)
    np.testing.assert_allclose(np.asarray(og.node_p)[:n],
                               np.asarray(ob.node_p)[:n], atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(
        np.asarray(og.node_q)[:n] * np.asarray(ob.node_q)[:n], -1)),
        1.0, atol=1e-6)


def test_add_nodes_chain_matches_eager(rng):
    """add_nodes_chain (the live system's only graph builder) must equal
    the eager add_node/relative_pose/add_edge sequence field-for-field —
    both have_prev branches and a non-power-of-two count (padded bucket)."""
    import jax.numpy as jnp

    from noetic_slam_tpu.models import posegraph as pg
    from scipy.spatial.transform import Rotation

    for have_prev, count in [(False, 1), (False, 5), (True, 1), (True, 3),
                             (True, 5)]:
        qs = Rotation.random(count, random_state=rng.integers(1 << 30)
                             ).as_quat()[:, [3, 0, 1, 2]].astype(np.float32)
        ps = rng.normal(scale=3.0, size=(count, 3)).astype(np.float32)
        prev_q = Rotation.random(random_state=1).as_quat()[
            [3, 0, 1, 2]].astype(np.float32)
        prev_p = np.asarray([1.0, -2.0, 0.5], np.float32)

        eager = pg.init_graph(16, 16)
        chain = pg.init_graph(16, 16)
        last = None
        if have_prev:
            eager = pg.add_node(eager, jnp.asarray(prev_q),
                                jnp.asarray(prev_p))
            chain = pg.add_node(chain, jnp.asarray(prev_q),
                                jnp.asarray(prev_p))
            last = (prev_q, prev_p)
        for k in range(count):
            if last is not None:
                dq, dp = pg.relative_pose(
                    jnp.asarray(last[0]), jnp.asarray(last[1]),
                    jnp.asarray(qs[k]), jnp.asarray(ps[k]))
                eager = pg.add_edge(eager, eager.n_nodes - 1, eager.n_nodes,
                                    dq, dp)
            eager = pg.add_node(eager, jnp.asarray(qs[k]),
                                jnp.asarray(ps[k]))
            last = (qs[k], ps[k])
        chain = pg.add_nodes_chain(
            chain, qs, ps, count,
            prev_q=prev_q if have_prev else None,
            prev_p=prev_p if have_prev else None)

        for f in pg.PoseGraph._fields:
            a = np.asarray(getattr(chain, f))
            b = np.asarray(getattr(eager, f))
            msg = f"{f} (have_prev={have_prev}, count={count})"
            if a.dtype.kind in "fc":
                # batched quat math differs from the scalar path by ~1 ulp
                np.testing.assert_allclose(a, b, atol=1e-6, err_msg=msg)
            else:
                np.testing.assert_array_equal(a, b, err_msg=msg)


def test_add_nodes_chain_saturates_at_capacity():
    """Counter saturation (ADVICE r3): overflowing add_nodes_chain must
    clamp n_nodes/n_edges at capacity (matching add_node/add_edge), never
    advance them past it onto identity rows."""
    import jax.numpy as jnp

    from noetic_slam_tpu.models import posegraph as pg

    g = pg.init_graph(4, 4)
    qs = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (6, 1))
    ps = np.arange(18, dtype=np.float32).reshape(6, 3)
    g = pg.add_nodes_chain(g, qs, ps, 6)
    assert int(g.n_nodes) == 4
    assert int(g.n_edges) <= 4
    np.testing.assert_array_equal(np.asarray(g.node_p), ps[:4])
    # no phantom edges: every VALID edge references existing nodes only
    ev = np.asarray(g.edge_valid)
    assert np.all(np.asarray(g.edge_i)[ev] < 4)
    assert np.all(np.asarray(g.edge_j)[ev] < 4)


def test_detect_loop_candidate_np_parity(rng):
    """The host-numpy proximity rule (used by SlamSystem.maybe_close_loop)
    must select the same (cand, ok) as the jitted detect_loop_candidate on
    random stores — one definition, no silent drift (ADVICE r3)."""
    import jax.numpy as jnp

    from noetic_slam_tpu.models import posegraph as pg

    for trial in range(20):
        K = int(rng.integers(4, 24))
        kf_pos = rng.normal(scale=8.0, size=(K, 3)).astype(np.float32)
        kf_count = int(rng.integers(1, K + 1))
        kf_seq = np.zeros((K,), np.int32)
        order = rng.permutation(K)[:kf_count]
        kf_seq[order] = np.arange(1, kf_count + 1)
        cur = int(order[-1])
        radius = float(rng.uniform(1.0, 12.0))
        min_gap = int(rng.integers(1, 6))

        jb, jok = pg.detect_loop_candidate(
            jnp.asarray(kf_pos), jnp.int32(kf_count), jnp.int32(cur),
            radius, min_gap, kf_seq=jnp.asarray(kf_seq))
        nb, nok = pg.detect_loop_candidate_np(
            kf_pos, kf_seq, kf_count, cur, radius, min_gap)
        assert bool(jok) == nok, trial
        if nok:
            assert int(jb) == nb, trial
