"""Pallas TPU kernel: fused brute-force 1-NN with bounding-box tile pruning.

The XLA version (ops/neighbors.nn1) materializes each (Cq, Ct) distance
tile to HBM between the matmul and the argmin — at 8k x 64k that is ~2 GB
of HBM traffic per pass and dominates the runtime. This kernel keeps the
distance tile in VMEM: for each query tile it loops over target tiles,
computes the recentered expansion

    d^2 = |q|^2 - 2 q.t^T + |t|^2

with an MXU dot (full f32 precision), reduces to a per-query (min, argmin)
in registers, and only the (Cq,) winners ever leave the core.

Tile pruning (the branch-and-bound the reference gets from its kd-tree,
nanoflann.h, re-expressed at tile granularity): per target tile an axis-
aligned bounding box is precomputed; a tile is visited only when the
box-to-box lower-bound distance against the current query tile beats the
*worst current best* in the query tile. Pruning is exact — the lower bound
holds for every (q, t) pair in the pair of boxes. With spatially ordered
clouds (Morton order, ops.pointcloud.morton30) boxes are compact and the
visit count collapses from all tiles to the few overlapping the
correspondence radius.

``max_dist`` (optional, traced) caps the search radius: best distances
initialize at max_dist^2, so every tile farther than max_dist is skipped
outright. Queries with no neighbor inside the cap return (idx 0, sqd >=
max_dist^2) — GICP passes its correspondence-distance threshold here and
discards such pairs anyway (nano_gicp.cc:225-230 radius test).

Returns squared distances recomputed exactly (cancellation-free) at the
winning indices, like the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_FAR = 1e9   # box coordinate for empty tiles (never finite-overlapped)


def _nn_kernel(cnt_ref, cap_ref, tmin_ref, tmax_ref, q_ref, t_ref, qq_ref,
               tt_ref, idx_ref, d_ref, *, q_tile: int, t_tile: int):
    """Single invocation: double loop over (query tiles, target tiles); the
    distance tile lives in registers/VMEM only. cnt_ref (SMEM) bounds the
    target loop so padded capacity costs nothing; tmin/tmax (SMEM) carry the
    per-target-tile boxes for the lower-bound prune."""
    nq = q_ref.shape[0]
    nt = t_ref.shape[0]
    n_t_tiles = pl.cdiv(jnp.minimum(cnt_ref[0], nt), t_tile)
    cap2 = cap_ref[0]

    def q_body(qi, _):
        q = q_ref[pl.ds(qi * q_tile, q_tile), :]          # (QT, 3)
        qq = qq_ref[pl.ds(qi * q_tile, q_tile), :]        # (QT, 1)

        # Query-tile bounding box over well-conditioned rows only: sentinel
        # (padded) queries would blow the box up and disable pruning; they
        # are instead handled by the cap (their best stays cap2, and with a
        # finite cap every tile prunes against them).
        ok = ((jnp.abs(q[:, 0]) < 1e5) & (jnp.abs(q[:, 1]) < 1e5)
              & (jnp.abs(q[:, 2]) < 1e5))
        qxmin = jnp.min(jnp.where(ok, q[:, 0], _FAR))
        qymin = jnp.min(jnp.where(ok, q[:, 1], _FAR))
        qzmin = jnp.min(jnp.where(ok, q[:, 2], _FAR))
        qxmax = jnp.max(jnp.where(ok, q[:, 0], -_FAR))
        qymax = jnp.max(jnp.where(ok, q[:, 1], -_FAR))
        qzmax = jnp.max(jnp.where(ok, q[:, 2], -_FAR))

        def t_body(ti, carry):
            _best_d, _best_i, worst = carry
            lbx = jnp.maximum(
                jnp.maximum(tmin_ref[ti, 0] - qxmax, qxmin - tmax_ref[ti, 0]),
                0.0)
            lby = jnp.maximum(
                jnp.maximum(tmin_ref[ti, 1] - qymax, qymin - tmax_ref[ti, 1]),
                0.0)
            lbz = jnp.maximum(
                jnp.maximum(tmin_ref[ti, 2] - qzmax, qzmin - tmax_ref[ti, 2]),
                0.0)
            lb2 = lbx * lbx + lby * lby + lbz * lbz

            def visit(c):
                best_d, best_i, _ = c
                t0 = ti * t_tile
                t = t_ref[pl.ds(t0, t_tile), :]           # (TT, 3)
                cross = jax.lax.dot_general(
                    q, t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (QT, TT)
                d = qq - 2.0 * cross + tt_ref[0, pl.ds(t0, t_tile)][None, :]
                a = jnp.argmin(d, axis=1)
                dmin = jnp.min(d, axis=1)
                better = dmin < best_d
                bd = jnp.where(better, dmin, best_d)
                bi = jnp.where(better, t0 + a.astype(jnp.int32), best_i)
                return (bd, bi, jnp.max(bd))

            return jax.lax.cond(lb2 < worst, visit, lambda c: c, carry)

        init = (jnp.full((q_tile,), cap2, jnp.float32),
                jnp.zeros((q_tile,), jnp.int32), cap2)
        best_d, best_i, _ = jax.lax.fori_loop(0, n_t_tiles, t_body, init)
        idx_ref[qi, :] = best_i
        d_ref[qi, :] = best_d
        return 0

    jax.lax.fori_loop(0, nq // q_tile, q_body, 0)


@partial(jax.jit, static_argnames=("q_tile", "t_tile"))
def nn1_fused(query: Array, target: Array, t_count: Array | None = None,
              max_dist: Array | float | None = None,
              *, q_tile: int = 256, t_tile: int = 512):
    """Fused 1-NN: (idx (Nq,) int32, sqd (Nq,) f32). Shapes must be
    multiples of the tile sizes (callers use power-of-two capacities).
    ``t_count``: number of meaningful target rows (compacted-front
    convention); padding rows beyond it are never visited. ``max_dist``
    (may be traced) caps the search radius — queries without a neighbor
    inside it return sqd >= max_dist^2 (see module docstring)."""
    nq, nt = query.shape[0], target.shape[0]
    assert nq % q_tile == 0 and nt % t_tile == 0
    if t_count is None:
        t_count = jnp.int32(nt)
    cnt = jnp.asarray(t_count, jnp.int32).reshape(1)
    cap2 = (jnp.full((1,), jnp.inf, jnp.float32) if max_dist is None
            else jnp.square(jnp.asarray(max_dist, jnp.float32)).reshape(1))

    # Recenter like ops.neighbors: conditioning for f32 world coordinates.
    w = jnp.all(jnp.abs(query) < 1e5, axis=-1)
    c = (jnp.sum(query * w[:, None].astype(query.dtype), axis=0)
         / jnp.maximum(w.sum().astype(query.dtype), 1.0))
    qc = query - c
    tc = target - c
    qq = jnp.sum(qc * qc, axis=-1, keepdims=True)
    tt = jnp.sum(tc * tc, axis=-1)[None, :]

    # Per-target-tile axis-aligned boxes over rows that are in range and
    # well-conditioned; empty tiles get an inverted far box (always pruned).
    tok = (jnp.all(jnp.abs(tc) < 1e5, axis=-1)
           & (jnp.arange(nt) < cnt[0]))[:, None]
    tmin = jnp.min(jnp.where(tok, tc, _FAR).reshape(nt // t_tile, t_tile, 3),
                   axis=1)
    tmax = jnp.max(jnp.where(tok, tc, -_FAR).reshape(nt // t_tile, t_tile, 3),
                   axis=1)

    idx, d = pl.pallas_call(
        partial(_nn_kernel, q_tile=q_tile, t_tile=t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq // q_tile, q_tile), jnp.int32),
            jax.ShapeDtypeStruct((nq // q_tile, q_tile), jnp.float32),
        ],
    )(cnt, cap2, tmin, tmax, qc, tc, qq, tt)
    idx = idx.reshape(nq)
    d = d.reshape(nq)

    # Exact distances at the winners (no cancellation). Not-found winners
    # (idx 0 under a cap) keep their >= cap^2 kernel distance so radius
    # tests downstream reject them even if point 0 happens to be closer.
    diff = query - target[idx]
    exact = jnp.sum(diff * diff, axis=-1)
    sqd = jnp.where(jnp.isfinite(cap2[0]) & (d >= cap2[0]), d, exact)
    return idx, sqd
