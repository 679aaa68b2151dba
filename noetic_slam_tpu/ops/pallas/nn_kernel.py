"""Pallas TPU kernel: fused brute-force 1-NN (distance + running argmin).

The XLA version (ops/neighbors.nn1) materializes each (Cq, Ct) distance
tile to HBM between the matmul and the argmin — at 8k x 64k that is ~2 GB
of HBM traffic per pass and dominates the runtime. This kernel keeps the
distance tile in VMEM: for each query tile it loops over target tiles,
computes the recentered expansion

    d^2 = |q|^2 - 2 q.t^T + |t|^2

with an MXU dot (full f32 precision), reduces to a per-query (min, argmin)
in registers, and only the (Cq,) winners ever leave the core. The whole
target cloud is staged in VMEM once per query tile (<= ~3 MB for 256k
points).

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


def _nn_kernel(cnt_ref, q_ref, t_ref, qq_ref, tt_ref, idx_ref, d_ref, *,
               q_tile: int, t_tile: int):
    """Single invocation: double loop over (query tiles, target tiles); the
    distance tile lives in registers/VMEM only. cnt_ref (SMEM) bounds the
    target loop so padded capacity costs nothing."""
    nq = q_ref.shape[0]
    nt = t_ref.shape[0]
    n_t_tiles = pl.cdiv(jnp.minimum(cnt_ref[0], nt), t_tile)

    def q_body(qi, _):
        q = q_ref[pl.ds(qi * q_tile, q_tile), :]          # (QT, 3)
        qq = qq_ref[pl.ds(qi * q_tile, q_tile), :]        # (QT, 1)

        def t_body(ti, carry):
            best_d, best_i = carry
            t0 = ti * t_tile
            t = t_ref[pl.ds(t0, t_tile), :]               # (TT, 3)
            cross = jax.lax.dot_general(
                q, t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (QT, TT)
            d = qq - 2.0 * cross + tt_ref[0, pl.ds(t0, t_tile)][None, :]
            a = jnp.argmin(d, axis=1)
            dmin = jnp.min(d, axis=1)
            better = dmin < best_d
            return (jnp.where(better, dmin, best_d),
                    jnp.where(better, t0 + a.astype(jnp.int32), best_i))

        init = (jnp.full((q_tile,), jnp.inf, jnp.float32),
                jnp.zeros((q_tile,), jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, n_t_tiles, t_body, init)
        idx_ref[qi, :] = best_i
        d_ref[qi, :] = best_d
        return 0

    jax.lax.fori_loop(0, nq // q_tile, q_body, 0)


@partial(jax.jit, static_argnames=("q_tile", "t_tile"))
def nn1_fused(query: Array, target: Array, t_count: Array | None = None,
              *, q_tile: int = 256, t_tile: int = 512):
    """Fused 1-NN: (idx (Nq,) int32, sqd (Nq,) f32). Shapes must be
    multiples of the tile sizes (callers use power-of-two capacities).
    ``t_count``: number of meaningful target rows (compacted-front
    convention); padding rows beyond it are never visited."""
    nq, nt = query.shape[0], target.shape[0]
    assert nq % q_tile == 0 and nt % t_tile == 0
    if t_count is None:
        t_count = jnp.int32(nt)
    cnt = jnp.asarray(t_count, jnp.int32).reshape(1)

    # Recenter like ops.neighbors: conditioning for f32 world coordinates.
    w = jnp.all(jnp.abs(query) < 1e5, axis=-1)
    c = (jnp.sum(query * w[:, None].astype(query.dtype), axis=0)
         / jnp.maximum(w.sum().astype(query.dtype), 1.0))
    qc = query - c
    tc = target - c
    qq = jnp.sum(qc * qc, axis=-1, keepdims=True)
    tt = jnp.sum(tc * tc, axis=-1)[None, :]

    idx, d = pl.pallas_call(
        partial(_nn_kernel, q_tile=q_tile, t_tile=t_tile),
        in_specs=[
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
    )(cnt, qc, tc, qq, tt)
    idx = idx.reshape(nq)
    d = d.reshape(nq)

    # Exact distances at the winners (no cancellation).
    diff = query - target[idx]
    sqd = jnp.sum(diff * diff, axis=-1)
    return idx, sqd
