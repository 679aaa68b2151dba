"""Pallas TPU kernel: TSDF block accumulation (the scatter replacement).

XLA:TPU scatter-add processes ~100M updates/s regardless of sorted/unique
hints (measured: 15.3 ms for the two 753k-update scatter-adds of one scan,
`scripts/profile_tsdf.py`), which made scatter the dominant cost of TSDF
integration. This kernel exploits the structure XLA cannot: after the
block-major sample sort (models/tsdf._integrate_samples), every touched
block's samples form ONE CONTIGUOUS RANGE of the sorted stream, and all
samples of a block land in its 512-voxel payload row.

Design:
- grid = one step per candidate block; the payload row per step comes from
  a scalar-prefetch array. TPU block shapes need >= 8 sublanes, so payload
  I/O moves in (8, 512) ROW GROUPS (rows[b] // 8) and the kernel edits row
  ``rows[b] % 8`` inside the group.
- per step, a `fori_loop` walks the block's 512-sample chunks: build a
  (512 samples x 512 voxels) one-hot from the intra-block voxel ids, mask
  to the block's [start, start+cnt) range, and contract (2, 512) @
  (512, 512) on the MXU — 512 scattered adds become one matmul.
- the clamped weighted-average renormalisation (models/tsdf.py) is folded
  into the row update: new_w = min(old_w + acc_w, max_weight), wsum
  rescaled by new_w / (old_w + acc_w). Idempotent on untouched rows (they
  are already clamped), so group writes are safe. Untouched payload GROUPS
  are never read or written (the old design renormalised all 268 MB/scan).

Ordering contract (hazard-freedom): callers pass candidate entries sorted
so that (a) padding entries (cnt = 0) come FIRST and carry the FIRST real
row index, and (b) real entries follow in ascending row order. Then equal
row-groups are always CONSECUTIVE grid steps, handled by a VMEM scratch
that carries the group across steps (the freshly-fetched input block of a
repeated index is stale by construction — pallas elides the refetch); a
group's last write is final, and no group is revisited after the pipeline
moves past it, so no read-after-write hazard against HBM exists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_CHUNK = 512
_GROUP = 8     # payload rows per I/O block (TPU min sublane tile)


def _accum_kernel(rows_ref, starts_ref, cnts_ref, ivox_ref, w_ref, wd_ref,
                  win_ref, wsin_ref, wout_ref, wsout_ref,
                  scr_w, scr_wd, *, max_weight: float):
    b = pl.program_id(0)
    row = rows_ref[b]
    start = starts_ref[b]
    cnt = cnts_ref[b]
    g = row % _GROUP
    prev_row = rows_ref[jnp.maximum(b - 1, 0)]
    new_group = (b == 0) | (prev_row // _GROUP != row // _GROUP)

    # Fresh group: seed the scratch from the (freshly fetched) input block.
    @pl.when(new_group)
    def _():
        scr_w[...] = win_ref[...]
        scr_wd[...] = wsin_ref[...]

    c0 = start // _CHUNK
    c1 = (start + cnt + _CHUNK - 1) // _CHUNK

    iota_vox = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    def body(k, acc):
        iv = ivox_ref[k, :].reshape(_CHUNK, 1)
        flat = k * _CHUNK + iota_s
        m = (flat >= start) & (flat < start + cnt)
        oh = ((iv == iota_vox) & m).astype(jnp.float32)     # (samples, vox)
        u = jnp.concatenate(
            [w_ref[k, :].reshape(1, _CHUNK),
             wd_ref[k, :].reshape(1, _CHUNK)], axis=0)      # (2, samples)
        # Full f32 precision: default bf16 input truncation would perturb
        # the accumulated weights by ~0.2% (measured vs the XLA path).
        return acc + jax.lax.dot_general(
            u, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (2, vox)

    acc = jax.lax.fori_loop(c0, c1, body,
                            jnp.zeros((2, _CHUNK), jnp.float32))

    # Update row g of the group; clamp-renormalise (idempotent elsewhere).
    mask = (jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0)
            == g).astype(jnp.float32)
    new_w = scr_w[...] + mask * acc[0:1]
    if max_weight >= 1e29:
        # Unclamped (archive-volume) mode: pure sum, no renorm — the
        # renorm's 1e-12 guard divides tiny NEGATIVE residuals left by
        # signed exact cancellation into huge factors (models/tsdf.NO_CLAMP
        # rationale). Static branch: max_weight is a compile-time constant.
        scr_wd[...] = scr_wd[...] + mask * acc[1:2]
        scr_w[...] = new_w
    else:
        clamped = jnp.minimum(new_w, max_weight)
        scale = clamped / jnp.maximum(new_w, 1e-12)
        scr_wd[...] = (scr_wd[...] + mask * acc[1:2]) * scale
        scr_w[...] = clamped
    wout_ref[...] = scr_w[...]
    wsout_ref[...] = scr_wd[...]


def _logodds_kernel(rows_ref, starts_ref, cnts_ref, ivox_ref, dl_ref,
                    lin_ref, lout_ref, scr_l, *, l_min: float, l_max: float):
    """Occupancy variant of _accum_kernel: single-channel additive payload
    (log-odds deltas) with a two-sided clamp folded into the row write.
    Same grid decomposition, ordering contract, and row-group scratch
    carry; the clamp is idempotent on untouched rows (they are already
    inside [l_min, l_max]), so group-granular writes are safe."""
    b = pl.program_id(0)
    row = rows_ref[b]
    start = starts_ref[b]
    cnt = cnts_ref[b]
    g = row % _GROUP
    prev_row = rows_ref[jnp.maximum(b - 1, 0)]
    new_group = (b == 0) | (prev_row // _GROUP != row // _GROUP)

    @pl.when(new_group)
    def _():
        scr_l[...] = lin_ref[...]

    c0 = start // _CHUNK
    c1 = (start + cnt + _CHUNK - 1) // _CHUNK

    iota_vox = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    def body(k, acc):
        iv = ivox_ref[k, :].reshape(_CHUNK, 1)
        flat = k * _CHUNK + iota_s
        m = (flat >= start) & (flat < start + cnt)
        oh = ((iv == iota_vox) & m).astype(jnp.float32)
        u = dl_ref[k, :].reshape(1, _CHUNK)
        return acc + jax.lax.dot_general(
            u, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (1, vox)

    acc = jax.lax.fori_loop(c0, c1, body,
                            jnp.zeros((1, _CHUNK), jnp.float32))

    mask = (jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0)
            == g).astype(jnp.float32)
    scr_l[...] = jnp.clip(scr_l[...] + mask * acc[0:1], l_min, l_max)
    lout_ref[...] = scr_l[...]


@partial(jax.jit, static_argnames=("l_min", "l_max", "interpret"))
def logodds_accumulate(logodds: Array, rows: Array, starts: Array,
                       cnts: Array, ivox: Array, delta: Array,
                       l_min: float, l_max: float, *,
                       interpret: bool = False):
    """Accumulate sorted block-major log-odds deltas + two-sided clamp.

    Occupancy-backend counterpart of ``block_accumulate``: same sorted
    sample stream / candidate-entry ordering contract (padding entries
    first carrying the first real row, real entries in ascending row
    order), single (C, 512) payload updated as
    clip(logodds + Σ delta, l_min, l_max) on the listed rows' groups.
    """
    C, V = logodds.shape
    assert V == _CHUNK and ivox.shape[0] % _CHUNK == 0
    assert C % _GROUP == 0
    nc = ivox.shape[0] // _CHUNK
    A = rows.shape[0]

    lg = logodds.reshape(C // _GROUP, _GROUP, V)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((nc, _CHUNK), lambda b, r, s, c: (0, 0)),  # ivox
            pl.BlockSpec((nc, _CHUNK), lambda b, r, s, c: (0, 0)),  # delta
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _GROUP, V), jnp.float32),
        ],
    )
    (out_l,) = pl.pallas_call(
        partial(_logodds_kernel, l_min=l_min, l_max=l_max),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C // _GROUP, _GROUP, V),
                                        jnp.float32)],
        input_output_aliases={5: 0},                 # logodds -> out0
        interpret=interpret,
    )(rows, starts, cnts,
      ivox.reshape(nc, _CHUNK), delta.reshape(nc, _CHUNK), lg)
    return out_l.reshape(C, V)


@partial(jax.jit,
         static_argnames=("max_weight", "interpret"))
def block_accumulate(weight: Array, wsum: Array, rows: Array, starts: Array,
                     cnts: Array, ivox: Array, w: Array, wd: Array,
                     max_weight: float, *, interpret: bool = False):
    """Accumulate sorted block-major samples into payload rows + clamp.

    weight/wsum: (C, V) payload (V = 512, C multiple of 8). rows/starts/
    cnts: (A,) int32 per candidate block — payload row, offset into the
    sorted sample stream, and sample count. ORDERING CONTRACT (see module
    docstring): padding entries (cnt = 0, row = first real row) first, real
    entries in ascending row order, rows unique among real entries.
    ivox/w/wd: (S,) sorted streams (S multiple of 512); ivox in [0, V).
    Returns (weight', wsum') with ONLY the listed rows' groups updated
    (renormalised: weight clamped at max_weight, wsum rescaled).
    """
    C, V = weight.shape
    assert V == _CHUNK and ivox.shape[0] % _CHUNK == 0
    assert C % _GROUP == 0
    nc = ivox.shape[0] // _CHUNK
    A = rows.shape[0]

    wg = weight.reshape(C // _GROUP, _GROUP, V)
    wsg = wsum.reshape(C // _GROUP, _GROUP, V)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((nc, _CHUNK), lambda b, r, s, c: (0, 0)),  # ivox
            pl.BlockSpec((nc, _CHUNK), lambda b, r, s, c: (0, 0)),  # w
            pl.BlockSpec((nc, _CHUNK), lambda b, r, s, c: (0, 0)),  # wd
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
            pl.BlockSpec((1, _GROUP, V),
                         lambda b, r, s, c: (r[b] // _GROUP, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _GROUP, V), jnp.float32),
            pltpu.VMEM((1, _GROUP, V), jnp.float32),
        ],
    )
    out_w, out_ws = pl.pallas_call(
        partial(_accum_kernel, max_weight=max_weight),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C // _GROUP, _GROUP, V),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((C // _GROUP, _GROUP, V),
                                        jnp.float32)],
        input_output_aliases={6: 0, 7: 1},   # weight -> out0, wsum -> out1
        interpret=interpret,
    )(rows, starts, cnts,
      ivox.reshape(nc, _CHUNK), w.reshape(nc, _CHUNK),
      wd.reshape(nc, _CHUNK), wg, wsg)
    return out_w.reshape(C, V), out_ws.reshape(C, V)
