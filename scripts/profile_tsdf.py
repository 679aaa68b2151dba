"""Per-stage device profiling of TSDF integrate at production shapes.

Same honest-timing discipline as profile_stages.py: chained scalar carry,
slope between short/long windows. Run on the real chip.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from noetic_slam_tpu.config.params import TsdfConfig
from noetic_slam_tpu.models import tsdf as T
from noetic_slam_tpu.runtime.profiling import slope_timer

N = 32768


def chain_time(name, f, n1=3, n2=9, *args):
    """f(c, *args): big operands passed as args (NOT closure constants —
    captured arrays ride the compile request through the relay, HTTP 413)."""
    f = jax.jit(f)

    def run_window(k):
        y = jnp.float32(0.0)
        for i in range(k):
            y = f(y + np.float32(i) * np.float32(1e-6), *args)
        return float(y)

    sec = slope_timer(run_window, n1=n1, n2=int(os.environ.get("N_LONG", n2)))
    print(f"{name:<38} {sec * 1e3:9.3f} ms")
    return sec


def main():
    print(f"backend={jax.default_backend()}")
    cfg = TsdfConfig()
    rng = np.random.default_rng(0)
    # surface-like scene at realistic ranges
    ang = rng.uniform(0, 2 * np.pi, N)
    r = 8.0 + rng.normal(scale=0.05, size=N)
    z = rng.uniform(-1, 3, N)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang), z], -1).astype(np.float32)
    points = jnp.asarray(pts)
    valid = jnp.ones((N,), bool)
    origin = jnp.zeros(3)

    # warm state: integrate a few scans so the directory is populated
    st = T.init_tsdf(cfg)
    for i in range(3):
        st = T.integrate(cfg, st, points + np.float32(0.01 * i), valid, origin)
    st = jax.device_get(st)
    st = jax.tree.map(jnp.asarray, st)
    print("num_blocks:", int(st.num_blocks))

    pos, sdf, w = T._ray_samples(cfg, points, valid, origin)
    S = pos.shape[0]
    print("samples:", S)

    stages = os.environ.get("STAGES", "").split(",") if os.environ.get("STAGES") else None

    def want(s):
        return stages is None or s in stages

    if want("rays"):
        def f_rays(c):
            p, s_, w_ = T._ray_samples(cfg, points + c * 1e-5, valid, origin)
            return c + jnp.sum(p[0]) * 1e-9 + jnp.sum(w_) * 1e-12
        chain_time("ray_samples", f_rays)

    if want("sort"):
        def f_sort(c):
            p = pos + c * 1e-5
            vx = jnp.floor(p / cfg.voxel_size).astype(jnp.int32)
            b = vx >> 3
            intra = vx - (b << 3)
            gk = T._block_key(b)
            iv = intra[:, 0] + (intra[:, 1] << 3) + (intra[:, 2] << 6)
            gk_s, iv_s, w_s, ws_s = jax.lax.sort(
                (gk, iv, w, w * sdf), num_keys=2)
            return c + gk_s[0] * 1e-12 + w_s[0] * 1e-9 + ws_s[-1] * 1e-9 + iv_s[0] * 1e-12
        chain_time("payload sort 753k (2 keys + 2 vals)", f_sort)

    if want("sort1"):
        def f_sort1(c):
            p = pos + c * 1e-5
            vx = jnp.floor(p / cfg.voxel_size).astype(jnp.int32)
            gk = T._block_key(vx >> 3)
            gk_s = jax.lax.sort(gk)
            return c + gk_s[0] * 1e-12 + gk_s[-1] * 1e-12
        chain_time("key-only sort 753k", f_sort1)

    wsum = st.wsum.reshape(-1)
    weight = st.weight.reshape(-1)
    total = wsum.shape[0]

    if want("scatter"):
        addr0 = jnp.asarray(
            rng.integers(0, int(st.num_blocks) * 512, S), jnp.int32)

        def f_scatter(c, wsum, weight, addr0, w):
            a = (addr0 + ((c * 1e6).astype(jnp.int32) % 7)) % total
            wf = wsum.at[a].add(w, mode="drop")
            gf = weight.at[a].add(w, mode="drop")
            return c + wf[0] * 1e-9 + gf[0] * 1e-9
        chain_time("2x scatter-add 753k -> 33.5M", f_scatter, 3, 9,
                   wsum, weight, addr0, w)

    if want("scatter_sorted"):
        addr1 = jnp.sort(jnp.asarray(
            rng.integers(0, int(st.num_blocks) * 512, S), jnp.int32))

        def f_scat2(c, wsum, weight, addr1, w):
            a = addr1 + ((c * 1e6).astype(jnp.int32) % 7)
            wf = wsum.at[a].add(w, mode="drop")
            gf = weight.at[a].add(w, mode="drop")
            return c + wf[0] * 1e-9 + gf[0] * 1e-9
        chain_time("2x scatter-add sorted addrs", f_scat2, 3, 9,
                   wsum, weight, addr1, w)

    if want("scatter_uniq"):
        # sorted + unique updates (padding gets distinct OOB addrs)
        base = jnp.sort(jnp.asarray(
            rng.choice(int(st.num_blocks) * 512, S // 4, replace=False),
            jnp.int32))
        addr2 = jnp.concatenate(
            [base, total + jnp.arange(S - S // 4, dtype=jnp.int32)])

        def f_scat3(c, wsum, weight, addr2, w):
            a = addr2 + ((c * 1e6).astype(jnp.int32) % 2)
            wf = wsum.at[a].add(w, mode="drop", indices_are_sorted=True,
                                unique_indices=True)
            gf = weight.at[a].add(w, mode="drop", indices_are_sorted=True,
                                  unique_indices=True)
            return c + wf[0] * 1e-9 + gf[0] * 1e-9
        chain_time("2x scatter-add sorted+unique", f_scat3, 3, 9,
                   wsum, weight, addr2, w)

    if want("scatter_rows"):
        # one scatter of (S, 2) rows into an interleaved (total, 2) payload
        pay2 = jnp.stack([wsum, weight], axis=-1)
        base = jnp.sort(jnp.asarray(
            rng.choice(int(st.num_blocks) * 512, S // 4, replace=False),
            jnp.int32))
        addr3 = jnp.concatenate(
            [base, total + jnp.arange(S - S // 4, dtype=jnp.int32)])
        upd = jnp.stack([w, w * 0.5], axis=-1)

        def f_scat4(c, pay2, addr3, upd):
            a = addr3 + ((c * 1e6).astype(jnp.int32) % 2)
            p = pay2.at[a].add(upd, mode="drop", indices_are_sorted=True,
                               unique_indices=True)
            return c + p[0, 0] * 1e-9 + p[0, 1] * 1e-9
        chain_time("1x row scatter-add (S,2) sorted+uniq", f_scat4, 3, 9,
                   pay2, addr3, upd)

    if want("segsum"):
        gk0 = jnp.sort(jnp.asarray(
            rng.integers(0, 1 << 30, S), jnp.int32))

        def f_seg(c, gk0, w):
            gk2 = gk0 + ((c * 1e6).astype(jnp.int32) % 2)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), gk2[1:] != gk2[:-1]])
            cw = jnp.cumsum(w)
            cwd = jnp.cumsum(w * 0.5)
            # per-run sums read at run starts: sum = cum[next_start-1]-cum[start-1]
            rank = jnp.cumsum(first.astype(jnp.int32)) - 1
            start_of = jnp.searchsorted(rank, jnp.arange(1, S + 1) - 0,
                                        side="left")
            return c + cw[-1] * 1e-9 + cwd[-1] * 1e-9 + rank[-1] * 1e-12 + start_of[0] * 1e-12
        chain_time("segsum machinery (2 cumsum + searchsorted)", f_seg, 3, 9,
                   gk0, w)

    if want("compact"):
        gk0 = jnp.sort(jnp.asarray(
            rng.integers(0, 1 << 20, S), jnp.int32))
        A = cfg.scan_block_cap

        def f_cmp(c, gk0):
            gk2 = gk0 + ((c * 1e6).astype(jnp.int32) % 2)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), gk2[1:] != gk2[:-1]])
            rank = jnp.cumsum(first.astype(jnp.int32)) - 1
            pos = jnp.searchsorted(rank, jnp.arange(A), side="left")
            cand = jnp.where(pos < S, gk2[jnp.clip(pos, 0, S - 1)],
                             T._KEY_PAD)
            return c + cand[0] * 1e-12 + cand[-1] * 1e-12
        chain_time("cand via searchsorted compaction", f_cmp, 3, 9, gk0)

    if want("scatter_set_cand"):
        gk0 = jnp.sort(jnp.asarray(
            rng.integers(0, 1 << 20, S), jnp.int32))
        A = cfg.scan_block_cap

        def f_set(c, gk0):
            gk2 = gk0 + ((c * 1e6).astype(jnp.int32) % 2)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), gk2[1:] != gk2[:-1]])
            rank = jnp.cumsum(first.astype(jnp.int32)) - 1
            cand_idx = jnp.where(first & (rank < A), rank, A)
            cand = jnp.full((A,), T._KEY_PAD, jnp.int32).at[cand_idx].set(
                gk2, mode="drop")
            return c + cand[0] * 1e-12 + cand[-1] * 1e-12
        chain_time("cand via scatter-set (current)", f_set, 3, 9, gk0)

    if want("kernel"):
        # Pallas block-accumulate alone, with realistic rows/starts/cnts.
        from noetic_slam_tpu.ops.pallas.tsdf_kernel import block_accumulate

        A = cfg.scan_block_cap
        nb = int(st.num_blocks)
        S512 = (S + 511) // 512 * 512
        # contiguous ranges over ~nb blocks, padding first
        n_real = min(nb, A)
        bounds = np.linspace(0, S, n_real + 1).astype(np.int32)
        rows_r = np.sort(rng.choice(int(st.num_blocks), n_real,
                                    replace=False)).astype(np.int32)
        rows = np.concatenate([np.full(A - n_real, rows_r[0], np.int32),
                               rows_r])
        starts = np.concatenate([np.zeros(A - n_real, np.int32),
                                 bounds[:-1]])
        cnts = np.concatenate([np.zeros(A - n_real, np.int32),
                               np.diff(bounds)])
        iv_p = jnp.asarray(rng.integers(0, 512, S512), jnp.int32)
        w_p = jnp.asarray(rng.random(S512), jnp.float32)
        ws_p = jnp.asarray(rng.random(S512), jnp.float32)
        rows, starts, cnts = map(jnp.asarray, (rows, starts, cnts))
        wsum2 = st.wsum
        weight2 = st.weight

        def f_kernel(c, weight2, wsum2, rows, starts, cnts, iv_p, w_p, ws_p):
            w2, ws2 = block_accumulate(
                weight2, wsum2, rows, starts, cnts, iv_p,
                w_p + c * 1e-9, ws_p, cfg.max_weight)
            return c + w2[0, 0] * 1e-9 + ws2[0, 0] * 1e-9
        sec = chain_time(f"block_accumulate A={A} real={n_real}", f_kernel,
                         3, 9,
                         weight2, wsum2, rows, starts, cnts, iv_p, w_p, ws_p)
        # Bytes basis: touched payload rows (read+write of both (512,) f32
        # arrays per row group, (8,512) groups in the kernel) + the sample
        # stream read (3 f32 streams). Row groups of 8 -> each real row
        # drags its 8-row group through HBM.
        from noetic_slam_tpu.runtime.profiling import roofline_report

        groups = len(set(int(r) // 8 for r in np.asarray(rows)))
        kern_bytes = (groups * 8 * 512 * 4 * 2 * 2     # payload r+w
                      + int(iv_p.shape[0]) * 3 * 4)    # sample stream
        print(roofline_report("  roofline (touched rows + stream)", sec,
                              bytes_moved=kern_bytes))

    if want("prepass"):
        def f_pre(c, st_):
            # everything in _integrate_samples up to the kernel call:
            # approximate by running with use_kernel=False minus scatters is
            # hard; instead run the two sorts + join pieces directly.
            p = pos + c * 1e-5
            vx = jnp.floor(p / cfg.voxel_size).astype(jnp.int32)
            b = vx >> 3
            intra = vx - (b << 3)
            gk = T._block_key(b)
            gk = jnp.where(w > 0.0, gk, T._KEY_PAD)
            iv = intra[:, 0] + (intra[:, 1] << 3) + (intra[:, 2] << 6)
            gk_s, iv_s, w_s, ws_s = jax.lax.sort(
                (gk, iv, w, w * sdf), num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), gk_s[1:] != gk_s[:-1]]) & (gk_s != T._KEY_PAD)
            rank = jnp.cumsum(first.astype(jnp.int32)) - 1
            Sn = gk_s.shape[0]
            pos_key = jnp.where(first, rank, jnp.int32(Sn))
            _, pos_sorted = jax.lax.sort(
                (pos_key, jnp.arange(Sn, dtype=jnp.int32)), num_keys=1)
            A = cfg.scan_block_cap
            cand_pos = pos_sorted[:A]
            cand = jnp.where(cand_pos < Sn,
                             gk_s[jnp.clip(cand_pos, 0, Sn - 1)], T._KEY_PAD)
            slot = T._lookup_join(st_.dir_keys, st_.dir_slots, cand)
            return (c + slot[0] * 1e-12 + iv_s[0] * 1e-12 + w_s[0] * 1e-9
                    + ws_s[-1] * 1e-9 + cand[0] * 1e-12)
        chain_time("pre-pass (2 sorts + join)", f_pre, 3, 9, st)

    if want("renorm"):
        def f_renorm(c, wsum, weight):
            wf = weight + c * 1e-9
            cl = jnp.minimum(wf, cfg.max_weight)
            ws2 = wsum * (cl / jnp.maximum(wf, 1e-12))
            # FULL reductions as consumers: a sliced consumer (ws2[0]) lets
            # XLA dead-code-eliminate the array-wide work and the timing
            # reads as >100% of HBM peak. With reduction consumers XLA
            # fuses renorm+sum into one streaming pass: traffic = READ of
            # both payload arrays, no materialized writes.
            return c + jnp.sum(ws2) * 1e-12 + jnp.sum(cl) * 1e-12
        sec = chain_time("renorm full payload (268MB)", f_renorm, 3, 9,
                         wsum, weight)
        from noetic_slam_tpu.runtime.profiling import roofline_report

        print(roofline_report("  roofline (2x payload read)", sec,
                              bytes_moved=2 * total * 4))

    if want("full"):
        def f_full(c, st_):
            st2 = T.integrate(cfg, st_, points + c * 1e-5, valid, origin)
            return (c + st2.num_blocks.astype(jnp.float32) * 1e-9
                    + st2.wsum[0, 0] * 1e-9)
        sec = chain_time("integrate full", f_full, 3, 9, st)
        from noetic_slam_tpu.runtime.profiling import roofline_report

        # LOWER-bound traffic: one read + one write of the 4-stream sample
        # payload (the sort alone does several passes) + touched payload
        # rows (~num_blocks groups). Real traffic is higher, so the printed
        # % of HBM peak is a floor on achieved utilization.
        full_bytes = (2 * S * 16
                      + int(st.num_blocks) * 512 * 4 * 2 * 2)
        print(roofline_report("  roofline (lower-bound traffic)", sec,
                              bytes_moved=full_bytes))


if __name__ == "__main__":
    main()
