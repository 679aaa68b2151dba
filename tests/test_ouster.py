"""Ouster ingest layer tests: metadata parse (against the reference's
firmware fixture files read as data), synthetic packet building/batching,
projection geometry."""

import glob
import os

import numpy as np
import pytest

from noetic_slam_tpu.io import ouster as ou

FIXDIR = "/root/reference/src/ouster/ouster-sdk/tests/metadata"


def _simple_info(h=4, w=32, profile=ou.PROFILE_SINGLE):
    return ou.SensorInfo(
        pixels_per_column=h, columns_per_frame=w, columns_per_packet=8,
        pixel_shift_by_row=np.zeros(h, int),
        beam_azimuth_angles=np.zeros(h),
        beam_altitude_angles=np.linspace(-10, 10, h),
        beam_to_lidar=np.eye(4), lidar_to_sensor=np.eye(4),
        udp_profile_lidar=profile)


def _build_packet(pf: ou.PacketFormat, frame_id, m_ids, ts, rngs):
    """Synthesize one RNG19 single-return packet (parsing.cpp layout)."""
    assert not pf.legacy
    buf = bytearray(pf.lidar_packet_size)
    buf[2:4] = int(frame_id).to_bytes(2, "little")
    for c in range(pf.cols):
        base = pf.packet_header_size + c * pf.col_size
        buf[base:base + 8] = int(ts[c]).to_bytes(8, "little")
        buf[base + 8:base + 10] = int(m_ids[c]).to_bytes(2, "little")
        buf[base + 10:base + 12] = (1).to_bytes(2, "little")  # status valid
        for u in range(pf.h):
            px = base + pf.col_header_size + u * pf.chan
            word = int(rngs[u, c]) & 0x0007FFFF
            buf[px:px + 4] = word.to_bytes(4, "little")
            buf[px + 4] = (u * 7) % 255            # reflectivity
            buf[px + 6:px + 8] = (u * 100 % 65535).to_bytes(2, "little")
    return bytes(buf)


@pytest.mark.skipif(not os.path.isdir(FIXDIR),
                    reason="reference metadata fixtures unavailable")
def test_metadata_fixture_parse():
    n_parsed = 0
    for path in sorted(glob.glob(os.path.join(FIXDIR, "*.json")))[:10]:
        info = ou.SensorInfo.from_json(open(path).read())
        assert info.pixels_per_column in (16, 32, 64, 128)
        assert info.columns_per_frame in (512, 1024, 2048, 4096)
        assert len(info.beam_altitude_angles) == info.pixels_per_column
        assert len(info.pixel_shift_by_row) == info.pixels_per_column
        d, o = ou.make_xyz_lut(info)
        assert d.shape == (info.pixels_per_column * info.columns_per_frame, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1e-3,
                                   rtol=1e-6)  # unit dirs * range_unit
        n_parsed += 1
    assert n_parsed >= 5


def test_packet_roundtrip_and_batching():
    info = _simple_info()
    pf = ou.PacketFormat(info)
    batcher = ou.ScanBatcher(info)

    rng = np.random.default_rng(0)
    frames = []
    for f in range(2):
        for p in range(info.columns_per_frame // info.columns_per_packet):
            m_ids = np.arange(p * 8, p * 8 + 8)
            ts = 1_000_000 * (f + 1) + m_ids * 100
            rngs = rng.integers(500, 100_000, size=(pf.h, 8))
            done = batcher.push(_build_packet(pf, f, m_ids, ts, rngs))
            if done is not None:
                frames.append(done)
    done = batcher.flush()
    if done is not None:
        frames.append(done)
    assert len(frames) == 2
    s = frames[0]
    assert s.frame_id == 0
    assert s.status.all()
    assert (s.range > 0).all()
    # timestamps increase with measurement id
    assert (np.diff(s.timestamp.astype(np.int64)) == 100).all()


def test_projection_geometry():
    """A range return on a beam with known altitude must land at the right
    elevation; encoder azimuth must rotate around z."""
    info = _simple_info(h=2, w=16)
    info.beam_altitude_angles = np.array([0.0, 30.0])
    d, o = ou.make_xyz_lut(info)
    rng_img = np.zeros((2, 16), np.uint32)
    rng_img[0, 0] = 10_000  # 10 m on the level beam at encoder col 0
    rng_img[1, 4] = 10_000  # 10 m on the 30-deg beam at col 4
    xyz = ou.cartesian(rng_img, d, o)
    p0 = xyz.reshape(2, 16, 3)[0, 0]
    p1 = xyz.reshape(2, 16, 3)[1, 4]
    np.testing.assert_allclose(p0[2], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.linalg.norm(p0), 10.0, rtol=1e-6)
    np.testing.assert_allclose(p1[2], 10.0 * np.sin(np.radians(30)),
                               rtol=1e-6)
    # col 4 of 16 -> encoder angle 2pi - 4/16*2pi; both beams rotate with it
    ang = np.arctan2(p1[1], p1[0]) % (2 * np.pi)
    np.testing.assert_allclose(ang, 2 * np.pi - 4 / 16 * 2 * np.pi,
                               rtol=1e-5)
    # zero-range pixels stay at the origin
    assert (xyz.reshape(2, 16, 3)[0, 1] == 0).all()


def test_destagger_roundtrip(rng):
    img = rng.integers(0, 100, size=(4, 16)).astype(np.uint16)
    shifts = np.array([0, 3, 6, 9])
    st = ou.destagger(img, shifts)
    back = ou.destagger(st, shifts, inverse=True)
    np.testing.assert_array_equal(back, img)


def test_imu_packet_parse():
    pf = ou.PacketFormat(_simple_info())
    buf = bytearray(48)
    buf[0:8] = (123456789).to_bytes(8, "little")
    vals = np.array([0.1, -0.2, 1.0, 10.0, -20.0, 30.0], np.float32)
    buf[24:48] = vals.tobytes()
    ts, accel, gyro = pf.parse_imu_packet(bytes(buf))
    assert ts == 123456789
    np.testing.assert_allclose(accel, vals[:3] * ou.STANDARD_G, rtol=1e-6)
    np.testing.assert_allclose(gyro, np.radians(vals[3:]), rtol=1e-6)


def test_scan_to_points_relative_times():
    info = _simple_info()
    pf = ou.PacketFormat(info)
    batcher = ou.ScanBatcher(info)
    rng = np.random.default_rng(1)
    for p in range(info.columns_per_frame // 8):
        m_ids = np.arange(p * 8, p * 8 + 8)
        ts = 5_000_000_000 + m_ids.astype(np.uint64) * 1_000_000
        rngs = rng.integers(500, 50_000, size=(pf.h, 8))
        batcher.push(_build_packet(pf, 1, m_ids, ts, rngs))
    scan = batcher.flush()
    d, o = ou.make_xyz_lut(info)
    xyz, rel_t, valid, stamp = ou.scan_to_points(scan, d, o)
    assert stamp == 5_000_000_000
    assert valid.all()
    np.testing.assert_allclose(rel_t.reshape(4, 32)[0],
                               np.arange(32) * 1e-3, atol=1e-9)


def _build_packet_fields(pf: ou.PacketFormat, frame_id, m_ids, ts, fields):
    """Synthesize one eUDP packet for ANY non-legacy profile by inverting
    the field table: fields is {name: (H, C) uint array}."""
    assert not pf.legacy
    buf = bytearray(pf.lidar_packet_size)
    buf[2:4] = int(frame_id).to_bytes(2, "little")
    for c in range(pf.cols):
        base = pf.packet_header_size + c * pf.col_size
        buf[base:base + 8] = int(ts[c]).to_bytes(8, "little")
        buf[base + 8:base + 10] = int(m_ids[c]).to_bytes(2, "little")
        buf[base + 10:base + 12] = (1).to_bytes(2, "little")  # status valid
        for u in range(pf.h):
            px = base + pf.col_header_size + u * pf.chan
            for name, (dtype, off, mask, shift) in pf.fields.items():
                if name not in fields:
                    continue
                val = int(fields[name][u, c])
                if shift > 0:
                    val <<= shift
                elif shift < 0:
                    val >>= -shift
                if mask:
                    val &= mask
                width = np.dtype(dtype).itemsize
                cur = int.from_bytes(buf[px + off:px + off + width], "little")
                buf[px + off:px + off + width] = (cur | val).to_bytes(
                    width, "little")
    return bytes(buf)


@pytest.mark.parametrize("profile", [
    ou.PROFILE_SINGLE, ou.PROFILE_DUAL, ou.PROFILE_LOW_BANDWIDTH,
    ou.PROFILE_FIVE_WORD])
def test_profile_field_extraction(profile):
    """Every UDP profile round-trips through its field table, including the
    low-bandwidth shifted encodings (range in 8 mm units, nir in 16-count
    units — parsing.cpp lb_field_info) and dual second returns."""
    info = _simple_info(h=4, profile=profile)
    pf = ou.PacketFormat(info)
    rng = np.random.default_rng(3)
    C = pf.cols
    # Values chosen representable in every encoding: range multiple of 8 mm
    # below 2^15*8, nir multiple of 16 below 2^12, refl < 2^8.
    fields = {
        "range": rng.integers(1, 4000, (pf.h, C)) * 8,
        "reflectivity": rng.integers(0, 255, (pf.h, C)),
        "near_ir": rng.integers(0, 255, (pf.h, C)) * 16,
        "signal": rng.integers(0, 60000, (pf.h, C)),
        "range2": rng.integers(1, 4000, (pf.h, C)) * 8,
        "reflectivity2": rng.integers(0, 255, (pf.h, C)),
        "signal2": rng.integers(0, 60000, (pf.h, C)),
    }
    m_ids = np.arange(C)
    ts = 1_000 + m_ids * 10
    buf = _build_packet_fields(pf, 7, m_ids, ts, fields)

    pts, m, st, r, sig, refl, nir = pf.parse_lidar_packet(buf)
    assert st.all() and (m == m_ids).all() and (pts == ts).all()
    np.testing.assert_array_equal(r, fields["range"])
    np.testing.assert_array_equal(refl, fields["reflectivity"])
    np.testing.assert_array_equal(nir, fields["near_ir"])
    if "signal" in pf.fields:
        np.testing.assert_array_equal(sig, fields["signal"])
    else:
        assert (sig == 0).all()

    if pf.dual_return:
        _, _, _, r2, sig2, refl2, _ = pf.parse_lidar_packet(buf, return_idx=1)
        np.testing.assert_array_equal(r2, fields["range2"])
        np.testing.assert_array_equal(refl2, fields["reflectivity2"])
        np.testing.assert_array_equal(sig2, fields["signal2"])
    else:
        with pytest.raises(ValueError):
            pf.parse_lidar_packet(buf, return_idx=1)


@pytest.mark.parametrize("profile", [
    ou.PROFILE_SINGLE, ou.PROFILE_DUAL, ou.PROFILE_LOW_BANDWIDTH,
    ou.PROFILE_FIVE_WORD])
def test_native_parser_all_profiles(profile):
    """The C++ batch parser agrees with the Python field-table parser on
    every profile's first return."""
    from noetic_slam_tpu.runtime import native

    if native.load() is None:
        pytest.skip("native lib unavailable")
    info = _simple_info(h=4, profile=profile)
    pf = ou.PacketFormat(info)
    rng = np.random.default_rng(5)
    C = pf.cols
    pkts = []
    for p in range(3):
        fields = {
            "range": rng.integers(1, 4000, (pf.h, C)) * 8,
            "reflectivity": rng.integers(0, 255, (pf.h, C)),
            "near_ir": rng.integers(0, 255, (pf.h, C)) * 16,
            "signal": rng.integers(0, 60000, (pf.h, C)),
        }
        m_ids = np.arange(p * C, p * C + C)
        ts = 1_000 + m_ids * 10
        pkts.append((_build_packet_fields(pf, 7, m_ids, ts, fields), fields))

    out = native.parse_lidar_packets(b"".join(b for b, _ in pkts), 3, pf)
    for p, (buf, fields) in enumerate(pkts):
        sl = slice(p * C, p * C + C)
        _, _, _, r, sig, refl, nir = pf.parse_lidar_packet(buf)
        np.testing.assert_array_equal(out["range"][:, sl], r)
        np.testing.assert_array_equal(out["signal"][:, sl], sig)
        np.testing.assert_array_equal(out["reflectivity"][:, sl], refl)
        np.testing.assert_array_equal(out["near_ir"][:, sl], nir)
        assert (out["frame_id"][sl] == 7).all()


def test_ts_safe_offset_add_clamps():
    ts = np.array([0, 5, 100], np.uint64)
    np.testing.assert_array_equal(ou.ts_safe_offset_add(ts, 10),
                                  [10, 15, 110])
    np.testing.assert_array_equal(ou.ts_safe_offset_add(ts, -10),
                                  [0, 0, 90])


def test_scan_timestamper_extrapolate_and_impute():
    """compute_scan_ts_0/_n: missing leading columns extrapolate on the
    first scan and interpolate across the frame gap on later scans
    (lidar_packet_handler.h:158-227)."""
    info = _simple_info(h=2, w=32)
    info.lidar_mode = "1024x10"  # spacing still derived from W below
    tstamper = ou.ScanTimestamper(info)
    spacing = ou.scan_col_ts_spacing_ns(info)

    # Scan 1: columns 4.. valid, 0..3 dropped -> extrapolate back 4 cols.
    ts1 = np.zeros(32, np.uint64)
    base = 10_000_000_000
    ts1[4:] = base + (np.arange(4, 32) * spacing).astype(np.uint64)
    est1 = tstamper(ts1)
    assert abs(est1 - base) <= 1

    # Scan 2: columns 2.. valid; impute between scan1's last valid column
    # (31) and this scan's first (32 + 2), evaluated at column 32.
    ts2 = np.zeros(32, np.uint64)
    base2 = base + int(32 * spacing)
    ts2[2:] = base2 + (np.arange(2, 32) * spacing).astype(np.uint64)
    est2 = tstamper(ts2)
    assert abs(est2 - base2) <= 1

    # Complete scan: stamp = column 0 timestamp exactly.
    ts3 = base2 + int(32 * spacing) + (np.arange(32) * spacing).astype(
        np.uint64)
    assert tstamper(ts3) == int(ts3[0])


def test_scan_timestamper_ptp_offset():
    info = _simple_info(h=2, w=32)
    tai = -37_000_000_000
    tstamper = ou.ScanTimestamper(info, ptp_utc_tai_offset_ns=tai)
    ts = np.full(32, 50_000_000_000, np.uint64) \
        + (np.arange(32) * ou.scan_col_ts_spacing_ns(info)).astype(np.uint64)
    assert tstamper(ts.copy()) == int(ts[0]) + tai
    # scan_to_points applies the same offset to per-point relative times
    scan = ou.LidarScan(ts.copy(), np.ones(32, np.uint32),
                        np.arange(32, dtype=np.uint16),
                        np.full((2, 32), 1000, np.uint32),
                        np.zeros((2, 32), np.uint16),
                        np.zeros((2, 32), np.uint16),
                        np.zeros((2, 32), np.uint16))
    d, o = ou.make_xyz_lut(info)
    _, rel_t, _, stamp = ou.scan_to_points(scan, d, o,
                                           scan_ts_ns=int(ts[0]) + tai,
                                           ts_offset_ns=tai)
    assert stamp == int(ts[0]) + tai
    np.testing.assert_allclose(
        rel_t.reshape(2, 32)[0],
        np.arange(32) * ou.scan_col_ts_spacing_ns(info) * 1e-9, atol=1e-9)


def test_dual_return_batching_and_laser_scan():
    """Dual-return frames accumulate both returns; scan_to_laser_scan
    extracts one ring (reversed columns, meters) per return
    (os_ros.cpp:354-390)."""
    info = _simple_info(profile=ou.PROFILE_DUAL)
    pf = ou.PacketFormat(info)
    batcher = ou.ScanBatcher(info)
    rng = np.random.default_rng(9)
    W = info.columns_per_frame
    r1_all = rng.integers(1, 50_000, (pf.h, W)).astype(np.uint32)
    r2_all = rng.integers(1, 50_000, (pf.h, W)).astype(np.uint32)
    s2_all = rng.integers(0, 60_000, (pf.h, W)).astype(np.uint32)
    for f in (0, 1):
        for p in range(W // pf.cols):
            m_ids = np.arange(p * pf.cols, (p + 1) * pf.cols)
            ts = 10 ** 9 * (f + 1) + m_ids * 100
            fields = {
                "range": r1_all[:, m_ids], "range2": r2_all[:, m_ids],
                "signal2": s2_all[:, m_ids],
                "signal": np.full((pf.h, pf.cols), 7),
                "reflectivity": np.full((pf.h, pf.cols), 3),
                "reflectivity2": np.full((pf.h, pf.cols), 4),
                "near_ir": np.zeros((pf.h, pf.cols)),
            }
            done = batcher.push(
                _build_packet_fields(pf, f, m_ids, ts, fields))
            if done is not None:
                scan = done
    np.testing.assert_array_equal(scan.range, r1_all)
    np.testing.assert_array_equal(scan.range2, r2_all)
    np.testing.assert_array_equal(scan.signal2, s2_all)
    assert (scan.reflectivity2 == 4).all()

    ls0 = ou.scan_to_laser_scan(scan, info, ring=2)
    ls1 = ou.scan_to_laser_scan(scan, info, ring=2, return_idx=1)
    np.testing.assert_allclose(ls0["ranges"], r1_all[2, ::-1] * 1e-3,
                               rtol=1e-6)
    np.testing.assert_allclose(ls1["ranges"], r2_all[2, ::-1] * 1e-3,
                               rtol=1e-6)
    np.testing.assert_allclose(ls1["intensities"], s2_all[2, ::-1])
    assert ls0["angle_increment"] == pytest.approx(2 * np.pi / W)
    assert ls0["scan_time"] == pytest.approx(1.0 / info.fps)

    # second-return projection path
    d, o = ou.make_xyz_lut(info)
    xyz2, _, valid2, _ = ou.scan_to_points(scan, d, o, return_idx=1)
    r_rec = np.linalg.norm(xyz2[valid2], axis=1)
    assert np.allclose(r_rec, (r2_all * 1e-3).reshape(-1)[valid2], atol=0.05)

    # single-return profile rejects return_idx=1
    info1 = _simple_info()
    b1 = ou.ScanBatcher(info1)
    with pytest.raises(ValueError):
        ou.scan_to_laser_scan(b1._empty(), info1, ring=0, return_idx=1)


def test_scan_batcher_push_many_parity():
    """push_many(chunk) must equal repeated push() — including a frame
    rollover mid-chunk, out-of-order measurement ids, and invalid-status
    columns."""
    info = _simple_info(h=8, w=32)
    pf = ou.PacketFormat(info)
    rng = np.random.default_rng(3)

    def frame(fid, drop_col=None):
        pkts = []
        for p in range(4):
            m_ids = np.arange(8) + 8 * p
            ts = 10_000 * fid + m_ids * 10
            rngs = rng.integers(100, 50_000, (pf.h, 8))
            b = bytearray(_build_packet(pf, fid, m_ids, ts, rngs))
            if drop_col is not None and p == drop_col:
                base = pf.packet_header_size + 3 * pf.col_size
                b[base + 10:base + 12] = (0).to_bytes(2, "little")
            pkts.append(bytes(b))
        return pkts

    stream = frame(1) + frame(2, drop_col=1) + frame(3)
    b1, b2 = ou.ScanBatcher(info), ou.ScanBatcher(info)
    done1 = [d for p in stream if (d := b1.push(p)) is not None]
    done2 = b2.push_many(b"".join(stream), len(stream))
    assert len(done1) == len(done2) == 2
    for d1, d2 in zip(done1, done2):
        assert d1.frame_id == d2.frame_id
        np.testing.assert_array_equal(d1.range, d2.range)
        np.testing.assert_array_equal(d1.timestamp, d2.timestamp)
        np.testing.assert_array_equal(d1.status, d2.status)
        np.testing.assert_array_equal(d1.signal, d2.signal)
    f1, f2 = b1.flush(), b2.flush()
    np.testing.assert_array_equal(f1.range, f2.range)
