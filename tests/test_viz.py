"""Visualization products + SDK image post-processing parity."""

import json
import struct
import zlib

import numpy as np

from noetic_slam_tpu.io import viz
from noetic_slam_tpu.io.ouster import (
    AutoExposure,
    BeamUniformityCorrector,
    SensorInfo,
)


def _cloud(n=5000, seed=0):
    r = np.random.default_rng(seed)
    ang = r.uniform(0, 2 * np.pi, n)
    rad = 8.0 + r.normal(scale=0.05, size=n)
    z = r.uniform(-0.5, 2.0, n)
    return np.stack([rad * np.cos(ang), rad * np.sin(ang), z],
                    -1).astype(np.float32)


def test_render_cloud_and_views():
    img = viz.render_cloud(_cloud(), width=320, height=240)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # points must actually land on the canvas (not all background)
    assert (img != img[0, 0]).any()

    sheet = viz.render_views(_cloud(), size=128)
    assert sheet.shape == (256, 256, 3)


def test_render_cloud_handles_sentinel_points():
    pts = np.vstack([_cloud(100), np.full((50, 3), 1e6, np.float32),
                     np.full((10, 3), np.nan, np.float32)])
    img = viz.render_cloud(pts, width=64, height=64)
    assert img.shape == (64, 64, 3)


def test_write_png_roundtrip_structure(tmp_path):
    img = viz.render_trajectory(np.cumsum(
        np.random.default_rng(0).normal(size=(50, 3)), axis=0), size=96)
    p = tmp_path / "t.png"
    viz.write_png(str(p), img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR
    assert raw[12:16] == b"IHDR"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (96, 96)
    # IDAT decompresses to h*(1+3w) filter-prefixed rows
    i = raw.index(b"IDAT")
    ln = struct.unpack(">I", raw[i - 4: i])[0]
    decoded = zlib.decompress(raw[i + 4: i + 4 + ln])
    assert len(decoded) == h * (1 + 3 * w)


def test_html_viewer(tmp_path):
    p = tmp_path / "v.html"
    viz.write_html_viewer(str(p), _cloud(1000))
    text = p.read_text()
    assert "canvas" in text and "N=1000" in text


def test_render_scan_panels():
    images = {"range": np.random.default_rng(0).random((32, 256)),
              "signal_norm": np.random.default_rng(1).random((32, 256))}
    panel = viz.render_scan_panels(images)
    assert panel.shape[1] == 256 and panel.shape[0] >= 64


def test_colorize_bounds():
    c = viz.colorize(np.array([0.0, 0.5, 1.0, np.nan]))
    assert c.shape == (4, 3)
    assert (c >= 0).all() and (c <= 1).all()


# --------------------------------------------------------------- autoexposure
def test_autoexposure_stretches_percentiles():
    ae = AutoExposure()
    r = np.random.default_rng(0)
    img = r.uniform(100.0, 200.0, (64, 512))
    out = ae(img)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the bulk of a uniform distribution must stretch across ~[lo_pct, 1-hi_pct]
    assert np.percentile(out, 50) > 0.3 and np.percentile(out, 50) < 0.7
    assert out.max() > 0.85


def test_autoexposure_damped_state_converges():
    ae = AutoExposure(update_every=1)
    r = np.random.default_rng(0)
    bright = r.uniform(1000.0, 2000.0, (16, 128))
    dim = r.uniform(10.0, 20.0, (16, 128))
    ae(bright)
    first = ae(dim).mean()
    for _ in range(60):
        out = ae(dim)
    # after damping converges the dim image fills the range again
    # (0.9^60 of the bright state still inflates hi_state slightly)
    assert out.mean() > first + 0.2
    assert out.max() > 0.6


def test_autoexposure_degenerate_spread():
    ae = AutoExposure()
    img = np.full((8, 128), 7.0)
    out = ae(img)
    # hi==lo branch: everything maps relative to hi_state==7 -> 0.5
    assert np.allclose(out, 0.5)


def test_beam_uniformity_removes_row_offsets():
    r = np.random.default_rng(0)
    base = r.uniform(50, 60, (32, 256))
    row_offsets = np.linspace(0, 40, 32)[:, None] ** 1.0
    row_offsets = (np.sin(np.arange(32)) * 10 + 20)[:, None]
    img = base + row_offsets
    buc = BeamUniformityCorrector()
    out = buc(img)
    # per-row means must be far more uniform than the input's
    assert out.shape == img.shape
    assert np.std(out.mean(axis=1)) < 0.5 * np.std(img.mean(axis=1))
    assert (out >= 0).all()


# ------------------------------------------------------------ metadata json
def test_sensor_info_json_roundtrip():
    h = 32
    info = SensorInfo(
        pixels_per_column=h, columns_per_frame=512, columns_per_packet=16,
        pixel_shift_by_row=np.arange(h) % 8,
        beam_azimuth_angles=np.linspace(-1, 1, h),
        beam_altitude_angles=np.linspace(-16, 16, h),
        beam_to_lidar=np.eye(4) + 0.0,
        lidar_to_sensor=np.diag([1.0, 1, 1, 1]),
        udp_profile_lidar="RNG19_RFL8_SIG16_NIR16",
        lidar_mode="512x10", sn="X123")
    text = info.to_json()
    json.loads(text)  # valid json
    back = SensorInfo.from_json(text)
    assert back.pixels_per_column == h
    assert back.columns_per_frame == 512
    assert back.udp_profile_lidar == info.udp_profile_lidar
    assert back.lidar_mode == "512x10" and back.sn == "X123"
    np.testing.assert_array_equal(back.pixel_shift_by_row,
                                  info.pixel_shift_by_row)
    np.testing.assert_allclose(back.beam_azimuth_angles,
                               info.beam_azimuth_angles)
    np.testing.assert_allclose(back.beam_to_lidar, info.beam_to_lidar)
    np.testing.assert_allclose(back.lidar_to_sensor, info.lidar_to_sensor)
