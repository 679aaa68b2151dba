"""Sensor HTTP config client against a local mock of the sensor REST API
(endpoints per sensor_http_imp.cpp:9-93)."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from noetic_slam_tpu.io import sensor_http as sh


class MockSensor:
    def __init__(self, fw="ousteros-image-prod-aries-v2.4.0"):
        self.fw = fw
        self.staged = {"lidar_mode": "1024x10", "udp_port_lidar": 7502}
        self.active = dict(self.staged)
        self.saved = False
        self.reinit_count = 0
        h = 32
        self.metadata = {
            "sensor_info": {"prod_sn": "99201234", "build_rev": self.fw},
            "lidar_data_format": {
                "pixels_per_column": h, "columns_per_frame": 1024,
                "columns_per_packet": 16,
                "pixel_shift_by_row": [0] * h,
                "udp_profile_lidar": "RNG19_RFL8_SIG16_NIR16"},
            "beam_intrinsics": {
                "beam_azimuth_angles": [0.0] * h,
                "beam_altitude_angles": list(np.linspace(-20, 20, h)),
                "lidar_origin_to_beam_origin_mm": 15.806},
            "lidar_intrinsics": {
                "lidar_to_sensor_transform":
                    [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 36.18, 0, 0, 0, 1]},
            "config_params": {"lidar_mode": "1024x10"},
        }


def make_handler(sensor: MockSensor):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, text, code=200):
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            path = parsed.path.strip("/")
            args = urllib.parse.parse_qs(parsed.query).get("args", [""])[0]
            if path == "api/v1/system/firmware":
                self._send(json.dumps({"fw": sensor.fw}))
            elif path == "api/v1/sensor/metadata":
                self._send(json.dumps(sensor.metadata))
            elif path.startswith("api/v1/sensor/metadata/"):
                section = path.rsplit("/", 1)[1]
                self._send(json.dumps(sensor.metadata.get(section, {})))
            elif path == "api/v1/sensor/cmd/get_config_param":
                cfg = sensor.active if args == "active" else sensor.staged
                self._send(json.dumps(cfg))
            elif path == "api/v1/sensor/cmd/set_config_param":
                key, _, value = args.partition(" ")  # '+' decodes to space
                try:
                    value = json.loads(value)
                except json.JSONDecodeError:
                    pass
                sensor.staged[key] = value
                self._send('"set_config_param"')
            elif path == "api/v1/sensor/cmd/reinitialize":
                sensor.active = dict(sensor.staged)
                sensor.reinit_count += 1
                self._send("{}")
            elif path == "api/v1/sensor/cmd/save_config_params":
                sensor.saved = True
                self._send("{}")
            elif path == "api/v1/sensor/cmd/set_udp_dest_auto":
                sensor.staged["udp_dest"] = "169.254.0.1"
                self._send("{}")
            else:
                self._send("not found", code=404)

    return Handler


@pytest.fixture
def mock_sensor():
    sensor = MockSensor()
    srv = HTTPServer(("127.0.0.1", 0), make_handler(sensor))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield sensor, srv.server_address[1]
    srv.shutdown()
    srv.server_close()


def test_firmware_and_metadata(mock_sensor):
    sensor, port = mock_sensor
    http = sh.SensorHttp("127.0.0.1", port=port)
    assert http.firmware_version() == (2, 4, 0)
    md = http.metadata()
    assert md["sensor_info"]["prod_sn"] == "99201234"
    assert http.lidar_data_format()["pixels_per_column"] == 32
    assert http.beam_intrinsics()["lidar_origin_to_beam_origin_mm"] > 0


def test_fetch_metadata_to_sensor_info(mock_sensor):
    sensor, port = mock_sensor
    info = sh.fetch_metadata("127.0.0.1", port=port)
    assert info.pixels_per_column == 32
    assert info.columns_per_frame == 1024
    assert info.udp_profile_lidar == "RNG19_RFL8_SIG16_NIR16"
    assert info.beam_to_lidar[0, 3] == pytest.approx(15.806)


def test_configure_sensor_flow(mock_sensor):
    sensor, port = mock_sensor
    active = sh.configure_sensor(
        "127.0.0.1", {"lidar_mode": "2048x10", "udp_port_lidar": 7502,
                      "timestamp_mode": "TIME_FROM_PTP_1588"},
        persist=True, port=port)
    assert active["lidar_mode"] == "2048x10"
    assert active["timestamp_mode"] == "TIME_FROM_PTP_1588"
    assert sensor.reinit_count == 1
    assert sensor.saved


def test_configure_rejects_old_firmware(mock_sensor):
    sensor, port = mock_sensor
    sensor.fw = "ousteros-image-prod-aries-v2.0.9"
    with pytest.raises(sh.SensorHttpError, match="TCP config path"):
        sh.configure_sensor("127.0.0.1", {}, port=port)


def test_set_udp_dest_auto_conflict(mock_sensor):
    sensor, port = mock_sensor
    with pytest.raises(ValueError):
        sh.configure_sensor("127.0.0.1", {"udp_dest": "10.0.0.1"},
                            udp_dest_auto=True, port=port)
    active = sh.configure_sensor("127.0.0.1", {}, udp_dest_auto=True,
                                 port=port)
    assert active["udp_dest"] == "169.254.0.1"
