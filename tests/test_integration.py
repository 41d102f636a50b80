"""End-to-end graph test: synthetic flight -> mock GPS output vs ground truth.

The headless equivalent of the reference's SITL test
(``test/sitl/sitl_px4.py:245-280`` in hmakelin/gisnav): a synthetic camera
flies over a synthetic world; a stub WMS serves crops of that world; the full
node graph (bbox -> gis -> pose -> twist -> fusion -> mock GPS) runs in one
process; every published SensorGps fix must agree with ground truth within
10 m horizontally and 10 m vertically (the reference's acceptance gate).
"""
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import cv2
import numpy as np
import pytest

from gisnav_tpu.geometry.crs import haversine_m
from gisnav_tpu.geometry.quaternion import matrix_to_quat
from gisnav_tpu.nodes import GisNavApp
from gisnav_tpu.nodes.mock_gps import TOPIC_SENSOR_GPS

# heavy compile/e2e module; excluded from the fast subset (-m 'not slow')
pytestmark = pytest.mark.slow

# ---------------------------------------------------------------------------
# Synthetic world
# ---------------------------------------------------------------------------

W_PX = 4096
LEFT, RIGHT = 24.00, 24.10  # ~5565 m at lat 60
BOTTOM, TOP = 60.00, 60.05  # ~5529 m
GSD_LON = (RIGHT - LEFT) / W_PX  # deg per world px
GSD_LAT = (TOP - BOTTOM) / W_PX
M_PER_WPX = 5565.0 / W_PX  # ~1.36 m

K_CAM = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
ALT_M = 500.0
YAW_DEG = 15.0


def _make_world(seed=7):
    """Urban-like texture: distinctive shapes at many scales (plain fractal
    noise is too self-similar for ratio-test matching across the 2.4x
    map/query scale gap that the FOV padding implies)."""
    rng = np.random.default_rng(seed)
    world = np.full((W_PX, W_PX), 110, np.uint8)
    for _ in range(4000):
        x, y = (int(v) for v in rng.integers(0, W_PX, 2))
        kind = int(rng.integers(0, 3))
        v = int(rng.integers(0, 256))
        s = int(rng.integers(8, 80))
        if kind == 0:
            cv2.rectangle(world, (x, y),
                          (x + s, y + int(s * rng.uniform(0.3, 1.5))), v, -1)
        elif kind == 1:
            cv2.circle(world, (x, y), s // 2, v, -1)
        else:
            x2 = x + int(s * rng.uniform(-2, 2))
            y2 = y + int(s * rng.uniform(-2, 2))
            cv2.line(world, (x, y), (x2, y2), v, int(rng.integers(2, 8)))
    return cv2.GaussianBlur(world, (3, 3), 0.8)


WORLD = _make_world()

# terrain height (meters, uint8) served by the stub WMS DEM layer; a
# one-element list so scenario modules can swap it per test
_DEM_VALUE = [0]


def _lonlat_to_wpx(lon, lat):
    return (lon - LEFT) / GSD_LON, (TOP - lat) / GSD_LAT


class _WorldWMS(BaseHTTPRequestHandler):
    """Stub WMS serving resampled crops of the synthetic world."""

    def log_message(self, *args):
        pass

    def do_GET(self):
        q = {k.lower(): v[0] for k, v in
             parse_qs(urlparse(self.path).query).items()}
        if q.get("request") == "GetCapabilities":
            self.send_response(200)
            self.send_header("content-type", "application/vnd.ogc.wms_xml")
            self.end_headers()
            self.wfile.write(b"<WMT_MS_Capabilities/>")
            return
        if q.get("request") != "GetMap":
            self.send_response(404)
            self.end_headers()
            return
        left, bottom, right, top = (float(v) for v in q["bbox"].split(","))
        h, w = int(q["height"]), int(q["width"])
        if "dem" in q.get("layers", ""):
            # flat world at _DEM_VALUE[0] meters (test_envelope.py raises it)
            out = np.full((h, w), _DEM_VALUE[0], np.uint8)
        else:
            x0, y0 = _lonlat_to_wpx(left, top)
            x1, y1 = _lonlat_to_wpx(right, bottom)
            xi0, yi0 = max(int(x0), 0), max(int(y0), 0)
            xi1, yi1 = min(int(np.ceil(x1)), W_PX), min(int(np.ceil(y1)), W_PX)
            crop = WORLD[yi0:yi1, xi0:xi1]
            # paste the in-world crop at its TRUE location in the requested
            # bbox; a bbox reaching outside the world gets gray padding, NOT
            # a stretched crop (stretching silently skews the raster<->CRS
            # affine and fabricates hundreds of meters of geolocation error
            # at high altitudes where maps are large)
            sx, sy = w / (x1 - x0), h / (y1 - y0)
            u0, v0 = int(round((xi0 - x0) * sx)), int(round((yi0 - y0) * sy))
            u1, v1 = int(round((xi1 - x0) * sx)), int(round((yi1 - y0) * sy))
            out = np.full((h, w), 110, np.uint8)
            if u1 > u0 and v1 > v0 and crop.size:
                out[v0:v1, u0:u1] = cv2.resize(
                    crop, (u1 - u0, v1 - v0), interpolation=cv2.INTER_AREA)
        ok, buf = cv2.imencode(".png", out)
        self.send_response(200)
        self.send_header("content-type", "image/png")
        self.end_headers()
        self.wfile.write(buf.tobytes())


def _render_frame(lon, lat, alt_m, yaw_deg):
    """Render the nadir camera view from the world raster."""
    cx, cy = _lonlat_to_wpx(lon, lat)
    alt_wpx = alt_m / M_PER_WPX
    a = np.radians(yaw_deg)
    c, s = np.cos(a), np.sin(a)
    r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])  # worldpx -> camera
    cam = np.array([cx, cy, -alt_wpx])
    t = -r @ cam
    hm = K_CAM @ np.stack([r[:, 0], r[:, 1], t], axis=1)
    return cv2.warpPerspective(WORLD, hm, (640, 480))


def _camera_attitude_quat(yaw_deg):
    """camera_optical -> ENU rotation for the rendered nadir camera.

    The render maps world px (x east, y south, z down) through Rz(yaw); the
    world-pixel frame relates to ENU by diag(1, -1, -1).
    """
    a = np.radians(yaw_deg)
    c, s = np.cos(a), np.sin(a)
    r_cam_from_wpx = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    wpx_from_enu = np.diag([1.0, -1.0, -1.0])
    r_cam_from_enu = r_cam_from_wpx @ wpx_from_enu
    return matrix_to_quat(r_cam_from_enu.T)


@pytest.fixture(scope="module")
def wms_url():
    server = HTTPServer(("127.0.0.1", 0), _WorldWMS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/wms"
    server.shutdown()


class TestEndToEnd:
    def test_mock_gps_tracks_ground_truth(self, wms_url):
        from gisnav_tpu.gis import WMSClient

        app = GisNavApp(
            params={
                "gis_node": {
                    "wms_url": wms_url,
                    "wms_layers": ["imagery"],
                    "wms_dem_layers": ["dem"],
                },
                "twist_node": {"ground_altitude_m": 0.0},
                "bbox_node": {"ground_altitude_m": 0.0},
            },
            wms_client=WMSClient(wms_url),
            protocol="uorb",
        )

        fixes = []
        app.bus.subscribe(TOPIC_SENSOR_GPS, fixes.append)

        app.bus.publish("/camera/camera_info",
                        {"k": K_CAM, "width": 640, "height": 480})

        lat0, lon0 = 60.02, 24.03
        speed_mps = 20.0
        dt_us = 500_000
        n_steps = 30
        truth = []
        stamp = 1_000_000
        for i in range(n_steps):
            stamp += dt_us
            east_m = speed_mps * (stamp - 1_000_000 - dt_us) / 1e6
            lon = lon0 + east_m / (111320 * np.cos(np.radians(60)))
            lat = lat0
            truth.append((stamp, lon, lat, ALT_M))

            app.bus.publish("/mavros/global_position/global", {
                "stamp_us": stamp, "lat": lat, "lon": lon,
                "alt_ellipsoid": ALT_M,
            })
            app.bus.publish(
                "/mavros/gimbal_control/device/attitude_status",
                {"stamp_us": stamp,
                 "quat_xyzw": _camera_attitude_quat(YAW_DEG)},
            )
            app.gis.tick()
            frame = _render_frame(lon, lat, ALT_M, YAW_DEG)
            app.bus.publish("/camera/image_raw", {
                "stamp_us": stamp, "frame_id": "camera_optical",
                "image": frame,
            })

        stats = app.shutdown()
        assert len(fixes) >= 5, (
            f"expected mock GPS output, got {len(fixes)} "
            f"(pose handler stats: {stats.get('pose_node')})"
        )

        # compare each fix against interpolated ground truth
        truth_by_stamp = {t[0]: t for t in truth}
        horiz_errs, vert_errs = [], []
        for fix in fixes:
            t = fix["timestamp_sample"]
            assert t in truth_by_stamp
            _, lon_t, lat_t, alt_t = truth_by_stamp[t]
            lat_f, lon_f = fix["lat"] / 1e7, fix["lon"] / 1e7
            horiz = haversine_m(lat_t, lon_t, lat_f, lon_f)
            vert = abs(fix["alt_ellipsoid"] / 1e3 - alt_t)
            horiz_errs.append(horiz)
            vert_errs.append(vert)
            # the reference SITL acceptance gate (sitl_px4.py:263-280)
            assert horiz < 10.0, (horiz, fix)
            assert vert < 10.0, (vert, fix)
        # and on average much tighter
        assert np.mean(horiz_errs) < 5.0
        assert np.mean(vert_errs) < 5.0
        # fingerprint preserved
        assert all(f["satellites_used"] == 255 for f in fixes)
