"""GIS layer tests against an in-process stub WMS server."""
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import cv2
import numpy as np
import pytest

from gisnav_tpu.geometry.bbox import BBox
from gisnav_tpu.gis import (
    OrthoImageCache,
    WMSClient,
    orthoimage_size_for_camera,
    request_orthoimage,
)


class _StubWMS(BaseHTTPRequestHandler):
    """Stub WMS: renders a raster whose pixel values encode the request."""

    requests_log = []

    def log_message(self, *args):
        pass

    def do_GET(self):
        q = {k.lower(): v[0] for k, v in
             parse_qs(urlparse(self.path).query).items()}
        type(self).requests_log.append(q)
        if q.get("request") == "GetCapabilities":
            self.send_response(200)
            self.send_header("content-type", "application/vnd.ogc.wms_xml")
            self.end_headers()
            self.wfile.write(b"<WMT_MS_Capabilities/>")
            return
        if q.get("request") == "GetMap":
            h, w = int(q["height"]), int(q["width"])
            layers = q.get("layers", "")
            if "missing" in layers:
                self.send_response(200)
                self.send_header("content-type", "application/vnd.ogc.se_xml")
                self.end_headers()
                self.wfile.write(b"<ServiceExceptionReport/>")
                return
            value = 200 if "imagery" in layers else 37  # dem gets 37
            img = np.full((h, w, 3), value, np.uint8)
            ok, buf = cv2.imencode(".png", img)
            self.send_response(200)
            self.send_header("content-type", "image/png")
            self.end_headers()
            self.wfile.write(buf.tobytes())
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture(scope="module")
def wms_server():
    server = HTTPServer(("127.0.0.1", 0), _StubWMS)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/wms"
    server.shutdown()


class TestWMSClient:
    def test_capabilities_probe(self, wms_server):
        assert WMSClient(wms_server).is_available()
        assert not WMSClient("http://127.0.0.1:1/wms", timeout_s=0.2).is_available()

    def test_get_map_params_and_decode(self, wms_server):
        client = WMSClient(wms_server)
        _StubWMS.requests_log.clear()
        img = client.get_map(
            ["imagery"], (24.0, 60.0, 24.1, 60.1), (256, 320),
        )
        assert img is not None and img.shape[:2] == (256, 320)
        q = _StubWMS.requests_log[-1]
        assert q["bbox"] == "24.0,60.0,24.1,60.1"
        assert q["srs"] == "EPSG:4326"
        assert (q["width"], q["height"]) == ("320", "256")

    def test_service_exception_returns_none(self, wms_server):
        client = WMSClient(wms_server)
        assert client.get_map(["missing"], (0, 0, 1, 1), (64, 64)) is None

    def test_request_orthoimage_with_dem(self, wms_server):
        client = WMSClient(wms_server)
        out = request_orthoimage(
            client, (24.0, 60.0, 24.1, 60.1), (128, 128),
            layers=["imagery"], dem_layers=["dem"],
        )
        assert out is not None
        img, dem = out
        assert img.dtype == np.uint8 and img.shape == (128, 128)
        assert dem.dtype == np.float32 and dem.shape == (128, 128)
        assert (dem == 37.0).all()
        assert (img == 200).all()

    def test_request_orthoimage_flat_dem_fallback(self, wms_server):
        client = WMSClient(wms_server)
        img, dem = request_orthoimage(
            client, (24.0, 60.0, 24.1, 60.1), (64, 64), layers=["imagery"],
        )
        assert (dem == 0).all()


class TestOrthoSize:
    def test_diagonal_and_alignment(self):
        h, w = orthoimage_size_for_camera(640, 480)
        assert h == w
        assert h >= int(np.hypot(640, 480))
        assert h % 8 == 0


class TestCache:
    def test_overlap_gating(self):
        cache = OrthoImageCache(min_overlap=0.85)
        bb = BBox(24.0, 60.0, 24.1, 60.1)
        assert cache.needs_update(bb)
        cache.update(np.zeros((64, 64), np.uint8), np.zeros((64, 64), np.float32), bb)
        assert not cache.needs_update(bb)
        # slight shift keeps overlap above 0.85 -> no refresh
        assert not cache.needs_update(BBox(24.001, 60.001, 24.101, 60.101))
        # big shift forces refresh
        assert cache.needs_update(BBox(24.05, 60.05, 24.15, 60.15))

    def test_update_callback_and_affine(self):
        seen = []
        cache = OrthoImageCache(on_update=seen.append)
        bb = BBox(24.0, 60.0, 24.1, 60.1)
        ortho = cache.update(
            np.zeros((101, 101), np.uint8), np.zeros((101, 101), np.float32), bb
        )
        assert seen == [ortho]
        tl = ortho.crs_affine @ np.array([0, 0, 0, 1.0])
        assert np.allclose(tl[:2], [24.0, 60.1])
        assert ortho.crs_proj.startswith("+proj=affine")
