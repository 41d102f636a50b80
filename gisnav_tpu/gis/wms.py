"""Minimal WMS GetMap/GetCapabilities client (requests-based, no OWSLib).

Covers what the reference uses OWSLib for (``core/gis_node.py:248-313,
638-699`` in hmakelin/gisnav): GetMap requests for imagery + DEM layers with
a WGS84 bbox, connectivity polling via GetCapabilities, and cv2 decoding of
the response rasters. The protocol stays standard WMS 1.1.1 so the
reference's MapServer/NAIP/USGS stack works unchanged as the backing service.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["WMSClient", "request_orthoimage", "orthoimage_size_for_camera"]


class WMSClient:
    """Thin WMS 1.1.1 client.

    :param url: endpoint, e.g. ``http://localhost:80/wms``
    :param version: WMS protocol version ("1.1.1" uses SRS, "1.3.0" CRS)
    :param timeout_s: per-request timeout (reference default 10 s,
        ``gis_node.py:175-181``)
    """

    def __init__(self, url: str, version: str = "1.1.1", timeout_s: float = 10.0):
        self.url = url
        self.version = version
        self.timeout_s = timeout_s

    def is_available(self) -> bool:
        """GetCapabilities connectivity probe (the reference polls this at
        0.1 Hz to reconnect, ``gis_node.py:278-313``)."""
        import requests

        try:
            resp = requests.get(
                self.url,
                params={
                    "service": "WMS",
                    "request": "GetCapabilities",
                    "version": self.version,
                },
                timeout=self.timeout_s,
            )
            return resp.ok
        except requests.exceptions.RequestException:
            return False

    def get_map(
        self,
        layers: Sequence[str],
        bbox: Tuple[float, float, float, float],
        size: Tuple[int, int],
        srs: str = "EPSG:4326",
        format_: str = "image/jpeg",
        styles: Optional[Sequence[str]] = None,
        transparent: bool = False,
        grayscale: bool = False,
    ) -> Optional[np.ndarray]:
        """Send a GetMap request and decode the raster.

        :param bbox: (left, bottom, right, top) in ``srs`` coordinates
        :param size: (height, width) of the requested raster
        :return: decoded raster or None on any failure (the caller keeps the
            previous map, matching the reference's fail-soft behavior)
        """
        import cv2
        import requests

        axis_key = "srs" if self.version.startswith("1.1") else "crs"
        params = {
            "service": "WMS",
            "request": "GetMap",
            "version": self.version,
            "layers": ",".join(layers),
            "styles": ",".join(styles) if styles else "",
            axis_key: srs,
            "bbox": ",".join(str(v) for v in bbox),
            "width": str(size[1]),
            "height": str(size[0]),
            "format": format_,
            "transparent": str(transparent).upper(),
        }
        try:
            resp = requests.get(self.url, params=params, timeout=self.timeout_s)
            if not resp.ok or not resp.content:
                return None
            content_type = resp.headers.get("content-type", "")
            if "image" not in content_type:
                return None  # XML ServiceException
            buf = np.frombuffer(resp.content, np.uint8)
            flag = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_UNCHANGED
            return cv2.imdecode(buf, flag)
        except requests.exceptions.RequestException:
            return None


def orthoimage_size_for_camera(width: int, height: int) -> Tuple[int, int]:
    """Square (height, width) equal to the camera-frame diagonal, padded up to
    a multiple of 8 (conv-stack alignment).

    The reference sizes maps to the camera diagonal so arbitrary rotation
    never clips or introduces black corners (``gis_node.py:360-384``); the /8
    padding is ours (SuperPoint needs H, W divisible by 8).
    """
    diagonal = int(math.ceil(math.hypot(width, height)))
    diagonal = (diagonal + 7) // 8 * 8
    return diagonal, diagonal


def request_orthoimage(
    client: WMSClient,
    bbox: Tuple[float, float, float, float],
    size: Tuple[int, int],
    layers: Sequence[str],
    dem_layers: Sequence[str] = (),
    styles: Optional[Sequence[str]] = None,
    dem_styles: Optional[Sequence[str]] = None,
    srs: str = "EPSG:4326",
    format_: str = "image/jpeg",
    transparent: bool = False,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fetch imagery + DEM rasters for a bbox; zero DEM if no layer given.

    Reference semantics: ``_request_orthoimage_for_bounding_box``
    (``gis_node.py:386-449``).

    :return: (grayscale image (H, W) uint8, dem (H, W) float32 meters) or None
    """
    import cv2

    img = client.get_map(layers, bbox, size, srs, format_, styles, transparent)
    if img is None:
        return None
    if img.ndim == 3:
        img = cv2.cvtColor(
            img, cv2.COLOR_BGRA2GRAY if img.shape[2] == 4 else cv2.COLOR_BGR2GRAY
        )

    dem: Optional[np.ndarray] = None
    if dem_layers and dem_layers[0]:
        dem = client.get_map(
            dem_layers, bbox, size, srs, format_, dem_styles, transparent,
            grayscale=True,
        )
    if dem is None:
        dem = np.zeros_like(img)
    return img.astype(np.uint8), dem.astype(np.float32)
