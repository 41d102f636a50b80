"""Synthetic georeferenced worlds for demos, benches, and tests.

The reference ships real demo rasters (NAIP orthoimagery + a USGS DEM
downloaded at image build time, ``docker/apache/Dockerfile:47-72`` in
hmakelin/gisnav). This box — and any air-gapped deployment — can't download
them, so the self-contained demo renders an urban-like synthetic world
instead: distinctive shapes at many scales (plain fractal noise is too
self-similar for ratio-test matching across the ~2.4x map/query scale gap
the FOV-padded map sizing implies). The same generator drives the headline
bench and the integration tests, so demo imagery exercises exactly the
matching regime the accuracy gates validate.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["synthetic_world", "synthetic_dem", "DEMO_GEOREF"]


def synthetic_world(size_px: int = 4096, seed: int = 7,
                    n_shapes: int = 4000) -> np.ndarray:
    """Urban-like grayscale texture, (size, size) uint8."""
    import cv2

    rng = np.random.default_rng(seed)
    world = np.full((size_px, size_px), 110, np.uint8)
    for _ in range(n_shapes):
        x, y = (int(v) for v in rng.integers(0, size_px, 2))
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


def synthetic_dem(size_px: int = 1024, seed: int = 11,
                  base_m: float = 0.0, relief_m: float = 12.0) -> np.ndarray:
    """Gentle terrain relief in meters, (size, size) float32.

    Smooth low-frequency hills (sum of a few random 2-D cosines) — enough
    relief to exercise the DEM z-lift in PnP without making the synthetic
    nadir renders (which assume a flat world) inconsistent beyond the
    accuracy gates' tolerance.
    """
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size_px, 0:size_px].astype(np.float32) / size_px
    dem = np.zeros((size_px, size_px), np.float32)
    for _ in range(4):
        fx, fy = rng.uniform(0.5, 2.0, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        dem += np.cos(2 * np.pi * fx * x + px) * np.cos(
            2 * np.pi * fy * y + py)
    dem -= dem.min()
    if dem.max() > 0:
        dem *= relief_m / dem.max()
    return (dem + base_m).astype(np.float32)


class _DemoGeoref:
    """Georeference of the demo world: a ~4 km square over KSQL airport
    (San Carlos, CA — the reference demo's location, ``docker/plans/``)."""

    left = -122.27
    top = 37.53
    size_deg = 0.04  # ~4.4 km N-S

    def georef(self, size_px: int):
        from gisnav_tpu.gis.geotiff import GeoRef

        return GeoRef(left=self.left, top=self.top,
                      gsd_lon=self.size_deg / size_px,
                      gsd_lat=self.size_deg / size_px)


DEMO_GEOREF = _DemoGeoref()
