"""EGM96 geoid undulation lookup (ellipsoid height <-> AMSL).

The reference converts its vertical datum to the ellipsoid via pyproj's
EGM96 transform (``extensions/_mock_gps_node.py:57-65,392-408`` in
hmakelin/gisnav). Here a 0.5-degree EGM96 undulation grid (subsampled from
the public ``egm96_15.gtx``, max 1.2 m off the 15-minute grid — far inside
the 10 m SITL acceptance gate) is embedded in the package and interpolated
bilinearly; when the full-resolution PROJ grid is installed on the host it
is used instead.
"""
from __future__ import annotations

import os
import struct
from typing import Optional, Tuple

import numpy as np

__all__ = ["geoid_height", "load_grid", "EMBEDDED_GRID_PATH"]

EMBEDDED_GRID_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "egm96_grid.npz"
)
_PROJ_GTX_PATHS = (
    "/usr/share/proj/egm96_15.gtx",
    "/usr/local/share/proj/egm96_15.gtx",
)

_cache: Optional[Tuple[np.ndarray, float, float, float, float]] = None


def _load_gtx(path: str):
    """Parse a GTX vertical-grid file (big-endian header + f32 rows)."""
    with open(path, "rb") as f:
        hdr = f.read(40)
        lat0, lon0, dlat, dlon = struct.unpack(">4d", hdr[:32])
        nrows, ncols = struct.unpack(">2i", hdr[32:40])
        grid = np.frombuffer(
            f.read(nrows * ncols * 4), ">f4"
        ).reshape(nrows, ncols).astype(np.float32)
    return grid, lat0, lon0, dlat, dlon


def load_grid():
    """Load the geoid grid: host PROJ 15-minute GTX if present, else the
    embedded 0.5-degree grid."""
    global _cache
    if _cache is not None:
        return _cache
    for path in _PROJ_GTX_PATHS:
        if os.path.exists(path):
            _cache = _load_gtx(path)
            return _cache
    with np.load(EMBEDDED_GRID_PATH) as d:
        _cache = (
            d["grid"].astype(np.float32),
            float(d["lat0"]), float(d["lon0"]),
            float(d["dlat"]), float(d["dlon"]),
        )
    return _cache


def geoid_height(lon: float, lat: float) -> float:
    """EGM96 geoid undulation N (meters) at (lon, lat) degrees.

    ``alt_amsl = alt_ellipsoid - N``. Bilinear interpolation with longitude
    wraparound; latitude clamped to the grid.
    """
    grid, lat0, lon0, dlat, dlon = load_grid()
    nr, nc = grid.shape
    if not (np.isfinite(lat) and np.isfinite(lon)):
        # propagate rather than crash on int(nan); callers gate finiteness
        return float("nan")
    i = (float(lat) - lat0) / dlat
    j = ((float(lon) - lon0) % 360.0) / dlon
    i0 = int(np.clip(np.floor(i), 0, nr - 2))
    fi = np.clip(i - i0, 0.0, 1.0)
    j0 = int(np.floor(j)) % nc
    fj = j - np.floor(j)
    j1 = (j0 + 1) % nc
    return float(
        grid[i0, j0] * (1 - fi) * (1 - fj)
        + grid[i0, j1] * (1 - fi) * fj
        + grid[i0 + 1, j0] * fi * (1 - fj)
        + grid[i0 + 1, j1] * fi * fj
    )
