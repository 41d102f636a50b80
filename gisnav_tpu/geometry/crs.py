"""Coordinate reference system math (numpy, host-side; no PROJ dependency).

Replaces the reference's pyproj usage (``_transformations.py:330-393`` in
hmakelin/gisnav) with self-contained WGS84 formulas, and implements the same
``+proj=affine`` PROJ-string wire codec used to ship the per-orthoimage
pixel->WGS84 affine between nodes (``_transformations.py:274-327``).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "WGS84_A",
    "WGS84_F",
    "WGS84_B",
    "WGS84_E2",
    "wgs84_to_ecef",
    "ecef_to_wgs84",
    "enu_to_ecef_matrix",
    "haversine_m",
    "bbox_perimeter_meters",
    "affine_to_proj",
    "proj_to_affine",
    "pixel_to_wgs84_affine",
]

# WGS84 ellipsoid
WGS84_A = 6378137.0  # semi-major axis [m]
WGS84_F = 1.0 / 298.257223563  # flattening
WGS84_B = WGS84_A * (1.0 - WGS84_F)  # semi-minor axis [m]
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
_EP2 = WGS84_E2 / (1.0 - WGS84_E2)  # second eccentricity squared

EARTH_MEAN_RADIUS_M = 6371000.0


def wgs84_to_ecef(lon, lat, alt):
    """Geodetic (lon, lat in degrees, ellipsoidal alt in meters) -> ECEF meters.

    Same convention as the reference's pyproj-based ``wgs84_to_ecef``
    (``_transformations.py:330-347``): argument order lon, lat, alt.
    """
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    alt = np.asarray(alt, dtype=np.float64)
    slat, clat = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * slat * slat)
    x = (n + alt) * clat * np.cos(lon)
    y = (n + alt) * clat * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * slat
    return x, y, z


def ecef_to_wgs84(x, y, z):
    """ECEF meters -> geodetic (lon deg, lat deg, ellipsoidal alt m).

    Uses Vermeille's (2002) closed-form solution; accurate to sub-millimeter
    everywhere relevant (surface to LEO altitudes). Mirrors the reference's
    ``ecef_to_wgs84`` return order (lon, lat, alt).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    a2 = WGS84_A * WGS84_A
    e4 = WGS84_E2 * WGS84_E2

    p = (x * x + y * y) / a2
    q = (1.0 - WGS84_E2) * z * z / a2
    r = (p + q - e4) / 6.0
    s = e4 * p * q / (4.0 * r**3)
    t = np.cbrt(1.0 + s + np.sqrt(s * (2.0 + s)))
    u = r * (1.0 + t + 1.0 / t)
    v = np.sqrt(u * u + e4 * q)
    w = WGS84_E2 * (u + v - q) / (2.0 * v)
    k = np.sqrt(u + v + w * w) - w
    d = k * np.hypot(x, y) / (k + WGS84_E2)

    hyp = np.hypot(d, z)
    lat = 2.0 * np.arctan2(z, d + hyp)
    alt = (k + WGS84_E2 - 1.0) / k * hyp
    lon = np.arctan2(y, x)
    return np.degrees(lon), np.degrees(lat), alt


def enu_to_ecef_matrix(lon, lat) -> np.ndarray:
    """Rotation matrix mapping local ENU vectors at (lon, lat) to ECEF.

    Same matrix as the reference (``_transformations.py:369-393``).
    """
    lon = np.radians(float(lon))
    lat = np.radians(float(lat))
    slat, clat = np.sin(lat), np.cos(lat)
    slon, clon = np.sin(lon), np.cos(lon)
    return np.array(
        [
            [-slon, -slat * clon, clat * clon],
            [clon, -slat * slon, clat * slon],
            [0.0, clat, slat],
        ]
    )


def haversine_m(lat1, lon1, lat2, lon2) -> float:
    """Great-circle distance in meters on the mean-radius sphere.

    Matches the reference's map-scale computation
    (``core/gis_node.py:585-600``), which uses R = 6371 km.
    """
    lat1, lon1, lat2, lon2 = (np.radians(float(v)) for v in (lat1, lon1, lat2, lon2))
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return float(EARTH_MEAN_RADIUS_M * 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a)))


def bbox_perimeter_meters(left, bottom, right, top) -> float:
    """Perimeter of a WGS84 bounding box in meters (haversine edges).

    Reference semantics: ``_bounding_box_perimeter_meters``
    (``core/gis_node.py:602-616``).
    """
    width_m = haversine_m(bottom, left, bottom, right)
    height_m = haversine_m(bottom, left, top, left)
    return 2.0 * width_m + 2.0 * height_m


# ---------------------------------------------------------------------------
# Pixel->WGS84 affine CRS codec
# ---------------------------------------------------------------------------


def affine_to_proj(M: np.ndarray) -> str:
    """Encode a pixel->WGS84 affine as a ``+proj=affine`` PROJ string.

    Interop wire format identical to the reference
    (``_transformations.py:274-298``) so downstream consumers (and the
    reference's own tooling) can decode it: translation in ``+xoff/+yoff/+zoff``
    and the 3x3 linear part in ``+sIJ``.

    :param M: (3, 4) or (4, 4) affine matrix mapping homogeneous pixel
        coordinates (x, y, z=0, 1) to (lon, lat, alt_scale*z).
    """
    M = np.asarray(M, dtype=np.float64)
    assert M.shape in ((3, 4), (4, 4)), M.shape
    return (
        f"+proj=affine "
        f"+xoff={M[0, 3]} +yoff={M[1, 3]} +zoff={M[2, 3]} "
        f"+s11={M[0, 0]} +s12={M[0, 1]} +s13={M[0, 2]} "
        f"+s21={M[1, 0]} +s22={M[1, 1]} +s23={M[1, 2]} "
        f"+s31={M[2, 0]} +s32={M[2, 1]} +s33={M[2, 2]} "
        f"+no_defs +type=crs +datum=WGS84"
    )


def proj_to_affine(proj_str: str) -> np.ndarray:
    """Decode a ``+proj=affine`` PROJ string back into a (3, 4) matrix.

    Inverse of :func:`affine_to_proj` (reference
    ``_transformations.py:301-327``).
    """
    vals = {}
    for token in proj_str.split():
        if token.startswith("+") and "=" in token:
            key, _, val = token.partition("=")
            vals[key] = val
    def f(key):
        return float(vals[key])
    return np.array(
        [
            [f("+s11"), f("+s12"), f("+s13"), f("+xoff")],
            [f("+s21"), f("+s22"), f("+s23"), f("+yoff")],
            [f("+s31"), f("+s32"), f("+s33"), f("+zoff")],
        ]
    )


def pixel_to_wgs84_affine(height: int, width: int, left: float, bottom: float,
                          right: float, top: float) -> np.ndarray:
    """(4, 4) affine mapping orthoimage pixel coords to (lon, lat, z-meters).

    Pixel (0, 0) is the raster's top-left corner (lat = ``top``); x grows east
    and y grows south. The z scale converts raster "pixel altitude" units to
    meters using the bbox perimeter ratio, with a sign flip because the raster
    plane is East-South-Down while WGS84 is ENU. Capability parity with
    ``GISNode._calculate_affine_transformation_matrix``
    (``core/gis_node.py:545-636``), computed directly instead of via
    ``cv2.getPerspectiveTransform``.

    Note: the reference zips pixel corners ordered (TL, TR, BR, BL)
    (``gis_node.py:702-718``) against geo corners ordered (TL, BL, BR, TR)
    (``gis_node.py:566-582``), which transposes the linear part (lon varies
    with pixel *row* there). We use the geometrically conventional axis-aligned
    mapping instead: lon varies with pixel column, lat with pixel row.
    """
    aff = np.eye(4)
    aff[0, 0] = (right - left) / float(width - 1)
    aff[1, 1] = (bottom - top) / float(height - 1)  # y down -> lat down
    aff[0, 3] = left
    aff[1, 3] = top
    perimeter_px = 2.0 * height + 2.0 * width
    aff[2, 2] = -bbox_perimeter_meters(left, bottom, right, top) / perimeter_px
    return aff
