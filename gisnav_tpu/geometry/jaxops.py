"""Device-side geometry primitives (jax.numpy, safe inside ``jax.jit``).

The subset of the geometry layer that runs inside the fused frame->geopose
device program: 2D warp matrices, affine application, Rodrigues conversions,
branchless matrix->quaternion, and WGS84<->ECEF. All functions are pure,
shape-static and differentiable where meaningful.
"""
from __future__ import annotations

import jax.numpy as jnp

from gisnav_tpu.geometry.crs import WGS84_A, WGS84_E2

__all__ = [
    "rot2d",
    "affine_apply",
    "rodrigues",
    "inverse_rodrigues",
    "matrix_to_quat_jax",
    "wgs84_to_ecef_jax",
    "ecef_to_wgs84_jax",
    "enu_to_ecef_matrix_jax",
]


def rot2d(theta: jnp.ndarray) -> jnp.ndarray:
    """2x2 counter-clockwise rotation matrix."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]])


def affine_apply(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply an affine matrix to points.

    :param m: (D, D+1) or (D+1, D+1) affine matrix
    :param pts: (..., D) points
    :return: (..., D) transformed points
    """
    d = pts.shape[-1]
    lin = m[:d, :d]
    off = m[:d, d] if m.shape[1] == d + 1 else m[:d, -1]
    return pts @ lin.T + off


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle rotation vector (3,) -> 3x3 rotation matrix.

    Numerically stable at theta -> 0 (uses sinc-style guards); equivalent to
    ``cv2.Rodrigues`` for the forward direction.
    """
    theta = jnp.linalg.norm(rvec)
    safe = jnp.maximum(theta, 1e-12)
    k = rvec / safe
    kx, ky, kz = k[0], k[1], k[2]
    kmat = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    r = jnp.eye(3) + s * kmat + (1.0 - c) * (kmat @ kmat)
    return jnp.where(theta < 1e-9, jnp.eye(3), r)


def inverse_rodrigues(r: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> axis-angle rotation vector (3,)."""
    cos_theta = jnp.clip((jnp.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    axis_raw = jnp.array(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]
    )
    sin_theta = jnp.sin(theta)
    axis = axis_raw / jnp.maximum(2.0 * sin_theta, 1e-12)
    return jnp.where(theta < 1e-9, jnp.zeros(3), theta * axis)


def matrix_to_quat_jax(m: jnp.ndarray) -> jnp.ndarray:
    """Branchless 3x3 rotation matrix -> (x, y, z, w) quaternion.

    Computes all four Shepperd branches and selects the best-conditioned one
    with ``where`` so the function stays traceable/vmappable.
    """
    t = jnp.trace(m)
    m00, m11, m22 = m[0, 0], m[1, 1], m[2, 2]

    # Four candidate (unnormalized) quaternions, one per dominant component
    qw = jnp.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1], 1.0 + t])
    qx = jnp.array(
        [1.0 + m00 - m11 - m22, m[0, 1] + m[1, 0], m[0, 2] + m[2, 0],
         m[2, 1] - m[1, 2]]
    )
    qy = jnp.array(
        [m[0, 1] + m[1, 0], 1.0 - m00 + m11 - m22, m[1, 2] + m[2, 1],
         m[0, 2] - m[2, 0]]
    )
    qz = jnp.array(
        [m[0, 2] + m[2, 0], m[1, 2] + m[2, 1], 1.0 - m00 - m11 + m22,
         m[1, 0] - m[0, 1]]
    )
    scores = jnp.array([1.0 + t, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22])
    cands = jnp.stack([qw, qx, qy, qz])
    best = jnp.argmax(scores)
    q = cands[best]
    q = q / jnp.linalg.norm(q)
    # Canonicalize sign (w >= 0)
    return q * jnp.sign(jnp.where(q[3] == 0, 1.0, q[3]))


def wgs84_to_ecef_jax(lon_deg, lat_deg, alt_m):
    """Geodetic (degrees, meters) -> ECEF meters; jnp mirror of crs.wgs84_to_ecef."""
    lon = jnp.radians(lon_deg)
    lat = jnp.radians(lat_deg)
    slat, clat = jnp.sin(lat), jnp.cos(lat)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * slat * slat)
    x = (n + alt_m) * clat * jnp.cos(lon)
    y = (n + alt_m) * clat * jnp.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt_m) * slat
    return jnp.stack([x, y, z], axis=-1)


def ecef_to_wgs84_jax(xyz: jnp.ndarray):
    """ECEF meters -> (lon deg, lat deg, alt m) via fixed-count Bowring
    iteration (jit-friendly; ~1e-9 deg after 4 iterations)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    p = jnp.hypot(x, y)
    lat = jnp.arctan2(z, p * (1.0 - WGS84_E2))
    for _ in range(4):
        slat = jnp.sin(lat)
        n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * slat * slat)
        lat = jnp.arctan2(z + WGS84_E2 * n * slat, p)
    slat = jnp.sin(lat)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * slat * slat)
    alt = p / jnp.cos(lat) - n
    lon = jnp.arctan2(y, x)
    return jnp.degrees(lon), jnp.degrees(lat), alt


def meters_per_degree_jax(lat_deg):
    """(meters per degree longitude, meters per degree latitude) at a
    latitude, from the WGS84 prime-vertical and meridian curvature radii."""
    lat = jnp.radians(lat_deg)
    slat = jnp.sin(lat)
    w2 = 1.0 - WGS84_E2 * slat * slat
    n = WGS84_A / jnp.sqrt(w2)  # prime vertical radius
    m = WGS84_A * (1.0 - WGS84_E2) / w2**1.5  # meridian radius
    deg = jnp.pi / 180.0
    return n * jnp.cos(lat) * deg, m * deg


def enu_to_ecef_matrix_jax(lon_deg, lat_deg) -> jnp.ndarray:
    """ENU->ECEF rotation at (lon, lat); jnp mirror of crs.enu_to_ecef_matrix."""
    lon = jnp.radians(lon_deg)
    lat = jnp.radians(lat_deg)
    slat, clat = jnp.sin(lat), jnp.cos(lat)
    slon, clon = jnp.sin(lon), jnp.cos(lon)
    return jnp.array(
        [
            [-slon, -slat * clon, clat * clon],
            [clon, -slat * slon, clat * slon],
            [0.0, clat, slat],
        ]
    )
