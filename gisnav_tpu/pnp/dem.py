"""DEM elevation lookup for matched reference keypoints (device, XLA gather).

The reference builds 3D object points by indexing the DEM raster at the
floored reference-pixel coordinates of each match
(``core/_shared.py:95-102`` in hmakelin/gisnav). Here that is a masked gather
executed inside the fused device program.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gather_elevation", "keypoints_to_3d"]


def gather_elevation(dem: jnp.ndarray, pts_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample the DEM at floored pixel coordinates (reference semantics).

    :param dem: (H, W) elevation raster in raster z units
    :param pts_xy: (N, 2) reference pixel coordinates (x, y)
    :return: (N,) elevation values; out-of-raster points return 0
    """
    h, w = dem.shape
    x = jnp.floor(pts_xy[:, 0]).astype(jnp.int32)
    y = jnp.floor(pts_xy[:, 1]).astype(jnp.int32)
    valid = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    z = dem[jnp.clip(y, 0, h - 1), jnp.clip(x, 0, w - 1)]
    return jnp.where(valid, z, 0.0)


def keypoints_to_3d(pts_xy: jnp.ndarray, dem: jnp.ndarray | None) -> jnp.ndarray:
    """Lift 2D reference keypoints to 3D object points (x, y, z_dem).

    With ``dem=None`` the ground is treated as flat (z=0), matching the VO
    path (``core/twist_node.py:289`` passes a zero elevation).
    """
    if dem is None:
        z = jnp.zeros(pts_xy.shape[0], dtype=pts_xy.dtype)
    else:
        z = gather_elevation(dem, pts_xy).astype(pts_xy.dtype)
    return jnp.concatenate([pts_xy, z[:, None]], axis=1)
