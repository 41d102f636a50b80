"""Fused affine raster warp for the pseudo-stereo couple (device, XLA).

The reference rebuilds its "reference raster" for matching by rotating the
orthoimage+DEM stack to camera yaw with ``cv2.warpAffine`` and center-cropping
to the camera resolution, caching per 45-degree bucket because the CPU warp is
expensive (``core/stereo_node.py:222-335`` in hmakelin/gisnav). On TPU the
whole rotate+crop+normalize is one cheap fused gather executed per frame, so
no rotation bucketing is needed; the same inverse-matrix contract (output
pixel -> original raster pixel) is preserved so the CRS affine can be rewritten
to stay valid after the warp.

All functions are jit-safe with static output shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rotation_about_center",
    "warp_affine",
    "rotate_and_crop_center",
    "compose_crs_after_warp",
]


def rotation_about_center(h: int, w: int, angle_deg: float) -> np.ndarray:
    """2x3 affine rotating an (h, w) image by ``angle_deg`` CCW about its
    integer center pixel (same convention as ``cv2.getRotationMatrix2D`` with
    scale 1 and center ``(w//2, h//2)``, see ``stereo_node.py:311-317``).

    The returned matrix maps ORIGINAL pixel coords -> ROTATED pixel coords.
    """
    cx, cy = w // 2, h // 2
    a = np.radians(angle_deg)
    c, s = np.cos(a), np.sin(a)
    # cv2 convention: positive angle rotates image content CCW, which in the
    # y-down pixel frame is the matrix [[c, s], [-s, c]].
    return np.array(
        [
            [c, s, (1.0 - c) * cx - s * cy],
            [-s, c, s * cx + (1.0 - c) * cy],
        ]
    )


def _bilinear_gather(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample ``src`` (H, W, C) at float coords, zero padding outside.

    Matches ``cv2.warpAffine`` defaults (bilinear, BORDER_CONSTANT 0).
    """
    h, w = src.shape[0], src.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = src[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def warp_affine(
    src: jnp.ndarray,
    dst_to_src: jnp.ndarray,
    out_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Warp ``src`` (H, W, C) so that ``out[y, x] = src(dst_to_src @ (x, y, 1))``.

    :param dst_to_src: 3x3 matrix mapping output pixel coords to source pixel
        coords (the INVERSE map, like cv2's WARP_INVERSE_MAP mode).
    :param out_shape: static (height, width) of the output.
    """
    oh, ow = out_shape
    src_f = src.astype(jnp.float32)
    m = dst_to_src.astype(jnp.float32)
    ys, xs = jnp.mgrid[0:oh, 0:ow]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    return _bilinear_gather(src_f, sx, sy)


def rotate_and_crop_center(
    stack: jnp.ndarray,
    angle_deg: float | jnp.ndarray,
    crop_shape: Tuple[int, int],
    zoom: float | jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, np.ndarray | jnp.ndarray]:
    """Rotate an image stack about its center and center-crop, in ONE gather.

    Device equivalent of ``StereoNode._rotate_and_crop_center``
    (``stereo_node.py:292-335``): returns the warped crop plus the matrix
    mapping cropped-frame pixel coords back to the original raster frame
    (the reference's ``inverse_matrix`` contract), needed to keep the
    pixel->WGS84 CRS affine valid.

    :param stack: (H, W, C) raster stack (e.g. orthoimage gray + DEM)
    :param angle_deg: rotation in degrees (CCW, cv2 convention); may be traced
    :param crop_shape: static (h, w) of the output crop
    :return: (cropped stack (h, w, C) float32, 3x3 cropped->original matrix)
    """
    h, w = int(stack.shape[0]), int(stack.shape[1])
    ch, cw = crop_shape
    cx, cy = w // 2, h // 2
    dx = cx - cw // 2
    dy = cy - ch // 2

    a = jnp.radians(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    if zoom is not None:
        # GSD-matched crop: the (ch, cw) output samples a (ch*zoom,
        # cw*zoom) centered window of the rotated raster, i.e. the map
        # resamples to the query camera's ground sample distance (zoom =
        # query_gsd / map_gsd; < 1 upsamples the map). The returned affine
        # keeps the crop->original contract, so CRS rewriting and PnP work
        # unchanged.
        z = jnp.asarray(zoom, jnp.float32)
        shift_scale = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        shift_scale = shift_scale.at[0, 0].set(z).at[1, 1].set(z)
        shift_scale = shift_scale.at[0, 2].set(cx - z * (cw / 2.0))
        shift_scale = shift_scale.at[1, 2].set(cy - z * (ch / 2.0))
        inv_rot = jnp.array(
            [
                [c, -s, cx - c * cx + s * cy],
                [s, c, cy - s * cx - c * cy],
                [0.0, 0.0, 1.0],
            ]
        )
        with jax.default_matmul_precision("float32"):
            cropped_to_original = inv_rot @ shift_scale
        out = warp_affine(stack, cropped_to_original, (ch, cw))
        return out, cropped_to_original
    # forward (original -> rotated) rotation about center, y-down frame
    fwd = jnp.array(
        [
            [c, s, (1.0 - c) * cx - s * cy],
            [-s, c, s * cx + (1.0 - c) * cy],
            [0.0, 0.0, 1.0],
        ]
    )
    # rotated -> original is the transpose of the linear part
    inv_rot = jnp.array(
        [
            [c, -s, cx - c * cx + s * cy],
            [s, c, cy - s * cx - c * cy],
            [0.0, 0.0, 1.0],
        ]
    )
    # cropped -> original: shift by crop offset, then undo rotation
    shift = jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy], [0.0, 0.0, 1.0]])
    with jax.default_matmul_precision("float32"):
        cropped_to_original = inv_rot @ shift
    del fwd
    out = warp_affine(stack, cropped_to_original, (ch, cw))
    return out, cropped_to_original


def compose_crs_after_warp(
    crs_affine_4x4: np.ndarray, cropped_to_original_3x3: np.ndarray
) -> np.ndarray:
    """Rewrite the pixel->WGS84 affine so it applies to the warped crop.

    ``new = crs @ embed(cropped->original)``: a point in the rotated/cropped
    reference frame is first mapped back into the original raster frame, then
    through the original CRS affine. Capability parity with
    ``StereoNode._world_to_reference_proj_str`` (``stereo_node.py:135-168``)
    minus the reference's x/y-swap matrix ``T``, which only compensates for
    the transposed corner pairing in its own GIS-node affine (see
    ``geometry.crs.pixel_to_wgs84_affine``).
    """
    m = np.asarray(cropped_to_original_3x3, dtype=np.float64)
    embed = np.eye(4)
    embed[:2, :2] = m[:2, :2]
    embed[:2, 3] = m[:2, 2]
    return np.asarray(crs_affine_4x4, dtype=np.float64) @ embed
