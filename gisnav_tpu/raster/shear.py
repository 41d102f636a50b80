"""Three-shear rotation: TPU-fast rotate+crop without 2D gathers.

The direct bilinear warp (``raster.warp``) is a per-pixel 2D gather, which
XLA lowers poorly on TPU (~69 ms for a 2048^2 -> 1080p warp measured on
v5e). A rotation decomposes into three 1D shears

    R(theta) = ShearX(a) . ShearY(b) . ShearX(a),  a = -tan(theta/2),
                                                   b = sin(theta)

and each 1D shear is a minor-axis ``take_along_axis`` — the one gather shape
the TPU vectorizes well (plus cheap transposes for the y-shear). Angles
beyond +-45 degrees are first handled with exact rot90 steps. ~20x faster
than the 2D-gather path at large raster sizes.

Interpolation note: three chained linear resamples are not bit-identical to
one bilinear resample (slightly more smoothing); keypoint geometry (the
inverse-matrix contract) is identical. Use ``raster.warp`` when exact
single-pass bilinear values are required.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["rotate_and_crop_center_shear"]


def _resample_last_axis(img: jnp.ndarray, xf: jnp.ndarray) -> jnp.ndarray:
    """Linear resample along the LAST axis with zero padding.

    :param img: (..., H, W)
    :param xf: (H, W) float source x-coordinate for each output pixel
    """
    w = img.shape[-1]
    i0 = jnp.floor(xf)
    frac = xf - i0
    i0 = i0.astype(jnp.int32)

    def tap(i):
        valid = (i >= 0) & (i < w)
        ic = jnp.clip(i, 0, w - 1)
        idx = jnp.broadcast_to(ic, img.shape)
        v = jnp.take_along_axis(img, idx, axis=-1)
        return jnp.where(valid, v, 0.0)

    return tap(i0) * (1.0 - frac) + tap(i0 + 1) * frac


def _shear_x(img: jnp.ndarray, a, cx: float, cy: float,
             use_pallas: bool) -> jnp.ndarray:
    """out[y, x] = img[y, x + a*(y-cy)] — shear along the last axis."""
    del cx
    if use_pallas:
        from gisnav_tpu.raster.pallas_shear import shear_last_axis_pallas

        return shear_last_axis_pallas(img, a, cy)
    h, w = img.shape[-2], img.shape[-1]
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return _resample_last_axis(img, x + a * (y - cy))


def _shear_y(img: jnp.ndarray, b, cx: float, cy: float,
             use_pallas: bool) -> jnp.ndarray:
    """out[y, x] = img[y + b*(x-cx), x] via transpose + x-shear."""
    del cy
    t = jnp.swapaxes(img, -1, -2)  # (..., W, H)
    if use_pallas:
        from gisnav_tpu.raster.pallas_shear import shear_last_axis_pallas

        out_t = shear_last_axis_pallas(t, b, cx)
    else:
        h, w = t.shape[-2], t.shape[-1]
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # original x
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # original y
        out_t = _resample_last_axis(t, xx + b * (yy - cx))
    return jnp.swapaxes(out_t, -1, -2)


def _rot90_exact(img: jnp.ndarray, k4) -> jnp.ndarray:
    """Exact rotation by k*90 degrees about the INTEGER center (N//2, N//2)
    of an even-sized square (C, N, N) stack — pure transpose/flip/roll index
    permutations, no interpolation.

    Derived from the gather-path mapping at exact right angles; because the
    rotation center is N//2 (cv2 convention) rather than the array center
    (N-1)/2, each step needs a one-pixel roll with a zeroed wrap row/column.
    """
    n = img.shape[-1]

    def r0(x):
        return x

    def r90(x):  # out[y, x] = src[x, n - y]
        t = jnp.flip(jnp.swapaxes(x, -1, -2), axis=-2)
        t = jnp.roll(t, 1, axis=-2)
        return t.at[:, 0, :].set(0.0)

    def r180(x):  # out[y, x] = src[n - y, n - x]
        t = jnp.flip(x, axis=(-1, -2))
        t = jnp.roll(t, (1, 1), axis=(-2, -1))
        return t.at[:, 0, :].set(0.0).at[:, :, 0].set(0.0)

    def r270(x):  # out[y, x] = src[n - x, y]
        t = jnp.flip(jnp.swapaxes(x, -1, -2), axis=-1)
        t = jnp.roll(t, 1, axis=-1)
        return t.at[:, :, 0].set(0.0)

    del n
    return jax.lax.switch(k4, [r0, r90, r180, r270], img)


def rotate_and_crop_center_shear(
    stack: jnp.ndarray,
    angle_deg,
    crop_shape: Tuple[int, int],
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in alternative to ``warp.rotate_and_crop_center`` for SQUARE
    rasters: identical output geometry and inverse-matrix contract, 1D-shear
    implementation.

    :param stack: (H, H, C) square raster stack
    :param angle_deg: rotation degrees, CCW (cv2 convention); may be traced
    :param crop_shape: static (h, w) center crop
    :param use_pallas: run the shear gathers in the Mosaic kernel (default:
        automatically on TPU backends; the jnp fallback serves CPU tests)
    :return: (crop (h, w, C) float32, 3x3 cropped->original matrix)
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    hh, ww = int(stack.shape[0]), int(stack.shape[1])
    assert hh == ww, "shear rotation path requires a square raster"
    ch, cw = crop_shape
    cx, cy = ww // 2, hh // 2

    img = jnp.moveaxis(stack.astype(jnp.float32), -1, 0)  # (C, H, W)

    angle = jnp.asarray(angle_deg, jnp.float32)
    # exact (interpolation-free) 90-degree steps first, then ONE 3-shear
    # stage for the residual in [-45, 45] — only three resamples total, so
    # the chained-lerp smoothing stays close to a single bilinear pass
    k = jnp.round(angle / 90.0).astype(jnp.int32)
    residual = jnp.radians(angle - 90.0 * k.astype(jnp.float32))
    img = _rot90_exact(img, jnp.mod(k, 4))

    a = -jnp.tan(residual / 2.0)
    b = jnp.sin(residual)
    img = _shear_x(img, a, cx, cy, use_pallas)
    img = _shear_y(img, b, cx, cy, use_pallas)
    img = _shear_x(img, a, cx, cy, use_pallas)

    out_full = jnp.moveaxis(img, 0, -1)
    dx = cx - cw // 2
    dy = cy - ch // 2
    crop = jax.lax.dynamic_slice(
        out_full, (dy, dx, 0), (ch, cw, out_full.shape[-1])
    )

    # cropped -> original matrix: identical contract to the gather path
    aa = jnp.radians(angle)
    c, s = jnp.cos(aa), jnp.sin(aa)
    inv_rot = jnp.array(
        [
            [c, -s, cx - c * cx + s * cy],
            [s, c, cy - s * cx - c * cy],
            [0.0, 0.0, 1.0],
        ]
    )
    shift = jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy], [0.0, 0.0, 1.0]])
    # f32: the translation entries are raster-scale; bf16 steps them by 8 px
    with jax.default_matmul_precision("float32"):
        return crop, inv_rot @ shift
