"""Pallas TPU kernel for the 1D shear resample.

XLA lowers both arbitrary 2D gathers (~69 ms) and minor-axis
``take_along_axis`` (~2.7 s!) catastrophically for the rotate+crop warp at
2048^2, so the shear passes of the 3-shear rotation (``raster.shear``) run
as a Mosaic kernel.

Mosaic's ``dynamic_gather`` can only gather within ONE 128-lane vreg, so the
kernel tiles each row-block into 128-column output tiles, dynamically slices
a 256-column source window whose base absorbs the block's integer shift
range, and composes the lane gather from the window's two vregs with a
select. Preconditions (asserted by the caller): |shift| <= 0.99 px/row and a
128-row block, so the per-block shift range (<=127 px) plus the 128-px tile
always fits the 256-px window.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["shear_last_axis_pallas"]

_BLK = 128  # rows per program
_TILE = 128  # output columns per inner step
_WIN = 384  # source window per inner step (3 vregs, 128-aligned)


def shear_last_axis_pallas(img: jnp.ndarray, shift, center_row: float
                           ) -> jnp.ndarray:
    """Shear resample along the last axis of a (C, H, W) stack.

    ``out[c, r, x] = img[c, r, x + shift * (r - center_row)]`` with linear
    interpolation and zero padding (cv2 BORDER_CONSTANT semantics).

    :param shift: traced f32 scalar, |shift| < 1 px per row (guaranteed by
        the 4-stage 3-shear decomposition: |a| <= tan(22.5), |b| <= sin(45))
    """
    c, h, w = img.shape
    assert h % _BLK == 0 and w % _TILE == 0 and w >= _WIN, (h, w)
    shift_arr = jnp.reshape(jnp.asarray(shift, jnp.float32), (1,))

    def kernel(shift_ref, src_ref, out_ref):
        s = shift_ref[0]
        r0 = pl.program_id(1) * _BLK
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (_BLK, _TILE), 0)
            .astype(jnp.float32) + r0
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _TILE), 1).astype(
            jnp.float32
        )
        rshift = s * (rows - center_row)  # (BLK, TILE), row-constant
        # integer base of the block's shift range (rows are monotonic)
        e0 = s * (r0 - center_row)
        e1 = s * (r0 + _BLK - 1 - center_row)
        bmin = jnp.floor(jnp.minimum(e0, e1)).astype(jnp.int32)

        def col_tile(t, _):
            c0 = t * _TILE
            xf = c0.astype(jnp.float32) + cols + rshift  # global source x
            i0 = jnp.floor(xf)
            frac = xf - i0
            i0 = i0.astype(jnp.int32)

            # align the window base to 128 lanes (vector loads require it);
            # the 384-px window absorbs tile (128) + shift range (<=127) +
            # alignment slack (<=127)
            start = jnp.clip(c0 + bmin, 0, w - _WIN)
            start = pl.multiple_of((start // _TILE) * _TILE, _TILE)
            window = src_ref[0, :, pl.ds(start, _WIN)]  # (BLK, 384)
            w0 = window[:, :_TILE]
            w1 = window[:, _TILE:2 * _TILE]
            w2 = window[:, 2 * _TILE:]

            def tap(ig):
                valid = (ig >= 0) & (ig < w)
                il = jnp.clip(ig - start, 0, _WIN - 1)
                g0 = jnp.take_along_axis(
                    w0, jnp.clip(il, 0, _TILE - 1), axis=1
                )
                g1 = jnp.take_along_axis(
                    w1, jnp.clip(il - _TILE, 0, _TILE - 1), axis=1
                )
                g2 = jnp.take_along_axis(
                    w2, jnp.clip(il - 2 * _TILE, 0, _TILE - 1), axis=1
                )
                v = jnp.where(il < _TILE, g0,
                              jnp.where(il < 2 * _TILE, g1, g2))
                return jnp.where(valid, v, 0.0)

            out_ref[0, :, pl.ds(c0, _TILE)] = (
                tap(i0) * (1.0 - frac) + tap(i0 + 1) * frac
            )
            return 0

        jax.lax.fori_loop(0, w // _TILE, col_tile, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, h // _BLK),
        in_specs=[
            pl.BlockSpec((1, _BLK, w), lambda ci, ri, sref: (ci, ri, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLK, w), lambda ci, ri, sref: (ci, ri, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
    )(shift_arr, img.astype(jnp.float32))
