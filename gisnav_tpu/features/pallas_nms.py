"""Fused NMS + cell-max Pallas kernel for detector post-processing.

The XLA formulation of ``simple_nms`` + 4x4 block-max (features/nms.py)
costs ~3 ms at 1080p: the 9x9 ``reduce_window`` plus the
``(hb, 4, wb, 4)`` transpose/reshape chain are all layout-hostile. This
kernel does the whole thing in ONE pass over the heatmap:

- the 9x9 windowed max is separable: 8 lane rolls (dx) then 8 sublane
  slices (dy) of the row-max, all in VMEM;
- non-maxima are zeroed by the ``score == windowed_max`` test (same
  semantics as ``simple_nms``) with the image-border suppression folded in;
- the 4-lane cell compaction rides the MXU: a windowed x-max followed by a
  ``(w, wb)`` 0/1 selection matmul picks every 4th lane;
- the y-direction 4-row max is emitted at stride 1 (rows ``4k`` are the
  real cells) because Mosaic has no strided sublane slicing — the caller
  compacts rows with a cheap XLA slice.

The downstream top-k then runs over ``hb * wb`` cell maxima; the argmax
WITHIN each selected cell equals the raw-heatmap argmax (an NMS survivor's
9x9 window covers its whole 4x4 cell), so per-cell positions come from a
tiny post-top-k gather instead of a full-res argmax pass.

Replaces the detector post-processing the reference delegates to
cv2.SIFT / kornia ragged keypoint lists (``core/pose_node.py:207-241`` in
hmakelin/gisnav).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_cellmax_pallas", "nms_cellmax_supported"]

_RADIUS = 4
_BLOCK = 4


def nms_cellmax_supported(h: int, w: int, radius: int, block: int,
                          border: int) -> bool:
    if radius != _RADIUS or block != _BLOCK or border < 1:
        return False
    if h % 32 or w % 128 or w < 256:
        return False
    return _pick_tr(h) is not None


def _pick_tr(h: int):
    for tr in (128, 64, 32):
        if h % tr == 0:
            return tr
    return None


def nms_cellmax_pallas(heatmap: jnp.ndarray, border: int) -> jnp.ndarray:
    """(H, W) detector scores -> (H/4, W/4) NMS'd cell maxima."""
    h, w = heatmap.shape
    r = _RADIUS
    tr = _pick_tr(h)
    assert tr is not None, h
    wb = w // _BLOCK

    hp = jnp.zeros((h + 2 * r, w), jnp.float32)
    hp = hp.at[r:r + h, :].set(heatmap.astype(jnp.float32))
    # 0/1 lane-compaction matrix: column j picks lane 4j
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, wb), 0)
        == _BLOCK * jax.lax.broadcasted_iota(jnp.int32, (w, wb), 1)
    ).astype(jnp.float32)

    def kernel(h_ref, sel_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            h_ref.at[pl.ds(i * tr, tr + 2 * r), :], slab, sem,
        )
        cp.start()
        cp.wait()
        tile = slab[...]
        # x-direction 9-wide windowed max (lane rolls; row-end wraparound
        # only pollutes the `border`-suppressed edge columns)
        m1 = tile
        for dx in range(1, r + 1):
            m1 = jnp.maximum(m1, pltpu.roll(tile, dx, 1))
            m1 = jnp.maximum(m1, pltpu.roll(tile, w - dx, 1))
        # y-direction: windowed max over the 2r+1 row slices
        pooled = m1[0:tr, :]
        for dy in range(1, 2 * r + 1):
            pooled = jnp.maximum(pooled, m1[dy:dy + tr, :])
        core = tile[r:r + tr, :]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tr, w), 1)
        rows = i * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, w), 0)
        keep = (
            (core >= pooled)
            & (lanes >= border) & (lanes < w - border)
            & (rows >= border) & (rows < h - border)
        )
        nms = jnp.where(keep, core, 0.0)
        # 4-lane cell max, then MXU compaction to one lane per cell
        gx = nms
        for dx in range(1, _BLOCK):
            gx = jnp.maximum(gx, pltpu.roll(nms, w - dx, 1))
        # HIGHEST precision: the selection operand is exactly 0/1, so the
        # bf16-split passes reproduce the f32 scores bit-exactly (default
        # MXU precision truncates mantissas)
        cx = jax.lax.dot_general(
            gx, sel_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # 4-row windowed max at stride 1 (caller slices rows 0::4)
        cy = cx
        # rows beyond tr-3 read into the next tile's territory; clamp by
        # only using in-tile rows — rows 4k with 4k+3 <= tr-1 are exact,
        # and tr % 4 == 0 guarantees that for every real cell row
        for dy in range(1, _BLOCK):
            cy = jnp.maximum(cy[:, :], jnp.concatenate(
                [cx[dy:, :], jnp.zeros((dy, wb), jnp.float32)], axis=0
            ))
        out_ref[...] = cy

    out = pl.pallas_call(
        kernel,
        grid=(h // tr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, wb), lambda i: (i, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, wb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tr + 2 * r, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * h * w,
            bytes_accessed=(h + 2 * r) * w * 4 + h * wb * 4,
            transcendentals=0,
        ),
    )(hp, sel)

    return out[0::_BLOCK, :]
