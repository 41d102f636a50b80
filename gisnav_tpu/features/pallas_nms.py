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

__all__ = ["nms_cellmax_pallas", "nms_cellmax_supported",
           "nms_select_pallas"]

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


def nms_select_pallas(heatmap: jnp.ndarray, border: int,
                      temperature: float = 0.1):
    """Single-pass NMS + cell-max + refined per-cell keypoint positions.

    Fuses what ``nms_cellmax_pallas`` + ``nms._cell_keypoint_table`` compute
    in separate full-resolution XLA passes (the table's three
    ``(hb, 4, wb, 4)`` transposes plus a 9-tap soft-argmax map dominated
    select cost: 2.9 ms of the 2048-kp selection's ~2.9 ms at 1080p). Here
    the 3x3 soft-argmax offsets and the per-cell position accumulation run
    on the tile while it is already in VMEM, and the cell compaction rides
    the same 0/1 selection matmul as the score path.

    Within a 4x4 cell every NMS survivor ties at the cell maximum (a
    survivor's 9x9 window covers the whole cell), so accumulating
    ``mask * position`` and dividing by the survivor count reproduces the
    argmax position exactly for the generic single-survivor case and
    averages the (equal-scored) rare ties.

    :param heatmap: (H, W) detector scores, H % 32 == 0, W % 128 == 0
    :return: ``(cell_max, cell_x, cell_y)`` each (H/4, W/4) float32;
        positions are sub-pixel refined, 0 for empty cells
    """
    h, w = heatmap.shape
    r = _RADIUS
    tr = _pick_tr(h)
    assert tr is not None, h
    wb = w // _BLOCK

    hp = jnp.zeros((h + 2 * r, w), jnp.float32)
    hp = hp.at[r:r + h, :].set(heatmap.astype(jnp.float32))
    # 0/1 lane-compaction matrix: column j SUMS lanes 4j..4j+3 (the score
    # path needs max, which the pre-matmul 4-lane roll-max provides; the
    # position/count paths need the plain cell sum)
    sel_max = (
        jax.lax.broadcasted_iota(jnp.int32, (w, wb), 0)
        == _BLOCK * jax.lax.broadcasted_iota(jnp.int32, (w, wb), 1)
    ).astype(jnp.float32)
    sel_sum = (
        jax.lax.broadcasted_iota(jnp.int32, (w, wb), 0) // _BLOCK
        == jax.lax.broadcasted_iota(jnp.int32, (w, wb), 1)
    ).astype(jnp.float32)
    inv_t = 1.0 / float(temperature)

    def kernel(h_ref, selm_ref, sels_ref, max_ref, x_ref, y_ref, cnt_ref,
               slab, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            h_ref.at[pl.ds(i * tr, tr + 2 * r), :], slab, sem,
        )
        cp.start()
        cp.wait()
        tile = slab[...]
        # --- NMS (identical to nms_cellmax_pallas) ---
        m1 = tile
        for dx in range(1, r + 1):
            m1 = jnp.maximum(m1, pltpu.roll(tile, dx, 1))
            m1 = jnp.maximum(m1, pltpu.roll(tile, w - dx, 1))
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

        # --- 3x3 soft-argmax offsets on the raw tile (VPU) ---
        def win(dy, dx):
            rows_ = slab[r + dy:r + dy + tr, :]
            if dx == 0:
                return rows_
            return pltpu.roll(rows_, (w - dx) % w, 1)

        m3 = core
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    m3 = jnp.maximum(m3, win(dy, dx))
        s = jnp.zeros((tr, w), jnp.float32)
        sx = jnp.zeros((tr, w), jnp.float32)
        sy = jnp.zeros((tr, w), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                e = jnp.exp((win(dy, dx) - m3) * inv_t)
                s = s + e
                sx = sx + e * dx
                sy = sy + e * dy
        dxm = jnp.clip(sx / s, -0.5, 0.5)
        dym = jnp.clip(sy / s, -0.5, 0.5)

        mask = jnp.where(keep & (core > 0.0), 1.0, 0.0)
        pxm = mask * (lanes.astype(jnp.float32) + dxm)
        pym = mask * (rows.astype(jnp.float32) + dym)

        # --- cell compaction ---
        # score: 4-lane roll-max then pick lane 4j (0/1 matmul, bit-exact)
        gx = nms
        for dx in range(1, _BLOCK):
            gx = jnp.maximum(gx, pltpu.roll(nms, w - dx, 1))

        def compact(m, sel_ref):
            return jax.lax.dot_general(
                m, sel_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        cx = compact(gx, selm_ref)
        xs = compact(pxm, sels_ref)
        ys = compact(pym, sels_ref)
        cs = compact(mask, sels_ref)

        # 4-row windowed reduce at stride 1 (caller slices rows 0::4):
        # max for the score, sum for positions/count
        def rowreduce(m, op, init):
            acc = m
            for dy in range(1, _BLOCK):
                acc = op(acc, jnp.concatenate(
                    [m[dy:, :], jnp.full((dy, wb), init, jnp.float32)],
                    axis=0,
                ))
            return acc

        max_ref[...] = rowreduce(cx, jnp.maximum, 0.0)
        x_ref[...] = rowreduce(xs, jnp.add, 0.0)
        y_ref[...] = rowreduce(ys, jnp.add, 0.0)
        cnt_ref[...] = rowreduce(cs, jnp.add, 0.0)

    outs = pl.pallas_call(
        kernel,
        grid=(h // tr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((h, wb), jnp.float32)
                   for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((tr + 2 * r, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # ~60 elementwise ops/pixel + 4 (tr,w)@(w,wb) compactions/tile
            flops=60 * h * w + 8 * h * w * wb,
            bytes_accessed=(h + 2 * r) * w * 4 + 4 * h * wb * 4,
            transcendentals=9 * h * w,
        ),
    )(hp, sel_max, sel_sum)

    cm, xs, ys, cs = (o[0::_BLOCK, :] for o in outs)
    denom = jnp.maximum(cs, 1.0)
    return cm, xs / denom, ys / denom
