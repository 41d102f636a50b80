"""Fused VGG-stage conv kernels (Pallas/Mosaic) for the SuperPoint trunk.

XLA lowers the 3x3 convs of the SuperPoint encoder at ~21 TF/s on v5e
regardless of layout/dtype (measured round 1 — the trunk was 12.9 ms of the
23.5 ms frame at 1080p, PLAN.md). These kernels recast each VGG stage

    conv3x3 -> relu -> conv3x3 -> relu [-> maxpool 2x2]

as ONE Mosaic program built on two ideas:

1. **Flat padded layout**: activations live as ``(rows * Wp, C)`` matrices
   where each image row occupies ``Wp`` consecutive sublanes with zeroed pad
   columns (col 0 and cols > W). A 3x3 tap shift ``(dy, dx)`` is then a
   STATIC sublane roll by ``dy*Wp + dx`` — horizontal out-of-bounds reads
   land in the zero pad columns, so SAME-padding needs no masks on the input
   side.
2. **Tap-paired MXU matmuls**: the nine shifted copies contract with the
   ``(3, 3, Cin, Cout)`` kernel as four K=2*Cin matmuls plus one K=Cin
   matmul, accumulating in f32. For Cin=64 this doubles MXU utilization vs
   per-tap K=64 passes; for Cin=128 the pairs run at the full K=256.

The 2x2 maxpool runs in-kernel with a reshape trick: after pairing columns
via ``max(y, roll(y, -1))``, reshaping ``(M, C) -> (M/2, 2C)`` puts every
odd flat position in lanes ``[C:2C]``, so a static lane slice compacts the
stride-2 selection without gathers.

Replaces the reference's OpenCV/torch conv stack on the hot path
(``core/pose_node.py:226-297`` in hmakelin/gisnav runs SIFT + kornia on
CPU/CUDA); see features/superpoint.py for the model that calls this.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_vgg_stage",
    "pad_to_flat",
    "flat_to_image",
    "pallas_conv_supported",
]


def _align(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def padded_width(w: int) -> int:
    """Row stride Wp: >= w + 2 (one zero col each side), multiple of 8."""
    return _align(w + 2, 8)


def pallas_conv_supported(h: int, w: int, cin: int, cmid: int, cout: int,
                          pool: bool) -> bool:
    """Shapes the fused stage handles on TPU."""
    if cin % 64 or cmid % 64 or cout % 64:
        return False
    if pool and (h % 2 or w % 2):
        return False
    # row tiling must divide H (tile size chosen in fused_vgg_stage)
    return _pick_tile(h, w, cin, cmid) is not None


def _pick_tile(h: int, w: int, cin: int, cmid: int) -> Optional[int]:
    """Largest even row-tile T dividing h that fits the VMEM budget."""
    wp = padded_width(w)
    for t in (32, 16, 8, 4, 2):
        if h % t:
            continue
        m = (t + 4) * wp
        # slab bf16 + h bf16 + acc f32 + pair buffer bf16 + out block
        est = (
            m * cin * 2
            + m * cmid * 2
            + m * max(cin, cmid) * 4
            + m * 2 * max(cin, cmid) * 2
            + t * wp * cmid * 2
        )
        if est <= 11 * 1024 * 1024:
            return t
    return None


def pad_to_flat(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(H, W, C) image -> flat padded ((H+4) * Wp, C) with zero borders.

    Two zero rows top/bottom (halo for the two stacked convs) and zero pad
    columns per row.
    """
    h, w, c = x.shape
    wp = padded_width(w)
    out = jnp.zeros((h + 4, wp, c), dtype)
    out = out.at[2:h + 2, 1:w + 1, :].set(x.astype(dtype))
    return out.reshape((h + 4) * wp, c)


def flat_to_image(flat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Flat valid-rows output (h * Wp, C) -> (h, w, C)."""
    wp = padded_width(w)
    c = flat.shape[-1]
    return flat.reshape(h, wp, c)[:, 1:w + 1, :]


def _tap_offsets(wp: int) -> Tuple[int, ...]:
    """Flat sublane offsets of the nine 3x3 taps, HWIO tap order."""
    return tuple(
        (ky - 1) * wp + (kx - 1) for ky in range(3) for kx in range(3)
    )


def _conv9(a, w_ref, cin: int, cout: int, offsets, compute_dtype):
    """9-tap conv of flat activations ``a`` (M, Cin) against w (9*Cin, Cout),
    accumulated in f32 as 4 paired + 1 single MXU matmuls."""
    m = a.shape[0]
    acc = jnp.zeros((m, cout), jnp.float32)
    for i in range(4):
        t0, t1 = 2 * i, 2 * i + 1
        u = jnp.concatenate(
            [
                pltpu.roll(a, -offsets[t0], 0),
                pltpu.roll(a, -offsets[t1], 0),
            ],
            axis=1,
        )
        acc = acc + jax.lax.dot_general(
            u, w_ref[2 * i * cin:(2 * i + 2) * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + jax.lax.dot_general(
        pltpu.roll(a, -offsets[8], 0), w_ref[8 * cin:9 * cin, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc


def _colmask(m: int, wp: int, w: int):
    """(M, 1) bool mask: True on valid columns (1..w), False on pads."""
    xpos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wp
    return (xpos >= 1) & (xpos <= w)


def fused_vgg_stage(
    x_flat: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    h: int,
    w: int,
    pool: bool,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """conv3x3(w1)+relu -> conv3x3(w2)+relu [-> maxpool2x2] fused.

    :param x_flat: ((h+4) * Wp, Cin) flat padded input (see pad_to_flat)
    :param w1: (3, 3, Cin, Cmid) HWIO; w2: (3, 3, Cmid, Cout)
    :return: flat valid-rows output — (h * Wp, Cout) bf16 when pool=False,
        (h/2 * Wp/2-grid...) see below when pool=True: ((h//2) * Wpo, Cout)
        with Wpo = Wp // 2; valid pooled columns are 0..w//2-1 of each
        Wpo-stride row (garbage beyond — strip with XLA glue).
    """
    cin = w1.shape[2]
    cmid = w1.shape[3]
    cout = w2.shape[3]
    wp = padded_width(w)
    t = _pick_tile(h, w, cin, cmid)
    assert t is not None, (h, w, cin, cmid)
    if pool:
        assert h % 2 == 0 and w % 2 == 0 and wp % 2 == 0

    offsets = _tap_offsets(wp)
    w1f = w1.reshape(9 * cin, cmid).astype(compute_dtype)
    w2f = w2.reshape(9 * cmid, cout).astype(compute_dtype)
    b1f = b1.astype(jnp.float32).reshape(1, cmid)
    b2f = b2.astype(jnp.float32).reshape(1, cout)

    m_in = (t + 4) * wp  # slab rows per tile (2 halo rows each side)
    m_mid = m_in  # conv1 computed over the full slab (edges garbage)

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * t * wp, m_in), :], slab, sem
        )
        cp.start()
        cp.wait()
        a = slab[...]

        h1 = _conv9(a, w1_ref, cin, cmid, offsets, compute_dtype)
        h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
        # zero the pad columns so conv2's roll trick stays exact
        h1 = jnp.where(_colmask(m_mid, wp, w), h1, 0.0)
        h1 = h1.astype(compute_dtype)

        y = _conv9(h1, w2_ref, cmid, cout, offsets, compute_dtype)
        y = jnp.maximum(y + b2_ref[...], 0.0)

        if not pool:
            out_ref[...] = jnp.where(
                _colmask(t * wp, wp, w),
                y[2 * wp:(t + 2) * wp, :],
                0.0,
            ).astype(compute_dtype)
            return

        # --- fused 2x2 maxpool -----------------------------------------
        # column pairs (1,2),(3,4),...: z[p] = max(y[p], y[p+1]); odd flat
        # positions land in lanes [C:2C] after the (M, C) -> (M/2, 2C)
        # reshape, so a static lane slice compacts the stride-2 pick.
        yv = y[2 * wp:(t + 2) * wp, :]  # valid t rows
        z = jnp.maximum(yv, pltpu.roll(yv, -1, 0))
        zz = z.reshape(t * wp // 2, 2 * cout)[:, cout:]
        # row pairs: leading-dim stride-2 slices after splitting rows
        p2 = zz.reshape(t, wp // 2, cout)
        pooled = jnp.maximum(p2[0::2], p2[1::2])  # (t/2, wp/2, cout)
        out_ref[...] = pooled.reshape(t * wp // 4, cout).astype(compute_dtype)

    if pool:
        out_rows = t * wp // 4
        out_shape = (h * wp // 4, cout)
    else:
        out_rows = t * wp
        out_shape = (h * wp, cout)

    grid = (h // t,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, cout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((m_in, cin), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x_flat, w1f, b1f, w2f, b2f)


def vgg_stage_reference(x, w1, b1, w2, b2, *, pool: bool):
    """XLA reference implementation for parity tests: (H, W, Cin) -> image."""
    def conv(v, wk, bk):
        out = jax.lax.conv_general_dilated(
            v[None], wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        return jnp.maximum(out + bk, 0.0)

    y = conv(conv(x, w1, b1), w2, b2)
    if pool:
        hh, ww, c = y.shape
        y = y.reshape(hh // 2, 2, ww // 2, 2, c).max(axis=(1, 3))
    return y
