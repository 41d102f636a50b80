"""Fused VGG-stage conv kernels (Pallas/Mosaic) for the SuperPoint trunk.

XLA lowers the 3x3 convs of the SuperPoint encoder at ~15-21 TF/s on v5e
regardless of layout/dtype (measured round 1: the conv trunk dominated the
23.5 ms frame at 1080p, PLAN.md). This kernel recasts each VGG stage

    conv3x3 + bias + relu [-> conv3x3 + bias + relu]

as ONE Mosaic program built on three ideas:

1. **Flat padded layout**: activations are ``(rows * S, L)`` matrices where
   each image row occupies ``S`` consecutive sublanes and (for 64-channel
   tensors) ``pack=2`` horizontally-adjacent pixels share a sublane (lane
   blocks of C channels each), keeping the lane dimension at the hardware's
   128 minimum. Zero pad columns provide SAME-padding reads.
2. **Vertical taps are free**: a ``dy`` shift is a row shift = a sublane
   slice at a multiple of ``S`` — aligned (S is a multiple of 8), so it
   costs nothing. Only the two ``dx = +-1`` pixel shifts materialize rolled
   copies (f32 sublane rotates — Mosaic's only supported rotate dtype).
3. **Phase-blocked tap matmuls**: each (dy, u) shift pair contracts with a
   ``(pack*C, pack*Cout)`` block matrix holding the taps that land on that
   shift, f32-accumulated on the MXU at full 128+ lane width.

Row AND width tiling (with 2-pixel halos DMA'd from HBM) bound VMEM and the
halo recompute overhead; the 2x2 maxpool between stages stays in XLA (one
cheap fused reduction over the kernel's output). Cascaded SAME correctness:
the intermediate activation re-zeroes everything outside the image (conv1
computes garbage in the global halo; conv2 must see zeros there).

Replaces the reference's OpenCV/torch conv stack on the hot path
(``core/pose_node.py:226-297`` in hmakelin/gisnav runs SIFT + kornia on
CPU/CUDA); see features/superpoint.py for the model that calls this.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv_stage",
    "conv_stage_pallas",
    "pallas_conv_supported",
    "vgg_stage_reference",
]


def _align(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pack_for(cin: int) -> int:
    """Pixels per sublane: keep the lane dim at >= 128."""
    return 2 if cin % 128 else 1


def _geometry(h: int, w: int, cin: int, cmid: int, cout: int,
              double: bool) -> Optional[Tuple[int, int, int, int]]:
    """Pick (tr, tcv, lp, wq_tot): row tile, valid pair-cols per width tile,
    pad pair-cols, total padded pair-cols. None if unsupported."""
    pack = _pack_for(cin)
    # pad/halo pair-cols each side: >= 2 px halo at any pack, and 8-aligned
    # DMA column slices need tcv % 8 == 0 and tcs = tcv + 2*lp % 8 == 0
    lp = 4
    wv = w // pack
    wq_tot = _align(lp + wv + lp, 8)
    # v5e has a large VMEM; measured: tr=64 x tcs=200 x 128-lane double-conv
    # tiles compile and run. Keep a margin for Mosaic's own buffers.
    budget = 48 * 1024 * 1024

    def vmem(tr, tcs):
        m = (tr + 4) * tcs
        l_in, l_mid, l_out = pack * cin, pack * cmid, pack * cout
        lmax = max(l_in, l_mid, l_out)
        return (
            m * l_in * 2  # slab bf16
            + 3 * m * lmax * 2  # three shifted bf16 buffers
            + m * lmax * 4  # f32 roll transient
            + m * max(l_mid, l_out) * 4  # live f32 accumulator
            + (m * l_mid * 2 if double else 0)  # h1 bf16
            + 2 * tr * (tcs - 2 * lp) * l_out * 2  # double-buffered out
        )

    # candidate width tiles: full width, else 8-aligned tcv dividing wv
    # (DMA column slice offsets must be provably 8-divisible); among the
    # VMEM-feasible (tr, tcv) pairs pick the one with the least halo
    # recompute overhead, tie-breaking toward fewer (larger) tiles
    tcvs = [wv] + [
        c for c in range(wv - 1, 7, -1) if wv % c == 0 and c % 8 == 0
    ]
    best = None
    for tcv in tcvs:
        tcs = wq_tot if tcv == wv else tcv + 2 * lp
        if tcs % 8:
            continue
        for tr in (128, 64, 32, 16, 8):
            if h % tr or vmem(tr, tcs) > budget:
                continue
            overhead = (tr + 4) / tr * tcs / max(tcv, 1)
            tiles = (h // tr) * (wv // tcv)
            key = (round(overhead, 3), tiles)
            if best is None or key < best[0]:
                best = (key, (tr, tcv, lp, wq_tot))
    return None if best is None else best[1]


def pallas_conv_supported(h: int, w: int, cin: int, cmid: int,
                          cout: int, double: bool = True) -> bool:
    if cin not in (64, 128, 256) or cmid % 64 or cout % 64:
        return False
    if _pack_for(cin) == 2 and (w % 2 or cmid % 64):
        return False
    return _geometry(h, w, cin, cmid, cout, double) is not None


def _schedule(w: jnp.ndarray, pack: int):
    """Regroup a (3, 3, Cin, Cout) kernel into per-(dy, u) block matrices.

    Output pixel phase e at pair-sublane q of row r reads source pixel
    ``pack*q + e + dx`` of row ``r+dy``: within-row pair shift
    ``u = (e + dx) // pack``, source phase ``(e + dx) % pack``. dy is
    applied as an aligned row slice, u as a +-1 sublane roll. Returns
    ``[((dy, u), (pack*Cin, pack*Cout))]``, traceable.
    """
    cin, cout = w.shape[2], w.shape[3]
    mats = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            for e in range(pack):
                u = (e + dx) // pack
                half = (e + dx) % pack
                key = (dy, u)
                m = mats.get(key)
                if m is None:
                    m = jnp.zeros((pack * cin, pack * cout), jnp.float32)
                mats[key] = m.at[
                    half * cin:(half + 1) * cin, e * cout:(e + 1) * cout
                ].add(w[dy + 1, dx + 1].astype(jnp.float32))
    return sorted(mats.items())


def _conv_taps(shifted, keys, w_ref, w_base: int, l_in: int, l_out: int,
               tcs: int, m_out: int):
    """acc = sum over (dy, u) of dot(shifted[u][(1+dy)*tcs : +m_out], W).

    ``shifted[u]`` are the three dx-shift buffers; the dy slice offsets are
    multiples of tcs (aligned, free)."""
    acc = jnp.zeros((m_out, l_out), jnp.float32)
    for j, (dy, u) in enumerate(keys):
        start = (1 + dy) * tcs
        acc = acc + jax.lax.dot_general(
            shifted[u][start:start + m_out, :],
            w_ref[w_base + j * l_in:w_base + (j + 1) * l_in, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _dx_shifts(a, compute_dtype):
    """Materialize the dx = -1, 0, +1 pixel-shift buffers of flat ``a``.

    shifted[u][p] = a[p + u]; Mosaic sublane rotate needs >=0 shift and
    32-bit data, so the two real shifts round-trip through f32."""
    m = a.shape[0]
    a32 = a.astype(jnp.float32)
    return {
        0: a,
        -1: pltpu.roll(a32, 1, 0).astype(compute_dtype),
        1: pltpu.roll(a32, m - 1, 0).astype(compute_dtype),
    }


def conv_stage_pallas(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: Optional[jnp.ndarray] = None,
    b2: Optional[jnp.ndarray] = None,
    *,
    pool: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """conv3x3+relu [-> conv3x3+relu] [-> maxpool2x2], image in/out.

    :param x: (H, W, Cin) activations (f32/bf16)
    :param w1: (3, 3, Cin, Cmid) HWIO; w2 optionally (3, 3, Cmid, Cout)
    :return: (H[/2], W[/2], Cout) float32
    """
    h, w, cin = x.shape
    cmid = w1.shape[3]
    double = w2 is not None
    cout = w2.shape[3] if double else cmid
    pack = _pack_for(cin)
    geo = _geometry(h, w, cin, cmid, cout, double)
    assert geo is not None, (h, w, cin, cmid, cout)
    tr, tcv, lp, wq_tot = geo
    wv = w // pack
    tcs = wq_tot if tcv == wv else tcv + 2 * lp
    l_in, l_mid, l_out = pack * cin, pack * cmid, pack * cout

    # --- pack + pad input to (h+4, wq_tot, l_in), zeros outside image ----
    xp = jnp.zeros((h + 4, wq_tot * pack, cin), compute_dtype)
    xp = xp.at[2:h + 2, lp * pack:lp * pack + w, :].set(
        x.astype(compute_dtype)
    )
    x_hbm = xp.reshape(h + 4, wq_tot, l_in)

    sched1 = _schedule(jnp.asarray(w1), pack)
    keys1 = tuple(k for k, _ in sched1)
    stacked = [m for _, m in sched1]
    if double:
        sched2 = _schedule(jnp.asarray(w2), pack)
        keys2 = tuple(k for k, _ in sched2)
        w2_base_rows = len(stacked) * l_in
        # pad conv2 blocks to the same row width? separate refs are simpler
        w2f = jnp.concatenate([m for _, m in sched2], axis=0).astype(
            compute_dtype
        )
        b2f = jnp.tile(b2.astype(jnp.float32), pack).reshape(1, l_out)
    else:
        keys2 = ()
        w2f = jnp.zeros((1, l_out), compute_dtype)
        b2f = jnp.zeros((1, l_out), jnp.float32)
    w1f = jnp.concatenate(stacked, axis=0).astype(compute_dtype)
    b1f = jnp.tile(b1.astype(jnp.float32), pack).reshape(1, l_mid)

    m_in = (tr + 4) * tcs
    m_mid = (tr + 2) * tcs
    m_out = tr * tcs

    n_cols = wv // tcv

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # single column tile: offset is literally 0 (tcv itself may be
        # unaligned then, and Mosaic cannot prove j*tcv % 8 == 0)
        col0 = 0 if n_cols == 1 else j * tcv
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(i * tr, tr + 4), pl.ds(col0, tcs), :],
            slab, sem,
        )
        cp.start()
        cp.wait()
        a = slab[...].reshape(m_in, l_in)

        s = _dx_shifts(a, compute_dtype)
        acc = _conv_taps(s, keys1, w1_ref, 0, l_in, l_mid, tcs, m_mid)
        h1 = jnp.maximum(acc + b1_ref[...], 0.0)

        if double:
            # cascaded SAME: zero h1 outside the image (global coords) so
            # conv2 sees SAME-padding zeros, not conv1's halo garbage.
            # h1 row 0 = local slab row 1 = global padded row i*tr + 1.
            q = jax.lax.broadcasted_iota(jnp.int32, (m_mid, l_mid), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (m_mid, l_mid), 1)
            gx = pack * (j * tcv + q % tcs - lp) + lane // cmid
            gy = i * tr + 1 + q // tcs - 2
            valid = (gx >= 0) & (gx < w) & (gy >= 0) & (gy < h)
            h1 = jnp.where(valid, h1, 0.0).astype(compute_dtype)
            s2 = _dx_shifts(h1, compute_dtype)
            acc = _conv_taps(s2, keys2, w2_ref, 0, l_mid, l_out, tcs, m_out)
            y = jnp.maximum(acc + b2_ref[...], 0.0)
        else:
            y = h1[tcs:(tr + 1) * tcs, :]

        # extract the tile's valid (tr, tcv) region; sublane offset lp is
        # misaligned, costing one small relayout copy per tile
        out_ref[...] = (
            y.reshape(tr, tcs, l_out)[:, lp:lp + tcv, :]
            .astype(compute_dtype)
        )

    out = pl.pallas_call(
        kernel,
        grid=(h // tr, wv // tcv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, tcv, l_out), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, wv, l_out), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 4, tcs, l_in), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * pack * h * w * cin * cmid * (2 if double else 1),
            bytes_accessed=(h + 4) * wq_tot * l_in * 2
            + h * wv * l_out * 4,
            transcendentals=0,
        ),
    )(x_hbm, w1f, b1f, w2f, b2f)

    img = out.reshape(h, w, cout)
    if pool:
        img = img.reshape(h // 2, 2, w // 2, 2, cout).max(axis=(1, 3))
    return img


def vgg_stage_reference(x, w1, b1, w2=None, b2=None, *, pool: bool):
    """XLA reference implementation for parity tests: (H, W, Cin) -> image."""
    def conv(v, wk, bk):
        out = jax.lax.conv_general_dilated(
            v.astype(wk.dtype)[None], wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        return jnp.maximum(
            out.astype(jnp.float32) + bk, 0.0
        ).astype(wk.dtype)

    y = conv(x, w1, b1)
    if w2 is not None:
        y = conv(y, w2, b2)
    if pool:
        hh, ww, c = y.shape
        y = y.reshape(hh // 2, 2, ww // 2, 2, c).max(axis=(1, 3))
    return y


# ---------------------------------------------------------------------------
# Autodiff-safe routing entry point
# ---------------------------------------------------------------------------

import functools


def _route(x, w1, b1, w2, b2, pool):
    import os

    h, w, cin = x.shape
    double = w2 is not None
    cmid = w1.shape[3]
    cout = w2.shape[3] if double else cmid
    if (
        jax.default_backend() not in ("cpu",)
        and not os.environ.get("GISNAV_TPU_FORCE_XLA_CONV")
        and pallas_conv_supported(h, w, cin, cmid, cout, double)
    ):
        return conv_stage_pallas(x, w1, b1, w2, b2, pool=pool)
    return vgg_stage_reference(
        x,
        w1.astype(jnp.bfloat16), b1,
        None if w2 is None else w2.astype(jnp.bfloat16), b2,
        pool=pool,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def conv_stage(x, w1, b1, w2=None, b2=None, pool=False):
    """conv3x3+relu [-> conv3x3+relu] [-> maxpool2x2], (H, W, Cin) image.

    Forward runs the fused Mosaic kernel on TPU (XLA reference elsewhere or
    for unsupported shapes); the backward pass recomputes through the XLA
    reference so training works without a hand-written conv VJP.
    """
    return _route(x, w1, b1, w2, b2, pool)


def _conv_stage_fwd(x, w1, b1, w2, b2, pool):
    return _route(x, w1, b1, w2, b2, pool), (x, w1, b1, w2, b2)


def _conv_stage_bwd(pool, residuals, g):
    x, w1, b1, w2, b2 = residuals
    if w2 is None:
        out, vjp = jax.vjp(
            lambda xx, a1, c1: vgg_stage_reference(
                xx, a1.astype(jnp.bfloat16), c1, pool=pool
            ),
            x, w1, b1,
        )
        dx, dw1, db1 = vjp(g.astype(out.dtype))
        return dx, dw1, db1, None, None
    out, vjp = jax.vjp(
        lambda xx, a1, c1, a2, c2: vgg_stage_reference(
            xx, a1.astype(jnp.bfloat16), c1, a2.astype(jnp.bfloat16), c2,
            pool=pool,
        ),
        x, w1, b1, w2, b2,
    )
    return vjp(g.astype(out.dtype))


conv_stage.defvjp(_conv_stage_fwd, _conv_stage_bwd)
