"""Fused VGG-stage conv kernels (Pallas/Mosaic) for the SuperPoint trunk.

XLA lowers the 3x3 convs of the SuperPoint encoder at ~15-21 TF/s on v5e
regardless of layout/dtype (measured round 1: the conv trunk dominated the
frame at 1080p). This kernel recasts each VGG stage

    conv3x3 + bias + relu [-> conv3x3 + bias + relu]

as ONE Mosaic program built on four ideas:

1. **Flat padded layout**: activations are ``(rows * S, L)`` matrices where
   each image row occupies ``S`` consecutive sublanes and (for 64-channel
   tensors) ``pack=2`` horizontally-adjacent pixels share a sublane (lane
   blocks of C channels each), keeping the lane dimension at the hardware's
   128 minimum. Zero pad columns provide SAME-padding reads.
2. **Vertical taps are free**: a ``dy`` shift is a row shift = a sublane
   slice at a multiple of ``S`` — aligned (S is a multiple of 8), so it
   costs nothing.
3. **Split neighbor operand**: the packed activation ``a`` is consumed in
   place and only the small ``pn = [prev-pixel | next-pixel]`` block —
   ``(m, 2*Cin)`` lanes, two +-1 *sublane-slice* shifts of one pixel's
   channel block (bf16 sublane slices are cheap; Mosaic's rotate would
   force an f32 round-trip) — is materialized per conv. Each ``dy`` then
   contracts in TWO full-k MXU matmuls (``a @ W_a[dy]`` at k = p*Cin and
   ``pn @ W_pn[dy]`` at k = 2*Cin) against row slices of one weight
   operand whose density is 3p/(p+2)p: 100% at pack=1, 75% at pack=2 —
   versus 50% for the earlier per-(dy,u) pair-phase blocks (PLAN.md
   round-2 analysis). An earlier version widened ``a`` into a dense
   ``[a | pn]`` operand; skipping that copy saved ~0.7 ms/frame at 1080p.
4. **Double-buffered slab DMA**: each grid step prefetches the next tile's
   input slab from HBM while the current tile computes, hiding HBM latency
   behind the MXU (the round-2 kernel's start-wait-compute serialization
   left the MXU idle for entire DMA round-trips on small tiles).

Row AND width tiling (with 2-pixel halos DMA'd from HBM) bound VMEM; row
tiles may be any divisor of H (h=136 feature maps tile at 34 rows, not 8).
The 2x2 maxpool between stages stays in XLA (one cheap fused reduction over
the kernel's output). Cascaded SAME correctness: the intermediate
activation re-zeroes everything outside the image (conv1 computes garbage
in the global halo; conv2 must see zeros there).

Replaces the reference's OpenCV/torch conv stack on the hot path
(``core/pose_node.py:226-297`` in hmakelin/gisnav runs SIFT + kornia on
CPU/CUDA); see features/superpoint.py for the model that calls this.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv_stage",
    "conv_stage_pallas",
    "pallas_conv_supported",
    "stem_stage",
    "stem_stage_pallas",
    "stem_supported",
    "vgg_stage_reference",
]


def _align(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pack_for(cin: int) -> int:
    """Pixels per sublane: keep the lane dim at >= 128."""
    return 2 if cin % 128 else 1


def _row_tiles(h: int) -> list:
    """Candidate row-tile heights: divisors of h, largest first."""
    return [t for t in range(min(h, 256), 7, -1) if h % t == 0]


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
    # v5e VMEM budget with a margin for Mosaic's own pipeline buffers
    budget = 48 * 1024 * 1024

    def vmem(tr, tcs, tcv):
        m = (tr + 4) * tcs
        l_in, l_mid, l_out = pack * cin, pack * cmid, pack * cout
        b_in = 2 * cin   # conv1 prev/next (pn) operand lanes
        b_mid = 2 * cmid
        total = (
            2 * m * l_in * 2           # double-buffered input slab (bf16)
            + m * b_in * 2             # conv1 pn operand
            + m * max(l_mid, l_out) * 4  # live f32 accumulator
            + 2 * m * cin * 2          # prev/next transients
            + 2 * tr * tcv * l_out * 2  # double-buffered out
        )
        if double:
            total += m * l_mid * 2 + m * b_mid * 2 + 2 * m * cmid * 2
        return total

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
        for tr in _row_tiles(h):
            if vmem(tr, tcs, tcv) > budget:
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


def _w_operand(w: jnp.ndarray, pack: int) -> jnp.ndarray:
    """Regroup a (3, 3, Cin, Cout) kernel for the neighbor-operand matmul.

    Operand lane block ``t`` holds source pixel ``pack*q + t`` for
    ``t < pack``, pixel ``pack*q - 1`` at ``t == pack`` (prev) and pixel
    ``pack*q + pack`` at ``t == pack + 1`` (next). Output phase ``e`` at
    pair-sublane ``q`` needs tap ``dx = src_pixel - (pack*q + e)``. Returns
    the three per-dy matrices stacked on rows:
    ``(3 * (pack+2) * Cin, pack * Cout)``, traceable.
    """
    cin, cout = w.shape[2], w.shape[3]
    blocks = []
    for dy in (-1, 0, 1):
        wd = jnp.zeros(((pack + 2) * cin, pack * cout), jnp.float32)
        for t in range(pack + 2):
            src = t if t < pack else (-1 if t == pack else pack)
            for e in range(pack):
                dx = src - e
                if -1 <= dx <= 1:
                    wd = wd.at[
                        t * cin:(t + 1) * cin, e * cout:(e + 1) * cout
                    ].set(w[dy + 1, dx + 1].astype(jnp.float32))
        blocks.append(wd)
    return jnp.concatenate(blocks, axis=0)


def _valid_slab(n_rows: int, n_cols: int, rows: int, tcs: int, lp: int,
                tcv: int, wv: int, h: int, row0: int, tr: int) -> jnp.ndarray:
    """(n_rows * n_cols, rows, tcs, 1) f32 validity of the intermediate
    activation, precomputed at trace time (static shapes -> a compile-time
    constant; one broadcast VPU multiply in-kernel replaces the previous
    per-element iota + non-power-of-2 div/mod address math, which measured
    0.4 ms/frame at 1080p on v5e).

    Local slab row ``r`` of row-tile ``i`` is image row ``i*tr + r - row0``;
    slab pair-column ``q`` of width-tile ``j`` is image pair-column
    ``j*tcv + q - lp``. Pair-column validity is pack-phase independent
    (``x = pack*qcol + e`` with ``e < pack`` crosses 0 or ``w = pack*wv``
    only via ``qcol``)."""
    import numpy as np

    ii = np.arange(n_rows)[:, None] * tr + np.arange(rows)[None, :] - row0
    rowv = (ii >= 0) & (ii < h)                      # (n_rows, rows)
    jj = np.arange(n_cols)[:, None] * tcv + np.arange(tcs)[None, :] - lp
    colv = (jj >= 0) & (jj < wv)                     # (n_cols, tcs)
    m = rowv[:, None, :, None] & colv[None, :, None, :]
    return jnp.asarray(
        m.reshape(n_rows * n_cols, rows, tcs, 1).astype(np.float32)
    )


def _conv_mxu_split(a: jnp.ndarray, pn: jnp.ndarray, w_ref, l_in: int,
                    cin: int, l_blk: int, l_out: int, tcs: int,
                    m_out: int, base: int) -> jnp.ndarray:
    """acc = sum over dy of the neighbor-operand contraction, with the
    operand SPLIT: ``a`` (m, pack*cin) is consumed in place (an earlier
    version copied it into a widened ``[a | prev | next]`` operand —
    ~0.7 ms/frame of VMEM traffic at 1080p) and only the small
    ``pn = [prev | next]`` (m, 2*cin) block is materialized. Each dy
    contracts in two full-k MXU matmuls against row slices of the same
    ``_w_operand`` matrix (rows [0, pack*cin) are the a-part taps, rows
    [pack*cin, (pack+2)*cin) the prev/next taps). The dy slice offsets are
    multiples of tcs (8-aligned, free); ``base`` is the row offset of
    output row 0 within the operand (1 for a 1-row halo, 2 for the stem
    kernel's 2-row-halo intermediate)."""
    acc = jnp.zeros((m_out, l_out), jnp.float32)
    for idx, dy in enumerate((-1, 0, 1)):
        start = (base + dy) * tcs
        r0 = idx * l_blk
        acc = acc + jax.lax.dot_general(
            a[start:start + m_out, :],
            w_ref[r0:r0 + l_in, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            pn[start:start + m_out, :],
            w_ref[r0 + l_in:r0 + l_in + 2 * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _build_pn(a: jnp.ndarray, cin: int) -> jnp.ndarray:
    """The prev/next half of the neighbor operand: (m, 2*cin)
    ``[prev-pixel | next-pixel]`` one-sublane-shifted slices of ``a``.

    prev[p] = a[p-1, last-pixel block], next[p] = a[p+1, first-pixel
    block]. Row 0 / row m-1 pick up a clamped duplicate; those rows only
    ever feed pad-column or halo outputs, which the caller discards
    (pair-column 0 is a zero-pad column in every row, so within-row
    neighbor reads never cross a row boundary for kept outputs)."""
    prev = jnp.concatenate([a[:1, -cin:], a[:-1, -cin:]], axis=0)
    nxt = jnp.concatenate([a[1:, :cin], a[-1:, :cin]], axis=0)
    return jnp.concatenate([prev, nxt], axis=1)


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
    bl_in, bl_mid = (pack + 2) * cin, (pack + 2) * cmid

    # --- pack + pad input to (h+4, wq_tot, l_in), zeros outside image ----
    xp = jnp.zeros((h + 4, wq_tot * pack, cin), compute_dtype)
    xp = xp.at[2:h + 2, lp * pack:lp * pack + w, :].set(
        x.astype(compute_dtype)
    )
    x_hbm = xp.reshape(h + 4, wq_tot, l_in)

    w1f = _w_operand(jnp.asarray(w1), pack).astype(compute_dtype)
    b1f = jnp.tile(b1.astype(jnp.float32), pack).reshape(1, l_mid)
    if double:
        w2f = _w_operand(jnp.asarray(w2), pack).astype(compute_dtype)
        b2f = jnp.tile(b2.astype(jnp.float32), pack).reshape(1, l_out)
    else:
        w2f = jnp.zeros((1, l_out), compute_dtype)
        b2f = jnp.zeros((1, l_out), jnp.float32)

    m_in = (tr + 4) * tcs
    m_mid = (tr + 2) * tcs
    m_out = tr * tcs

    n_rows = h // tr
    n_cols = wv // tcv
    n_total = n_rows * n_cols
    # fuse the 2x2 maxpool into the kernel when the layout allows it: at
    # pack=2 the x-pair max is the two lane phase blocks and the row-pair
    # max is adjacent tcs-row blocks (same trick as the stem kernel) — the
    # full-res activation then never round-trips HBM (measured 0.35 ms of
    # unpack-reshape + XLA pool glue at stage2's 544x960x64, v5e)
    fuse_pool = pool and pack == 2 and tr % 2 == 0

    if double:
        mk = _valid_slab(n_rows, n_cols, tr + 2, tcs, lp, tcv, wv, h,
                         row0=1, tr=tr)
    else:  # unused placeholder (kept positional for a single kernel body)
        mk = jnp.ones((n_rows * n_cols, 1, tcs, 1), jnp.float32)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, mk_ref,
               out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        step = i * n_cols + j

        def get_dma(slot, s):
            ii = s // n_cols
            jj = s % n_cols
            # single column tile: offset is literally 0 (tcv itself may be
            # unaligned then, and Mosaic cannot prove jj*tcv % 8 == 0)
            col0 = 0 if n_cols == 1 else pl.multiple_of(jj * tcv, 8)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(ii * tr, tr + 4), pl.ds(col0, tcs), :],
                slab.at[slot], sem.at[slot],
            )

        # double-buffered slab: prefetch tile step+1 while computing step
        @pl.when(step == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(step + 1 < n_total)
        def _():
            get_dma((step + 1) % 2, step + 1).start()

        get_dma(step % 2, step).wait()
        a = slab[step % 2].reshape(m_in, l_in)

        acc = _conv_mxu_split(a, _build_pn(a, cin), w1_ref, l_in, cin,
                              bl_in, l_mid, tcs, m_mid, base=1)
        h1 = jnp.maximum(acc + b1_ref[...], 0.0)

        if double:
            # cascaded SAME: zero h1 outside the image (global coords) so
            # conv2 sees SAME-padding zeros, not conv1's halo garbage.
            # One broadcast multiply by the precomputed validity slab
            # (h1 row 0 = local slab row 1 = global padded row i*tr + 1).
            h1 = (h1.reshape(tr + 2, tcs, l_mid) * mk_ref[0]).reshape(
                m_mid, l_mid
            ).astype(compute_dtype)
            acc = _conv_mxu_split(h1, _build_pn(h1, cmid), w2_ref, l_mid,
                                  cmid, bl_mid, l_out, tcs, m_out, base=1)
            y = jnp.maximum(acc + b2_ref[...], 0.0)
        else:
            y = h1[tcs:(tr + 1) * tcs, :]

        if fuse_pool:
            # 2x2 maxpool fused: x-pairs are the two cout-lane phase
            # blocks; y-pairs are adjacent tcs-row blocks. One misaligned
            # lp-slice on the whole tile, then aligned pairwise maxes
            # (unrolled — Mosaic has no strided 3D slicing).
            yx = jnp.maximum(y[:, :cout], y[:, cout:])  # (m_out, cout)
            ys = yx.reshape(tr, tcs, cout)[:, lp:lp + tcv, :].astype(
                compute_dtype
            )
            for kk in range(tr // 2):
                out_ref[kk, :, :] = jnp.maximum(ys[2 * kk], ys[2 * kk + 1])
        else:
            # extract the tile's valid (tr, tcv) region; sublane offset lp
            # is misaligned, costing one small relayout copy per tile
            out_ref[...] = (
                y.reshape(tr, tcs, l_out)[:, lp:lp + tcv, :]
                .astype(compute_dtype)
            )

    out = pl.pallas_call(
        kernel,
        grid=(n_rows, n_cols),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1,) + mk.shape[1:],
                lambda i, j: (i * n_cols + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tr // 2, tcv, cout) if fuse_pool else (tr, tcv, l_out),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (h // 2, wv, cout) if fuse_pool else (h, wv, l_out),
            compute_dtype,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tr + 4, tcs, l_in), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * wv * (pack + 2) * cin * pack * cmid * 3
            * (2 if double else 1),
            bytes_accessed=(h + 4) * wq_tot * l_in * 2
            + h * wv * l_out * 4,
            transcendentals=0,
        ),
    )(x_hbm, w1f, b1f, w2f, b2f, mk)

    if fuse_pool:
        return out  # already pooled: (h/2, w/2, cout) — wv == w/2 at pack=2
    img = out.reshape(h, w, cout)
    if pool:
        img = img.reshape(h // 2, 2, w // 2, 2, cout).max(axis=(1, 3))
    return img


# ---------------------------------------------------------------------------
# Fused stem: conv1a (1 -> 64) + conv1b (64 -> 64) in one kernel
# ---------------------------------------------------------------------------
#
# The 1-channel stem conv is a disaster for XLA's conv emitter next to the
# Pallas stages (measured round 2: 9.9 ms for the conv + 3.8 ms of layout
# copies at 1080p — the C=1 NHWC layout uses 1/128 lanes). Instead, the host
# builds a tiny im2col tensor P once per frame: for every (row, pixel-pair)
# the 3x4 = 12 raw pixels covering both pixels' 3x3 neighborhoods, padded to
# 16 lanes. conv1a then becomes ONE (m, 16) @ (16, 128) MXU matmul inside
# the stage-1 kernel, producing the packed pair-channel intermediate
# directly — the (H, W, 64) stem activation never exists in HBM.


def _stem_geometry(h: int, w: int) -> Optional[Tuple[int, int, int]]:
    """(tr, lp, wq_tot) for the fused stem; full-width tiles only (the
    im2col slab is DMA'd as a lane slice of the (16, m_total) flat P, so
    wq_tot is 32-aligned to keep every tile's lane offset/extent a
    multiple of 128)."""
    if h % 8 or w % 2:
        return None
    lp = 4
    wv = w // 2
    wq_tot = _align(lp + wv + lp, 32)
    tcs = wq_tot
    budget = 44 * 1024 * 1024
    for tr in _row_tiles(h):
        # the P slab is DMA'd as a lane slice of the flat (16, m_total) P:
        # every tile's lane offset (tr*tcs) AND extent ((tr+4)*tcs) must be
        # 128-aligned, and pooled output tiles need even tr
        if tr > 64 or tr % 2 or (tr * tcs) % 128 or ((tr + 4) * tcs) % 128:
            continue
        m_in = (tr + 4) * tcs
        m_out = tr * tcs
        vmem = (
            2 * m_in * 16 * 2  # double-buffered P slab (taps in sublanes)
            + m_in * 128 * (4 + 2)  # h1 f32 acc + bf16
            + m_in * 128 * 2  # conv1b pn operand
            + 2 * m_in * 64 * 2  # prev/next transients
            + m_out * 128 * 4  # conv1b f32 accumulator
            + 2 * tr * wv * 128 * 2  # double-buffered out
        )
        if vmem <= budget:
            return tr, lp, wq_tot
    return None


def stem_supported(h: int, w: int) -> bool:
    return _stem_geometry(h, w) is not None


def _stem_im2col(img: jnp.ndarray, lp: int, wq_tot: int,
                 compute_dtype) -> jnp.ndarray:
    """Transposed (12->16)-tap patch tensor: P[(dy+1)*4 + d, r*wq_tot + q]
    = img(r - 2 + dy, 2*(q - lp) + d - 1), zero outside the image. Taps
    live in sublanes so tile DMAs are plain 128-aligned lane slices.

    Built from exactly TWO strided lane de-interleaves (the even/odd pixel
    phases) plus one unaligned lane shift each; the 12 taps are then plain
    row-shifted views. The previous per-tap ``rows[:, d::2]`` form paid the
    expensive strided relayout 12 times."""
    h, w = img.shape
    imgp = jnp.zeros((h + 6, 2 * wq_tot + 2), compute_dtype)
    imgp = imgp.at[3:h + 3, 2 * lp + 1:2 * lp + 1 + w].set(
        img.astype(compute_dtype)
    )
    # pixel phases: ph[d][row, q] = imgp[row, 2q + d] for d in 0..3
    # (d=2,3 are the d=0,1 phases advanced one pair = one lane shift)
    ph0 = imgp[:, 0::2]  # (h + 6, wq_tot + 1)
    ph1 = imgp[:, 1::2]
    ph = (ph0[:, :wq_tot], ph1[:, :wq_tot],
          ph0[:, 1:wq_tot + 1], ph1[:, 1:wq_tot + 1])
    taps = []
    for dy in (-1, 0, 1):
        for d in range(4):
            taps.append(ph[d][1 + dy:1 + dy + h + 4].reshape(-1))
    p = jnp.stack(taps, axis=0)  # (12, (h + 4) * wq_tot)
    return jnp.pad(p, ((0, 4), (0, 0)))


def _stem_wa(w1a: jnp.ndarray) -> jnp.ndarray:
    """(16, 128) conv1a tap matrix: row (dy+1)*4 + d, col e*64 + c holds
    w1a[dy+1, dx+1, 0, c] for dx = d - 1 - e (zero where out of range)."""
    cout = w1a.shape[3]
    wa = jnp.zeros((16, 2 * cout), jnp.float32)
    for dy in range(3):
        for d in range(4):
            for e in range(2):
                dx = d - 1 - e
                if 0 <= dx + 1 < 3:
                    wa = wa.at[dy * 4 + d, e * cout:(e + 1) * cout].set(
                        w1a[dy, dx + 1, 0, :].astype(jnp.float32)
                    )
    return wa


def stem_stage_pallas(
    img: jnp.ndarray,
    w1a: jnp.ndarray,
    b1a: jnp.ndarray,
    w1b: jnp.ndarray,
    b1b: jnp.ndarray,
    *,
    pool: bool = True,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """conv3x3(1->64)+relu -> conv3x3(64->64)+relu [-> maxpool2x2].

    :param img: (H, W) grayscale image
    :param w1a: (3, 3, 1, 64) HWIO; w1b: (3, 3, 64, 64)
    :return: (H[/2], W[/2], 64)
    """
    h, w = img.shape
    cmid = w1a.shape[3]
    cout = w1b.shape[3]
    geo = _stem_geometry(h, w)
    assert geo is not None, (h, w)
    tr, lp, wq_tot = geo
    tcs = wq_tot
    wv = w // 2
    l_mid, l_out = 2 * cmid, 2 * cout
    bl_mid = 4 * cmid

    pf = _stem_im2col(img, lp, wq_tot, compute_dtype)
    wa = _stem_wa(jnp.asarray(w1a)).astype(compute_dtype)
    ba = jnp.tile(b1a.astype(jnp.float32), 2).reshape(1, l_mid)
    wb = _w_operand(jnp.asarray(w1b), 2).astype(compute_dtype)
    bb = jnp.tile(b1b.astype(jnp.float32), 2).reshape(1, l_out)

    m_in = (tr + 4) * tcs
    m_out = tr * tcs
    n_rows = h // tr
    mk = _valid_slab(n_rows, 1, tr + 4, tcs, lp, wv, wv, h, row0=2, tr=tr)

    def kernel(p_ref, wa_ref, ba_ref, wb_ref, bb_ref, mk_ref,
               out_ref, slab, sem):
        i = pl.program_id(0)

        def get_dma(slot, s):
            return pltpu.make_async_copy(
                p_ref.at[:, pl.ds(s * tr * tcs, m_in)],
                slab.at[slot], sem.at[slot],
            )

        @pl.when(i == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(i + 1 < n_rows)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(i % 2, i).wait()
        # virtual conv1a: one MXU matmul from raw-pixel taps (contraction
        # over the 16 tap sublanes of the transposed slab)
        acc = jax.lax.dot_general(
            slab[i % 2], wa_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h1 = jnp.maximum(acc + ba_ref[...], 0.0)
        # cascaded SAME: zero conv1a output outside the image so conv1b
        # sees SAME-padding zeros (slab row q//tcs is image row
        # i*tr + q//tcs - 2) — one multiply by the precomputed validity slab
        h1 = (h1.reshape(tr + 4, tcs, l_mid) * mk_ref[0]).reshape(
            m_in, l_mid
        ).astype(compute_dtype)
        acc2 = _conv_mxu_split(h1, _build_pn(h1, cmid), wb_ref, l_mid,
                               cmid, bl_mid, l_out, tcs, m_out, base=2)
        y = jnp.maximum(acc2 + bb_ref[...], 0.0)
        if pool:
            # 2x2 maxpool fused: x-pairs are the two 64-lane phase blocks;
            # y-pairs are adjacent tcs-row blocks of the flat layout. One
            # misaligned lp-slice on the whole tile, then aligned pairwise
            # maxes (unrolled — Mosaic has no strided 3D slicing).
            yx = jnp.maximum(y[:, :cout], y[:, cout:])  # (m_out, cout)
            ys = yx.reshape(tr, tcs, cout)[:, lp:lp + wv, :].astype(
                compute_dtype
            )
            for kk in range(tr // 2):
                out_ref[kk, :, :] = jnp.maximum(ys[2 * kk], ys[2 * kk + 1])
        else:
            out_ref[...] = (
                y.reshape(tr, tcs, l_out)[:, lp:lp + wv, :]
                .astype(compute_dtype)
            )

    if pool:
        out_spec = pl.BlockSpec(
            (tr // 2, wv, cout), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((h // 2, wv, cout), compute_dtype)
    else:
        out_spec = pl.BlockSpec(
            (tr, wv, l_out), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((h, wv, l_out), compute_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # P stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tr + 4, tcs, 1), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 16, m_in), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cmid * (16 + 9 * cout),
            bytes_accessed=(h + 4) * wq_tot * 16 * 2 + h * wv * l_out * 2,
            transcendentals=0,
        ),
    )(pf, wa, ba, wb, bb, mk)

    if pool:
        return out  # (h/2, w/2, cout) — wv == w/2
    return out.reshape(h, w, cout)


def stem_reference(img, w1a, b1a, w1b, b1b, *, pool: bool):
    """XLA reference for the fused stem (conv1a + conv1b [+ pool])."""
    return vgg_stage_reference(
        img[..., None].astype(jnp.bfloat16),
        w1a.astype(jnp.bfloat16), b1a,
        w1b.astype(jnp.bfloat16), b1b,
        pool=pool,
    )


def _stem_route(img, w1a, b1a, w1b, b1b, pool):
    import os

    h, w = img.shape
    if (
        jax.default_backend() not in ("cpu",)
        and not os.environ.get("GISNAV_TPU_FORCE_XLA_CONV")
        and w1a.shape[3] == 64 and w1b.shape[3] == 64
        and stem_supported(h, w)
    ):
        return stem_stage_pallas(img, w1a, b1a, w1b, b1b, pool=pool)
    return stem_reference(img, w1a, b1a, w1b, b1b, pool=pool)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def stem_stage(img, w1a, b1a, w1b, b1b, pool=True):
    """Fused SuperPoint stem for one (H, W) grayscale image.

    Forward runs the Mosaic kernel on TPU (XLA reference elsewhere or for
    unsupported shapes); backward recomputes through the XLA reference."""
    return _stem_route(img, w1a, b1a, w1b, b1b, pool)


def _stem_fwd(img, w1a, b1a, w1b, b1b, pool):
    return _stem_route(img, w1a, b1a, w1b, b1b, pool), (
        img, w1a, b1a, w1b, b1b,
    )


def _stem_bwd(pool, residuals, g):
    img, w1a, b1a, w1b, b1b = residuals
    out, vjp = jax.vjp(
        lambda im, a1, c1, a2, c2: stem_reference(
            im, a1, c1, a2, c2, pool=pool
        ),
        img, w1a, b1a, w1b, b1b,
    )
    return vjp(g.astype(out.dtype))


stem_stage.defvjp(_stem_fwd, _stem_bwd)


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
