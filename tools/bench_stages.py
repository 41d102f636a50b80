"""Per-stage TPU microbenchmark for the SuperPoint trunk + LightGlue.

Times each fused conv stage (and optionally the matcher) at the headline
1088x1920 config with device-side repetition (lax.scan) so the dev tunnel's
RTT doesn't pollute the numbers. Usage:

    python tools/bench_stages.py [--reps 20] [--what trunk|lightglue|all]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, x, reps=20, inner=40):
    """Median ms per application, measured as the SLOPE between two scan
    lengths (inner/4 and inner) inside single dispatches — the dev tunnel's
    fixed ~24 ms dispatch cost cancels out of the difference."""
    import jax
    import jax.numpy as jnp

    def chained_fn(n):
        @jax.jit
        def chained(x):
            def body(c, _):
                out = fn(c)
                # sequential dependency XLA cannot fold away (0.0*x is DCE'd)
                probe = out.ravel()[0].astype(jnp.float32)
                return jnp.where(probe > 1e30, c + 1.0, c), ()
            return jax.lax.scan(body, x, None, length=n)[0]
        return chained

    lo, hi = max(1, inner // 4), inner
    f_lo, f_hi = chained_fn(lo), chained_fn(hi)

    def med(f):
        jax.block_until_ready(f(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (med(f_hi) - med(f_lo)) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(1088, 1920))
    ap.add_argument("--what", default="trunk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gisnav_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    from gisnav_tpu.features.pallas_conv import conv_stage, stem_stage

    h, w = args.hw
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def kaiming(*shape):
        fan_in = np.prod(shape[:-1])
        return jnp.asarray(
            rng.normal(0, np.sqrt(2 / fan_in), shape).astype(np.float32))

    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    w1a, b1a = kaiming(3, 3, 1, 64), jnp.zeros(64)
    w1b, b1b = kaiming(3, 3, 64, 64), jnp.zeros(64)
    w2a, b2a = kaiming(3, 3, 64, 64), jnp.zeros(64)
    w2b, b2b = kaiming(3, 3, 64, 64), jnp.zeros(64)
    w3a, b3a = kaiming(3, 3, 64, 128), jnp.zeros(128)
    w3b, b3b = kaiming(3, 3, 128, 128), jnp.zeros(128)
    w4a, b4a = kaiming(3, 3, 128, 128), jnp.zeros(128)
    w4b, b4b = kaiming(3, 3, 128, 128), jnp.zeros(128)
    wpa, bpa = kaiming(3, 3, 128, 256), jnp.zeros(256)

    x1 = jnp.asarray(rng.uniform(0, 1, (h // 2, w // 2, 64)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (h // 4, w // 4, 64)), jnp.float32)
    x3 = jnp.asarray(rng.uniform(0, 1, (h // 8, w // 8, 128)), jnp.float32)

    stages = {
        "stem(1->64->64)+pool": (
            lambda v: stem_stage(v, w1a, b1a, w1b, b1b, pool=True), img),
        "stage2(64->64->64)+pool": (
            lambda v: conv_stage(v, w2a, b2a, w2b, b2b, pool=True), x1),
        "stage3(64->128->128)+pool": (
            lambda v: conv_stage(v, w3a, b3a, w3b, b3b, pool=True), x2),
        "stage4(128->128->128)": (
            lambda v: conv_stage(v, w4a, b4a, w4b, b4b, pool=False), x3),
        "head(128->256)": (
            lambda v: conv_stage(v, wpa, bpa), x3),
    }
    flops = {
        "stem(1->64->64)+pool": 2 * h * w * 64 * (9 * 1 + 9 * 64),
        "stage2(64->64->64)+pool": 2 * (h//2) * (w//2) * 9 * 64 * 64 * 2,
        "stage3(64->128->128)+pool": 2 * (h//4) * (w//4) * 9 * (64 * 128 + 128 * 128),
        "stage4(128->128->128)": 2 * (h//8) * (w//8) * 9 * 128 * 128 * 2,
        "head(128->256)": 2 * (h//8) * (w//8) * 9 * 128 * 256,
    }
    if args.what in ("trunk", "all"):
        total = 0.0
        for name, (fn, inp) in stages.items():
            ms = _timed(fn, inp, reps=args.reps, inner=args.inner)
            total += ms
            tf = flops[name] / (ms * 1e-3) / 1e12
            print(f"{name:30s} {ms:7.3f} ms  {tf:6.1f} TF/s")
        print(f"{'TRUNK TOTAL':30s} {total:7.3f} ms")

    if args.what in ("stem-detail", "all"):
        from gisnav_tpu.features.pallas_conv import (
            _stem_geometry,
            _stem_im2col,
        )

        geo = _stem_geometry(h, w)
        if geo is not None:
            _, lp, wq_tot = geo
            ms = _timed(
                lambda v: _stem_im2col(v, lp, wq_tot, jnp.bfloat16).sum(),
                img, reps=args.reps, inner=args.inner)
            print(f"{'  stem im2col (XLA side)':30s} {ms:7.3f} ms")

    if args.what in ("lightglue", "all"):
        bench_lightglue(args, rng)

    if args.what in ("select", "all"):
        bench_select(args, rng)

    if args.what in ("select-detail",):
        bench_select(args, rng)
        bench_select_detail(args, rng)


def bench_select(args, rng):
    """Keypoint selection (Pallas NMS cell-max + table gather + refine) —
    the stage the gather-free table rewrite targets."""
    import jax
    import jax.numpy as jnp

    from gisnav_tpu.features.nms import select_keypoints

    h, w = args.hw
    heat = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))

    def sel(hm):
        kp, sc, valid = select_keypoints(hm, 2048)
        return kp.sum() + sc.sum() + valid.sum()

    ms = _timed(sel, heat, reps=args.reps, inner=args.inner)
    print(f"{'select 2048kp (nms+topk+table)':30s} {ms:7.3f} ms")


def bench_select_detail(args, rng):
    """Per-substage breakdown of keypoint selection — attributes the select
    cost across the Pallas NMS kernel, top-k, and the keypoint table."""
    import jax
    import jax.numpy as jnp

    from gisnav_tpu.features import nms as n

    h, w = args.hw
    heat = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    hpad = ((h + 31) // 32) * 32
    on_tpu = jax.default_backend() not in ("cpu",)

    from gisnav_tpu.features.pallas_nms import nms_cellmax_supported

    if on_tpu and nms_cellmax_supported(hpad, w, 4, 4, 4):
        from gisnav_tpu.features.pallas_nms import nms_cellmax_pallas

        def cellmax(hm):
            if hpad != h:
                ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
                src = jnp.where(ys < h - 4, hm, 0.0)
                padded = jnp.zeros((hpad, w), hm.dtype).at[:h].set(src)
                return nms_cellmax_pallas(padded, 4)[: h // 4].sum()
            return nms_cellmax_pallas(hm, 4).sum()

        ms = _timed(cellmax, heat, reps=args.reps, inner=args.inner)
        print(f"{'  nms_cellmax_pallas(+pad)':30s} {ms:7.3f} ms")

    cm = jnp.asarray(rng.uniform(0, 1, ((h // 4) * (w // 4),)
                                 ).astype(np.float32))
    ms = _timed(lambda v: n._top_k(v, 2048)[0].sum(), cm,
                reps=args.reps, inner=args.inner)
    print(f"{'  top_k 2048 of cell maxima':30s} {ms:7.3f} ms")

    ms = _timed(lambda hm: n._cell_keypoint_table(hm, hm, 4).sum(), heat,
                reps=args.reps, inner=args.inner)
    print(f"{'  cell_keypoint_table (full)':30s} {ms:7.3f} ms")

    ms = _timed(
        lambda hm: sum(m.sum() for m in n._softargmax_offset_maps(hm)),
        heat, reps=args.reps, inner=args.inner)
    print(f"{'    softargmax offset maps':30s} {ms:7.3f} ms")

    idx = jnp.asarray(rng.integers(0, (h // 4) * (w // 4), 2048))
    tbl = jnp.asarray(rng.uniform(0, w, ((h // 4) * (w // 4), 2)
                                  ).astype(np.float32))
    ms = _timed(lambda t: t[idx].sum(), tbl,
                reps=args.reps, inner=args.inner)
    print(f"{'    table row gather (2048)':30s} {ms:7.3f} ms")


def bench_lightglue(args, rng):
    """Breakdown of the LightGlue-9 matcher at 2048 vs 4096 keypoints."""
    import jax
    import jax.numpy as jnp

    from gisnav_tpu.matching import lightglue as lg

    k0, k1, dim, depth = 2048, 4096, 256, 9
    h, w = args.hw
    model = lg.LightGlue(input_dim=dim, depth=depth)
    kp0 = jnp.asarray(
        rng.uniform(0, (h, w), (k0, 2)).astype(np.float32))
    kp1 = jnp.asarray(
        rng.uniform(0, 2048, (k1, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.normal(0, 1, (k0, dim)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(0, 1, (k1, dim)).astype(np.float32))
    m0 = jnp.ones(k0, bool)
    m1 = jnp.ones(k1, bool)
    params = model.init(jax.random.PRNGKey(0), kp0, d0, m0, (h, w),
                        kp1, d1, m1, (2048, 2048))

    def full(d0v):
        res = model.apply(params, kp0, d0v, m0, (h, w),
                          kp1, d1, m1, (2048, 2048))
        return res.scores

    ms_full = _timed(full, d0, reps=args.reps, inner=args.inner)
    print(f"{'lightglue-9 full':30s} {ms_full:7.3f} ms")

    # attention-only cost: the 4 attention calls per layer at bench shapes
    from gisnav_tpu.matching.pallas_attention import masked_attention_pallas

    q0 = jnp.asarray(rng.normal(0, 1, (k0, 4, 64)).astype(np.float32))
    q1 = jnp.asarray(rng.normal(0, 1, (k1, 4, 64)).astype(np.float32))

    def attn_layer(x):
        a = masked_attention_pallas(x, x, x, m0, jnp.bfloat16)  # self0
        b = masked_attention_pallas(q1, q1, q1, m1, jnp.bfloat16)  # self1
        c = masked_attention_pallas(x, q1, q1, m1, jnp.bfloat16)  # cross0
        e = masked_attention_pallas(q1, x, x, m0, jnp.bfloat16)  # cross1
        return a + c + e[:k0] + b[:k0]

    def attn9(x):
        for _ in range(depth):
            x = attn_layer(x) * 1e-3
        return x

    ms_attn = _timed(attn9, q0, reps=args.reps, inner=max(1, args.inner // 4))
    print(f"{'attention x9 (4 calls/layer)':30s} {ms_attn:7.3f} ms")
    print(f"{'rest (dense+elementwise)':30s} {ms_full - ms_attn:7.3f} ms")

    # the PRODUCTION path: fused whole-layer Mosaic blocks. Equal counts
    # (warp/bucketed hot path) ride the dual-batched sets=2 kernel; the
    # 2048 vs 4096 shape is the cached-mode / map-refresh matcher.
    from gisnav_tpu.matching.lightglue_fused import lightglue_fused_forward

    for kq, kr in ((2048, 2048), (2048, 4096)):
        d0f = d0
        d1f = d1[:kr]
        kp1f = kp1[:kr]
        m1f = jnp.ones(kr, bool)

        def fused(d0v, _kp1=kp1f, _d1=d1f, _m1=m1f):
            res = lightglue_fused_forward(
                params, kp0, d0v, m0, (h, w),
                _kp1, _d1, _m1, (2048, 2048), depth=depth)
            return res.scores

        ms_f = _timed(fused, d0f, reps=args.reps, inner=args.inner)
        label = f"fused-9 {kq}x{kr}" + (" (dual)" if kq == kr else "")
        print(f"{label:30s} {ms_f:7.3f} ms")


if __name__ == "__main__":
    main()
