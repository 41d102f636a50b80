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

    jax.config.update("jax_compilation_cache_dir", "/tmp/gisnav_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    total = 0.0
    for name, (fn, inp) in stages.items():
        ms = _timed(fn, inp, reps=args.reps, inner=args.inner)
        total += ms
        tf = flops[name] / (ms * 1e-3) / 1e12
        print(f"{name:30s} {ms:7.3f} ms  {tf:6.1f} TF/s")
    print(f"{'TRUNK TOTAL':30s} {total:7.3f} ms")


if __name__ == "__main__":
    main()
