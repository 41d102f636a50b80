"""On-chip breakdown of the post-matcher tail: DEM z-lift, RANSAC-PnP,
geopose assembly, and the LightGlue assignment head + match extraction.

These stages are latency-bound (many small ops), not FLOP-bound; this probe
attributes the ~2.5 ms "RANSAC+assembly" row of the stage table so kernel
work targets the real cost. Usage::

    python tools/bench_pnp.py [--reps 20] [--inner 16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, args, reps=20, inner=16):
    """Median ms per application as the SLOPE between two device-side scan
    lengths (same harness as bench_stages._timed — the dev tunnel's fixed
    ~24 ms dispatch cost and host overhead cancel out of the difference).

    ``fn(*args, salt)`` must CONSUME the trailing f32 scalar salt (add it to
    a float input) and return a scalar; the salt is the loop carry, so XLA
    cannot hoist the body out of the scan, and it stays 0.0 at runtime so
    results are unperturbed.
    """
    import jax
    import jax.numpy as jnp

    def chained_fn(n):
        @jax.jit
        def chained(*a):
            def body(c, _):
                out = fn(*a, c)
                probe = jnp.asarray(out).ravel()[0].astype(jnp.float32)
                return jnp.where(probe > 1e30, c + 1.0, c), ()
            return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]
        return chained

    lo_n, hi_n = max(1, inner // 4), inner
    f_lo, f_hi = chained_fn(lo_n), chained_fn(hi_n)

    def med(f):
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (med(f_hi) - med(f_lo)) / (hi_n - lo_n) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gisnav_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()

    from gisnav_tpu.matching.lightglue import _extract_matches
    from gisnav_tpu.pipeline.geopose import assemble_geopose
    from gisnav_tpu.pnp.dem import gather_elevation
    from gisnav_tpu.pnp.ransac import ransac_pnp

    n = args.n
    rng = np.random.default_rng(0)

    # plausible geometry: camera 1200 px above a plane, keypoints spread
    kp_ref = jnp.asarray(rng.uniform(100, 900, (n, 2)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-2, 2, (n,)).astype(np.float32))
    obj = jnp.concatenate([kp_ref, z[:, None]], axis=1)
    k = jnp.asarray(
        [[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]], jnp.float32)
    r_true = jnp.eye(3)
    t_true = jnp.asarray([-500.0, -500.0, 1200.0], jnp.float32)
    pc = obj @ r_true.T + t_true
    proj = (pc @ k.T)
    kp_qry = proj[:, :2] / proj[:, 2:3]
    kp_qry = kp_qry + jnp.asarray(
        rng.normal(0, 1.0, (n, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, n) < 0.7)
    key = jax.random.PRNGKey(0)

    dem = jnp.asarray(rng.uniform(0, 30, (1088, 1920)).astype(np.float32))
    crs = jnp.asarray(np.diag([1e-5, -1e-5, -0.5, 1.0]).astype(np.float32))
    m_crop = jnp.eye(3)

    ms = _timed(lambda d, kp, s: gather_elevation(d, kp + s).sum(),
                (dem, kp_ref), args.reps, args.inner)
    print(f"{'gather_elevation (2048)':34s} {ms:7.3f} ms")

    def pnp_full(o, q, m, kk, s):
        res = ransac_pnp(o, q + s, k, m, key=kk)
        return res.r.sum() + res.t.sum() + res.num_inliers

    ms = _timed(pnp_full, (obj, kp_qry, mask, key), args.reps, args.inner)
    print(f"{'ransac_pnp (64 hyp + 10 GN)':34s} {ms:7.3f} ms")

    def pnp_hyp_only(o, q, m, kk, s):
        res = ransac_pnp(o, q + s, k, m, key=kk, refine_iters=0)
        return res.r.sum() + res.t.sum() + res.num_inliers

    ms = _timed(pnp_hyp_only, (obj, kp_qry, mask, key),
                args.reps, args.inner)
    print(f"{'  hypotheses only (GN=0)':34s} {ms:7.3f} ms")

    for it in (3, 5):
        def pnp_gn(o, q, m, kk, s, _it=it):
            res = ransac_pnp(o, q + s, k, m, key=kk, refine_iters=_it)
            return res.r.sum() + res.t.sum() + res.num_inliers

        ms = _timed(pnp_gn, (obj, kp_qry, mask, key), args.reps, args.inner)
        print(f"{'  refine_iters=%d' % it:34s} {ms:7.3f} ms")

    def asm(r, t, s):
        e, q2, lla, cp = assemble_geopose(r, t + s, m_crop, crs)
        return e.sum() + q2.sum() + lla.sum() + cp.sum()

    ms = _timed(asm, (r_true, t_true), args.reps, args.inner)
    print(f"{'assemble_geopose':34s} {ms:7.3f} ms")

    scores = jnp.asarray(
        rng.uniform(0, 1, (n, n)).astype(np.float32))
    m0 = jnp.ones(n, bool)

    def extract(sc, s):
        r = _extract_matches(sc + s, m0, m0, 0.1)
        return r.matches0.sum() + r.mscores0.sum()

    ms = _timed(extract, (scores,), args.reps, args.inner)
    print(f"{'match extraction (argmax/mutual)':34s} {ms:7.3f} ms")

    # assignment head at production shape
    x0 = jnp.asarray(rng.normal(0, 1, (n, 256)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(0, 1, (n, 256)).astype(np.float32))
    wf = jnp.asarray(rng.normal(0, 0.06, (256, 256)).astype(np.float32))
    wm = jnp.asarray(rng.normal(0, 0.06, (256, 1)).astype(np.float32))

    def head(a, b, s):
        a = a + s
        md0 = (a @ wf) / 4.0
        md1 = (b @ wf) / 4.0
        sim = jnp.einsum("id,jd->ij", md0, md1,
                         preferred_element_type=jnp.float32)
        z0 = jax.nn.sigmoid((a @ wm))[:, 0]
        z1 = jax.nn.sigmoid((b @ wm))[:, 0]
        sc = (jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=0)
              * (z0[:, None] * z1[None, :]))
        return sc.sum()

    ms = _timed(head, (x0, x1), args.reps, args.inner)
    print(f"{'assignment head (sim+softmax2)':34s} {ms:7.3f} ms")

    print("DONE")


if __name__ == "__main__":
    main()
