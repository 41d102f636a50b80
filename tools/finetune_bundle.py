"""Fine-tune a bundled weight set on the shadow-augmented curriculum.

The appearance battery (``tests/test_world_appearance.py``) showed the
pre-round-4 bundles anchor on cast-shadow boundaries: phantom dark quads in
the query alone collapse a 40-inlier fix to 4 inliers. The curriculum now
renders such quads into the query view (``train/device_data._cast_shadows``)
so matching learns to ignore single-view shadow structure, the way it must
on real sun-angled orthoimagery (reference errors measured on real NAIP:
``variance_estimation.ipynb`` in hmakelin/gisnav).

Run ON TPU (device-data path):

    python tools/finetune_bundle.py --weights harris_lg5 --steps 3000 \
        [--regime cached|warp] [--out weights/gisnav_tpu_harris_lg5.npz]

``--regime cached`` fine-tunes in the asymmetric cached-reference regime
(small rotated query vs large north-up raster — harris_lg5's production
mode); ``warp`` uses the symmetric homography-pair regime (learned_lg9's
strongest mode). Writes the updated bundle; commit it only after the
sweeps/gates pass.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="harris_lg5",
                    choices=("harris_lg5", "learned_lg9"))
    ap.add_argument("--regime", default=None, choices=("cached", "warp"),
                    help="default: cached for harris_lg5, warp for "
                         "learned_lg9 (each bundle's production mode)")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--curriculum", type=int, default=600,
                    help="difficulty ramp steps (short: params start "
                         "converged, only the shadow task is new)")
    ap.add_argument("--out", default=None,
                    help="output npz (default: overwrite the bundle)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from gisnav_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    from gisnav_tpu.pipeline.runners import load_bundled
    from gisnav_tpu.weights import LEARNED_LG9_PATH, PRETRAINED_PATH

    params, pcfg = load_bundled(args.weights)
    regime = args.regime or (
        "cached" if args.weights == "harris_lg5" else "warp")
    out = args.out or (PRETRAINED_PATH if args.weights == "harris_lg5"
                       else LEARNED_LG9_PATH)

    if regime == "cached":
        import time

        import jax.numpy as jnp

        from gisnav_tpu.train.steps import (
            CachedRegimeConfig,
            TrainState,
            make_cached_regime_chunk,
        )
        import optax

        cfg = CachedRegimeConfig(
            lightglue_depth=pcfg.lightglue_depth,
            detector_mode=pcfg.detector_mode,
            learning_rate=args.lr,
            curriculum_steps=args.curriculum,
        )
        tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
        state = TrainState(params=jax.device_put(params),
                           opt_state=tx.init(jax.device_put(params)),
                           step=jnp.zeros((), jnp.int32))
        chunk = 10
        chunk_fn = jax.jit(make_cached_regime_chunk(cfg, tx, args.batch,
                                                    chunk=chunk))
        key = jax.random.PRNGKey(args.seed)
        done, t0 = 0, time.time()
        while done < args.steps:
            key, sub = jax.random.split(key)
            state, metrics = chunk_fn(state, sub)
            done += chunk
            if done % 100 < chunk:
                print(f"step {done} loss {float(metrics['loss']):.4f} "
                      f"gt_recall {float(metrics['gt_recall']):.3f} "
                      f"({done / (time.time() - t0):.2f} steps/s)",
                      flush=True)
        tuned = state.params
    else:
        from gisnav_tpu.train.loop import train
        from gisnav_tpu.train.steps import TrainConfig

        cfg = TrainConfig(
            image_shape=(128, 160),
            max_keypoints=256,
            lightglue_depth=pcfg.lightglue_depth,
            detector_mode=pcfg.detector_mode,
            learning_rate=args.lr,
            curriculum_steps=args.curriculum,
        )
        tuned = train(steps=args.steps, batch_size=args.batch, config=cfg,
                      seed=args.seed, device_data=True, init_params=params)

    from gisnav_tpu.weights import save_npz

    save_npz(out, jax.tree.map(lambda a: jax.device_get(a), tuned))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
