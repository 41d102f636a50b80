#!/usr/bin/env python
"""Train the semi-dense LoFTR variant and bundle it as a named weight set.

One-shot producer of ``weights/gisnav_tpu_loftr.npz`` — the checkpoint that
gates the semidense pipeline variant on the accuracy sweep
(``tests/test_envelope.py::test_semidense_backend_full_graph_with_trained_weights``).
Architecture is pinned to the pipeline's (depth=4 LoFTR, 1024 coarse
matches; ``pipeline/runners.py::SEMIDENSE_CONFIG``) so the trained tree
loads directly.

Run on the TPU (hours-scale at the default step budget)::

    python tools/train_loftr_bundle.py --steps 6000
    python -m pytest tests/test_envelope.py -q -k semidense
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-shape", default="256x320",
                    help="training pair size HxW (arch is resolution-"
                         "independent; larger = slower, better fine loss; "
                         "coarse grid (H/8)*(W/8) must be >= 1024 for the "
                         "pinned max_matches)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", default=None,
                    help="npz path (default: the bundled LOFTR_PATH)")
    ap.add_argument("--ckpt-dir", default="/tmp/gisnav_loftr_ckpt")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    from gisnav_tpu.train.loftr_steps import LoFTRTrainConfig
    from gisnav_tpu.train.loop import train
    from gisnav_tpu.weights import LOFTR_PATH, save_npz

    h, w = (int(v) for v in args.image_shape.split("x"))
    if (h // 8) * (w // 8) < 1024:
        ap.error(f"coarse grid {(h // 8) * (w // 8)} < max_matches 1024 "
                 f"(top_k would fail); use >= 256x320")
    # depth/max_matches MUST match the pipeline architecture
    # (init_semidense_params builds LoFTR(max_matches=1024, depth default 4))
    cfg = LoFTRTrainConfig(
        image_shape=(h, w),
        max_matches=1024,
        depth=4,
        learning_rate=args.lr,
    )
    params = train(steps=args.steps, batch_size=args.batch, config=cfg,
                   ckpt_dir=args.ckpt_dir)
    out = args.out or LOFTR_PATH
    save_npz(out, params)
    print(f"bundled: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
