"""Bundled pretrained weights: in-framework-trained descriptor + matcher.

``weights/gisnav_tpu_harris_lg5.npz`` holds parameters trained from scratch
on TPU with the self-supervised affine-pair recipe (Harris detector mode,
5-layer LightGlue, scale augmentation to 2.6x, 45-degree residual rotations
— no external checkpoints involved; see ``train/``). Stored as a flattened
float16 npz (13.6 MB) to keep the repository small. Use with::

    PipelineConfig(detector_mode="harris", lightglue_depth=5, ...)

Usage::

    from gisnav_tpu.weights import load_pretrained
    params = load_pretrained()  # -> {"superpoint": ..., "lightglue": ...}
    config = PipelineConfig(detector_mode="harris", lightglue_depth=9, ...)
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

__all__ = ["load_pretrained", "save_npz", "load_npz", "PRETRAINED_PATH",
           "LEARNED_LG9_PATH", "LOFTR_PATH"]

WEIGHTS_DIR = os.environ.get(
    "GISNAV_TPU_WEIGHTS_DIR",
    os.path.join(os.path.dirname(__file__), "..", "weights"),
)
PRETRAINED_PATH = os.path.join(WEIGHTS_DIR, "gisnav_tpu_harris_lg5.npz")
# secondary bundle: learned SuperPoint detector + 9-layer LightGlue (the
# headline-bench architecture). Trained with the Harris-distillation
# detector loss + matcher NLL, asymmetric fine-tune. Best used in WARP
# mode (10/10 on the accuracy sweep, mean 4.1 m, ~2x the inliers of
# harris_lg5); in cached mode harris_lg5 is stronger (10/10 vs 8/10).
LEARNED_LG9_PATH = os.path.join(WEIGHTS_DIR, "gisnav_tpu_learned_lg9.npz")
# semi-dense LoFTR variant (detector-free; matching/loftr.py depth=4
# architecture, trained with train/loftr_steps.py coarse dual-softmax CE +
# fine reprojection loss)
LOFTR_PATH = os.path.join(WEIGHTS_DIR, "gisnav_tpu_loftr.npz")


def save_npz(path: str, params: Any) -> None:
    """Flatten a params pytree into a compressed npz (floats as f16)."""
    import flax
    import jax

    flat = flax.traverse_util.flatten_dict(
        jax.tree.map(
            lambda x: np.asarray(x, np.float16)
            if np.asarray(x).dtype.kind == "f" else np.asarray(x),
            params,
        ),
        sep="/",
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Any:
    """Restore a params pytree from :func:`save_npz` output (floats -> f32)."""
    import flax

    with np.load(path) as data:
        flat = {
            key: np.asarray(value, np.float32)
            if value.dtype.kind == "f" else value
            for key, value in data.items()
        }
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def load_pretrained(path: Optional[str] = None) -> Any:
    """Load the bundled pretrained params (raises if not present)."""
    path = path or PRETRAINED_PATH
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no bundled weights at {path}; train with "
            "'python -m gisnav_tpu train' or convert public checkpoints "
            "(features/convert.py, matching/convert.py)"
        )
    return load_npz(path)
