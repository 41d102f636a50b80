"""Keypoint NMS + fixed-size top-K selection (device, XLA).

XLA-friendly recast of detector post-processing: instead of the ragged
keypoint lists the reference gets from cv2.SIFT / kornia
(``core/pose_node.py:207-241`` in hmakelin/gisnav), keypoints are a FIXED
(MAX_KEYPOINTS,) set with a score mask — padded slots carry score 0 and are
masked through matching and PnP downstream.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["simple_nms", "select_keypoints"]


def simple_nms(scores: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Fast non-maximum suppression: zero out pixels that are not the maximum
    within a (2*radius+1)^2 window.

    :param scores: (H, W) detector heatmap
    :return: (H, W) heatmap with non-maxima zeroed
    """
    window = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(scores == pooled, scores, 0.0)


def select_keypoints(
    heatmap: jnp.ndarray,
    max_keypoints: int,
    score_threshold: float = 0.0005,
    border: int = 4,
    nms_radius: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + top-K keypoint selection with static output shapes.

    :param heatmap: (H, W) detector scores in [0, 1]
    :return: (keypoints (K, 2) float32 xy, scores (K,), valid (K,) bool)
    """
    h, w = heatmap.shape
    nms = simple_nms(heatmap, nms_radius)
    # suppress image border detections
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (xs >= border) & (xs < w - border) & (ys >= border) & (ys < h - border)
    )
    nms = jnp.where(in_border, nms, 0.0)

    flat = nms.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    kp_x = (idx % w).astype(jnp.float32)
    kp_y = (idx // w).astype(jnp.float32)
    keypoints = jnp.stack([kp_x, kp_y], axis=1)
    valid = scores > score_threshold
    return keypoints, scores, valid
