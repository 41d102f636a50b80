"""Synthetic homography-pair supervision for matcher training.

The reference ships frozen third-party weights (kornia LightGlue,
``docker/mavros/Dockerfile:83-85`` in hmakelin/gisnav) and has no training
code at all; this framework can (re)train its matcher on synthetic
homography-warped pairs — the standard self-supervised recipe for
SuperPoint/SuperGlue-family models — so it is not tied to any external
checkpoint.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["MatchBatch", "make_homography_batch"]


class MatchBatch(NamedTuple):
    """One batched training example for the matcher (all fixed-size)."""

    image0: np.ndarray  # (B, H, W) float32 in [0, 1]
    image1: np.ndarray  # (B, H, W)
    homography: np.ndarray  # (B, 3, 3) image0 px -> image1 px


def _random_homography(rng, h, w, max_angle=35.0, max_scale=0.25,
                       max_shift=0.15, perspective=2e-4):
    a = np.radians(rng.uniform(-max_angle, max_angle))
    s = 1.0 + rng.uniform(-max_scale, max_scale)
    tx = rng.uniform(-max_shift, max_shift) * w
    ty = rng.uniform(-max_shift, max_shift) * h
    c, si = np.cos(a), np.sin(a)
    cx, cy = w / 2.0, h / 2.0
    center = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    rot = np.array([[s * c, -s * si, 0], [s * si, s * c, 0], [0, 0, 1.0]])
    back = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1.0]])
    persp = np.eye(3)
    persp[2, 0] = rng.uniform(-perspective, perspective)
    persp[2, 1] = rng.uniform(-perspective, perspective)
    return back @ persp @ rot @ center


def make_homography_batch(rng: np.random.Generator, batch: int,
                          shape=(128, 160)) -> MatchBatch:
    """Generate fractal-textured images and homography-warped partners."""
    import cv2

    h, w = shape
    imgs0 = np.empty((batch, h, w), np.float32)
    imgs1 = np.empty((batch, h, w), np.float32)
    hs = np.empty((batch, 3, 3), np.float64)
    for b in range(batch):
        acc = np.zeros((h, w), np.float32)
        for octave in (4, 16, 64, max(h, w)):
            layer = rng.uniform(0, 1, (octave, octave)).astype(np.float32)
            acc += cv2.resize(layer, (w, h), interpolation=cv2.INTER_CUBIC)
        acc = (acc - acc.min()) / max(np.ptp(acc), 1e-6)
        hom = _random_homography(rng, h, w)
        imgs0[b] = acc
        imgs1[b] = cv2.warpPerspective(acc, hom, (w, h))
        hs[b] = hom
    return MatchBatch(image0=imgs0, image1=imgs1,
                      homography=hs.astype(np.float32))
