"""Classical descriptor matching on device: kNN + Lowe ratio + mutual check.

TPU recast of the reference VO matcher (``core/twist_node.py:54,248-267`` in
hmakelin/gisnav: ``cv2.BFMatcher.knnMatch`` with ratio-test 0.7): the full
distance matrix is one MXU matmul, the 2-NN search a masked top-k, and the
output a fixed-size match-index array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mnn_ratio_match", "root_sift"]


def root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """RootSIFT transform: L1-normalize then sqrt.

    Same preprocessing the reference applies before LightGlue
    (``core/pose_node.py:278-284``).
    """
    l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True)
    return jnp.sqrt(desc / jnp.maximum(l1, 1e-12))


def mnn_ratio_match(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
    *,
    ratio: float = 0.7,
    mutual: bool = True,
):
    """L2 kNN matching with Lowe ratio test; fixed shapes.

    :param desc0: (K0, D) query descriptors
    :param desc1: (K1, D) train descriptors
    :param ratio: Lowe ratio threshold (reference uses 0.7)
    :param mutual: additionally require mutual nearest neighbors
    :return: (matches0 (K0,) int32 index into set 1 or -1,
              dists (K0,) best L2 distance)
    """
    k0, k1 = desc0.shape[0], desc1.shape[0]
    if mask0 is None:
        mask0 = jnp.ones(k0, dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones(k1, dtype=bool)

    d0 = desc0.astype(jnp.float32)
    d1 = desc1.astype(jnp.float32)
    # squared L2 distance matrix via one matmul
    sq0 = jnp.sum(d0 * d0, axis=1, keepdims=True)
    sq1 = jnp.sum(d1 * d1, axis=1, keepdims=True)
    d2 = sq0 + sq1.T - 2.0 * (d0 @ d1.T)
    d2 = jnp.maximum(d2, 0.0)
    big = jnp.float32(1e12)
    d2 = jnp.where(mask0[:, None] & mask1[None, :], d2, big)

    # two nearest neighbors per query row
    neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    nn0 = idx_top2[:, 0].astype(jnp.int32)

    ok = best < (ratio * ratio) * second  # squared-distance ratio test
    ok = ok & mask0 & (best < big)

    if mutual:
        nn1 = jnp.argmin(d2, axis=0).astype(jnp.int32)  # (K1,)
        ok = ok & (nn1[nn0] == jnp.arange(k0, dtype=jnp.int32))

    matches0 = jnp.where(ok, nn0, -1)
    dists = jnp.where(ok, jnp.sqrt(best), jnp.inf)
    return matches0, dists
