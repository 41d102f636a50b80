"""Semi-dense detector-free matcher (LoFTR-style), TPU-first.

The reference's earlier releases used LoFTR for matching (its v0.65 SITL
accuracy numbers were produced with it, see BASELINE.md); this is the
framework's semi-dense variant (BASELINE.json config 3): no keypoint
detector — every 1/8-resolution cell is a token.

Architecture (Sun et al., CVPR 2021, re-designed for XLA):

1. A shared conv backbone yields fine features at 1/2 (d=128) and coarse
   features at 1/8 (d=256) resolution.
2. Coarse features + 2D sinusoidal position encoding run through L
   self/cross blocks of ELU-kernel LINEAR attention — O(N d^2) matmuls that
   the MXU loves, instead of O(N^2) token attention (N ~ 5k tokens).
3. Dual-softmax over the coarse similarity, mutual-max filtering, and a
   fixed-size top-M selection (static shapes for the downstream PnP).
4. Fine refinement: 5x5 fine-feature windows around each coarse match are
   correlated and soft-argmaxed for sub-pixel positions in image 1.

Outputs feed ``pnp.ransac_pnp`` exactly like the sparse path.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LoFTR", "LoFTRMatches"]


class LoFTRMatches(NamedTuple):
    """Fixed-size semi-dense match set (image coordinates, full resolution)."""

    kp0: jnp.ndarray  # (M, 2) float32 xy in image 0
    kp1: jnp.ndarray  # (M, 2) float32 xy in image 1 (sub-pixel refined)
    confidence: jnp.ndarray  # (M,)
    mask: jnp.ndarray  # (M,) bool


def _sine_pos_encoding(h: int, w: int, dim: int) -> jnp.ndarray:
    """2D sinusoidal position encoding, (h*w, dim)."""
    assert dim % 4 == 0
    d4 = dim // 4
    freqs = jnp.exp(jnp.arange(d4) * (-jnp.log(10000.0) / max(d4 - 1, 1)))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * freqs[None, :]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None] * freqs[None, :]
    pe_y = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], axis=-1)  # (h, d/2)
    pe_x = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)  # (w, d/2)
    pe = jnp.concatenate(
        [
            jnp.broadcast_to(pe_y[:, None, :], (h, w, 2 * d4)),
            jnp.broadcast_to(pe_x[None, :, :], (h, w, 2 * d4)),
        ],
        axis=-1,
    )
    return pe.reshape(h * w, dim)


def _linear_attention(q, k, v):
    """ELU-kernel linear attention: O(N d^2), pure MXU matmuls.

    q: (Nq, H, D), k/v: (Nk, H, D) -> (Nq, H, D)
    """
    qp = jax.nn.elu(q) + 1.0
    kp = jax.nn.elu(k) + 1.0
    kv = jnp.einsum("khd,khe->hde", kp, v, preferred_element_type=jnp.float32)
    z = jnp.einsum("khd->hd", kp)
    num = jnp.einsum("qhd,hde->qhe", qp, kv,
                     preferred_element_type=jnp.float32)
    den = jnp.einsum("qhd,hd->qh", qp, z)[..., None]
    return num / jnp.maximum(den, 1e-6)


class _LoFTRBlock(nn.Module):
    """One attention block (self or cross) with the LoFTR update MLP."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, source):
        h = self.heads
        dh = self.dim // h
        n = x.shape[0]
        q = nn.Dense(self.dim, name="q")(x).reshape(n, h, dh)
        k = nn.Dense(self.dim, name="k")(source).reshape(-1, h, dh)
        v = nn.Dense(self.dim, name="v")(source).reshape(-1, h, dh)
        msg = _linear_attention(q, k, v).reshape(n, self.dim)
        msg = nn.Dense(self.dim, name="merge")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.dim, name="fc1")(y)
        y = nn.relu(nn.LayerNorm(name="norm1")(y))
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + nn.LayerNorm(name="norm2")(y)


class _Backbone(nn.Module):
    """Conv pyramid: fine (1/2, d=128) and coarse (1/8, d=256) features."""

    @nn.compact
    def __call__(self, image):
        x = image[None, :, :, None]
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), name="stem")(x))
        x = nn.relu(nn.Conv(128, (3, 3), name="c1a")(x))
        fine = nn.Conv(128, (3, 3), name="fine_out")(x)  # 1/2
        x = nn.relu(nn.Conv(192, (3, 3), strides=(2, 2), name="c2")(x))
        x = nn.relu(nn.Conv(192, (3, 3), name="c2b")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), name="c3")(x))
        coarse = nn.Conv(256, (3, 3), name="coarse_out")(x)  # 1/8
        return fine[0], coarse[0]


class LoFTR(nn.Module):
    """Semi-dense matcher over an image pair (shapes must be /8)."""

    dim: int = 256
    fine_dim: int = 128
    heads: int = 8
    depth: int = 4
    max_matches: int = 1024
    temperature: float = 0.1
    confidence_threshold: float = 0.2
    window: int = 5  # fine window size (odd)

    @nn.compact
    def __call__(self, image0: jnp.ndarray, image1: jnp.ndarray,
                 return_scores: bool = False):
        h0, w0 = image0.shape
        h1, w1 = image1.shape
        backbone = _Backbone(name="backbone")
        fine0, coarse0 = backbone(image0)
        fine1, coarse1 = backbone(image1)

        hc0, wc0 = coarse0.shape[0], coarse0.shape[1]
        hc1, wc1 = coarse1.shape[0], coarse1.shape[1]
        f0 = coarse0.reshape(hc0 * wc0, self.dim) + _sine_pos_encoding(
            hc0, wc0, self.dim
        )
        f1 = coarse1.reshape(hc1 * wc1, self.dim) + _sine_pos_encoding(
            hc1, wc1, self.dim
        )

        for i in range(self.depth):
            sb = _LoFTRBlock(self.dim, self.heads, name=f"self_{i}")
            f0 = sb(f0, f0)
            f1 = sb(f1, f1)
            cb = _LoFTRBlock(self.dim, self.heads, name=f"cross_{i}")
            f0, f1 = cb(f0, f1), cb(f1, f0)

        # dual-softmax coarse assignment
        f0n = f0 / jnp.maximum(jnp.linalg.norm(f0, axis=-1, keepdims=True),
                               1e-6)
        f1n = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True),
                               1e-6)
        sim = (f0n @ f1n.T) / self.temperature
        p = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=0)

        n0 = hc0 * wc0
        best1 = jnp.argmax(p, axis=1).astype(jnp.int32)  # (N0,)
        score = jnp.max(p, axis=1)
        best0 = jnp.argmax(p, axis=0).astype(jnp.int32)  # (N1,)
        mutual = best0[best1] == jnp.arange(n0, dtype=jnp.int32)
        score = jnp.where(mutual, score, 0.0)

        conf, idx0 = jax.lax.top_k(score, self.max_matches)
        idx1 = best1[idx0]
        valid = conf > self.confidence_threshold

        # coarse cell centers -> full-res pixel coordinates
        s0y, s0x = h0 / hc0, w0 / wc0
        s1y, s1x = h1 / hc1, w1 / wc1
        kp0 = jnp.stack(
            [(idx0 % wc0 + 0.5) * s0x, (idx0 // wc0 + 0.5) * s0y], axis=1
        )
        kp1c = jnp.stack(
            [(idx1 % wc1 + 0.5) * s1x, (idx1 // wc1 + 0.5) * s1y], axis=1
        )

        # fine refinement at 1/2 resolution
        kp1 = self._refine(fine0, fine1, kp0, kp1c)

        matches = LoFTRMatches(kp0=kp0, kp1=kp1, confidence=conf,
                               mask=valid)
        if return_scores:
            # (N0, N1) dual-softmax assignment for training supervision
            return matches, p
        return matches

    def _refine(self, fine0, fine1, kp0, kp1c):
        """Correlate 5x5 fine windows; soft-argmax the offset in image 1."""
        wsz = self.window
        r = wsz // 2
        hf0, wf0, d = fine0.shape
        hf1, wf1, _ = fine1.shape

        def window(fmap, cy, cx, hh, ww):
            y0 = jnp.clip(cy - r, 0, hh - wsz)
            x0 = jnp.clip(cx - r, 0, ww - wsz)
            return jax.lax.dynamic_slice(fmap, (y0, x0, 0), (wsz, wsz, d))

        def per_match(p0, p1):
            # centers at 1/2 resolution
            c0y = (p0[1] / 2.0).astype(jnp.int32)
            c0x = (p0[0] / 2.0).astype(jnp.int32)
            c1y = (p1[1] / 2.0).astype(jnp.int32)
            c1x = (p1[0] / 2.0).astype(jnp.int32)
            center = fine0[jnp.clip(c0y, 0, hf0 - 1),
                           jnp.clip(c0x, 0, wf0 - 1)]  # (d,)
            win = window(fine1, c1y, c1x, hf1, wf1)  # (w, w, d)
            corr = jnp.einsum("ijd,d->ij", win, center) / jnp.sqrt(
                jnp.float32(d)
            )
            prob = jax.nn.softmax(corr.reshape(-1)).reshape(wsz, wsz)
            dy = jnp.sum(prob * jnp.arange(wsz)[:, None]) - r
            dx = jnp.sum(prob * jnp.arange(wsz)[None, :]) - r
            return p1 + 2.0 * jnp.stack([dx, dy])  # back to full res

        return jax.vmap(per_match)(kp0, kp1c)
