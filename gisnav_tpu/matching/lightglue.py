"""LightGlue attention matcher (Flax linen, fixed shapes, MXU-friendly).

TPU-native replacement for the reference's kornia ``LightGlueMatcher``
(``core/pose_node.py:88-122,246-297`` in hmakelin/gisnav). Follows the
LightGlue design (Lindenberger et al., ICCV 2023): L transformer layers, each
a rotary-position self-attention + bidirectional cross-attention with
two-stream weight sharing, followed by a sigmoid-matchability double-softmax
assignment head.

TPU idiom shifts vs the reference:
- keypoint sets are FIXED SIZE with validity masks (padded slots attend to
  nothing and are unmatched), so one compiled program serves every frame;
- the adaptive depth/width early-exit of the CUDA implementation
  (``pose_node.py:96-121``) is replaced by a static depth: attention at
  K<=2048 tokens is MXU-bound and cheap, and a static program lets XLA fuse
  the whole matcher into the frame->geopose program;
- attention runs in bfloat16 with float32 softmax accumulators.

Weight layout is converter-compatible with the official PyTorch release (see
``matching/convert.py``).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LightGlue", "MatchResult", "apply_lightglue", "match_features"]


class MatchResult(NamedTuple):
    """Fixed-size matching result.

    ``matches0[i]`` is the index into set 1 matched to keypoint i of set 0,
    or -1; ``mscores0[i]`` the match confidence.
    """

    matches0: jnp.ndarray  # (K0,) int32
    matches1: jnp.ndarray  # (K1,) int32
    mscores0: jnp.ndarray  # (K0,) float32
    mscores1: jnp.ndarray  # (K1,) float32
    scores: jnp.ndarray  # (K0, K1) assignment probabilities
    stop_layer: jnp.ndarray  # () int32 — layer at which inference stopped


def normalize_keypoints(kpts: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Center and scale pixel coords to ~[-1, 1] (LightGlue convention)."""
    size = jnp.array([width, height], dtype=jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (kpts - shift) / scale


class _RotaryEncoding(nn.Module):
    """Learnable Fourier rotary position encoding over 2D keypoint coords."""

    head_dim: int

    @nn.compact
    def __call__(self, kpts: jnp.ndarray):
        # project (x, y) -> head_dim/2 frequencies
        proj = nn.Dense(self.head_dim // 2, use_bias=False, name="Wr")(kpts)
        return jnp.cos(proj), jnp.sin(proj)  # each (K, head_dim/2)


def _apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate feature pairs: x shape (K, H, D); cos/sin (K, D/2)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


def _attention(q, k, v, mask_k, compute_dtype):
    """Masked scaled dot-product attention. q/k/v: (K, H, D); mask_k: (Kk,).

    On TPU with aligned shapes the Pallas kernel keeps the (Kq, Kk) logits in
    VMEM (XLA materializes them in HBM, which makes the 9-layer matcher
    HBM-bound at 2048x4096); other backends/shapes use the einsum path.
    """
    if jax.default_backend() not in ("cpu",):
        from gisnav_tpu.matching.pallas_attention import (
            masked_attention_pallas,
            pallas_attention_supported,
        )

        if pallas_attention_supported(q.shape[0], k.shape[0], q.shape[-1]):
            return masked_attention_pallas(q, k, v, mask_k, compute_dtype)

    dh = q.shape[-1]
    logits = jnp.einsum(
        "qhd,khd->hqk", q.astype(compute_dtype), k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(dh))
    logits = jnp.where(mask_k[None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "hqk,khd->qhd", attn.astype(compute_dtype), v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out


class _FFN(nn.Module):
    """LightGlue update: x + MLP([x | message])."""

    dim: int
    compute_dtype: jnp.dtype
    gelu_approximate: bool = True

    @nn.compact
    def __call__(self, x, message):
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.dim, name="fc1", dtype=self.compute_dtype)(y)
        y = nn.LayerNorm(name="norm", dtype=jnp.float32)(y)
        y = nn.gelu(y, approximate=self.gelu_approximate)
        y = nn.Dense(self.dim, name="fc2", dtype=self.compute_dtype)(y)
        return x + y.astype(x.dtype)


class _SelfBlock(nn.Module):
    dim: int
    heads: int
    compute_dtype: jnp.dtype
    gelu_approximate: bool = True

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        h = self.heads
        dh = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="Wqkv", dtype=self.compute_dtype)(x)
        qkv = qkv.reshape(x.shape[0], h, 3, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
        msg = _attention(q, k, v, mask, self.compute_dtype)
        msg = msg.reshape(x.shape[0], self.dim)
        msg = nn.Dense(self.dim, name="out_proj", dtype=self.compute_dtype)(msg)
        return _FFN(self.dim, self.compute_dtype, self.gelu_approximate,
                    name="ffn")(x, msg)


class _CrossBlock(nn.Module):
    """Bidirectional cross-attention with shared query/key projection."""

    dim: int
    heads: int
    compute_dtype: jnp.dtype
    gelu_approximate: bool = True

    @nn.compact
    def __call__(self, x0, x1, mask0, mask1):
        h = self.heads
        dh = self.dim // h
        to_qk = nn.Dense(self.dim, name="to_qk", dtype=self.compute_dtype)
        to_v = nn.Dense(self.dim, name="to_v", dtype=self.compute_dtype)
        out = nn.Dense(self.dim, name="to_out", dtype=self.compute_dtype)
        qk0 = to_qk(x0).reshape(-1, h, dh)
        qk1 = to_qk(x1).reshape(-1, h, dh)
        v0 = to_v(x0).reshape(-1, h, dh)
        v1 = to_v(x1).reshape(-1, h, dh)
        m0 = _attention(qk0, qk1, v1, mask1, self.compute_dtype)
        m1 = _attention(qk1, qk0, v0, mask0, self.compute_dtype)
        m0 = out(m0.reshape(-1, self.dim))
        m1 = out(m1.reshape(-1, self.dim))
        ffn = _FFN(self.dim, self.compute_dtype, self.gelu_approximate,
                   name="ffn")
        return ffn(x0, m0), ffn(x1, m1)


class LightGlue(nn.Module):
    """LightGlue forward pass over two fixed-size keypoint sets.

    Inputs are pixel keypoints, descriptors and validity masks for the query
    and reference sets plus the image sizes used for normalization.
    """

    input_dim: int = 256  # 256 for SuperPoint, 128 for (Root)SIFT
    dim: int = 256
    heads: int = 4
    depth: int = 9
    filter_threshold: float = 0.1
    compute_dtype: jnp.dtype = jnp.bfloat16
    # tanh-approximate gelu is the TPU-fast default; converted official
    # checkpoints were trained with exact (erf) gelu — pass False for
    # value-level fidelity (see matching/convert.py, tests/test_convert_values)
    gelu_approximate: bool = True

    @nn.compact
    def __call__(
        self,
        kpts0: jnp.ndarray,
        desc0: jnp.ndarray,
        mask0: jnp.ndarray,
        size0: tuple,
        kpts1: jnp.ndarray,
        desc1: jnp.ndarray,
        mask1: jnp.ndarray,
        size1: tuple,
    ) -> MatchResult:
        input_proj = nn.Dense(self.dim, name="input_proj")
        x0 = input_proj(desc0.astype(jnp.float32))
        x1 = input_proj(desc1.astype(jnp.float32))

        posenc = _RotaryEncoding(self.dim // self.heads, name="posenc")
        p0 = normalize_keypoints(kpts0, size0[0], size0[1])
        p1 = normalize_keypoints(kpts1, size1[0], size1[1])
        cos0, sin0 = posenc(p0)
        cos1, sin1 = posenc(p1)

        for i in range(self.depth):
            sb = _SelfBlock(self.dim, self.heads, self.compute_dtype,
                            self.gelu_approximate, name=f"self_{i}")
            x0 = sb(x0, cos0, sin0, mask0)
            x1 = sb(x1, cos1, sin1, mask1)
            cb = _CrossBlock(self.dim, self.heads, self.compute_dtype,
                             self.gelu_approximate, name=f"cross_{i}")
            x0, x1 = cb(x0, x1, mask0, mask1)

        # Assignment head
        final = nn.Dense(self.dim, name="final_proj")
        md0 = final(x0) / jnp.float32(self.dim) ** 0.25
        md1 = final(x1) / jnp.float32(self.dim) ** 0.25
        sim = jnp.einsum("id,jd->ij", md0, md1,
                         preferred_element_type=jnp.float32)
        matchability = nn.Dense(1, name="matchability")
        z0 = jax.nn.sigmoid(matchability(x0)[:, 0])
        z1 = jax.nn.sigmoid(matchability(x1)[:, 0])

        sim = jnp.where(mask0[:, None] & mask1[None, :], sim, -1e9)
        scores = (
            jax.nn.softmax(sim, axis=1)
            * jax.nn.softmax(sim, axis=0)
            * (z0[:, None] * z1[None, :])
        )
        scores = jnp.where(mask0[:, None] & mask1[None, :], scores, 0.0)

        return _extract_matches(scores, mask0, mask1, self.filter_threshold)


def _extract_matches(scores, mask0, mask1, threshold) -> MatchResult:
    """Mutual-argmax match extraction with confidence threshold."""
    k0, k1 = scores.shape
    m0 = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (K0,)
    m1 = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (K1,)
    s0 = jnp.max(scores, axis=1)
    s1 = jnp.max(scores, axis=0)
    mutual0 = jnp.arange(k0, dtype=jnp.int32) == m1[m0]
    mutual1 = jnp.arange(k1, dtype=jnp.int32) == m0[m1]
    ok0 = mutual0 & (s0 > threshold) & mask0
    ok1 = mutual1 & (s1 > threshold) & mask1
    matches0 = jnp.where(ok0, m0, -1)
    matches1 = jnp.where(ok1, m1, -1)
    return MatchResult(
        matches0=matches0,
        matches1=matches1,
        mscores0=jnp.where(ok0, s0, 0.0),
        mscores1=jnp.where(ok1, s1, 0.0),
        scores=scores,
        stop_layer=jnp.int32(-1),
    )


def apply_lightglue(
    model: "LightGlue",
    params,
    kpts0, desc0, mask0, size0,
    kpts1, desc1, mask1, size1,
) -> MatchResult:
    """Apply a LightGlue model, routing to the fused Mosaic forward on TPU.

    The fused path (``matching/lightglue_fused.py``) runs the same
    computation over the same param tree as nine whole-layer Pallas blocks;
    CPU, unsupported shapes, or ``GISNAV_TPU_FORCE_XLA_LG`` fall back to the
    flax module.
    """
    import os

    if (
        jax.default_backend() not in ("cpu",)
        and not os.environ.get("GISNAV_TPU_FORCE_XLA_LG")
    ):
        from gisnav_tpu.matching.lightglue_fused import (
            fused_lightglue_supported,
            lightglue_fused_forward,
        )

        if fused_lightglue_supported(
            kpts0.shape[0], kpts1.shape[0], model.dim, model.heads
        ):
            return lightglue_fused_forward(
                params,
                kpts0, desc0, mask0, size0,
                kpts1, desc1, mask1, size1,
                depth=model.depth,
                heads=model.heads,
                dim=model.dim,
                filter_threshold=model.filter_threshold,
                compute_dtype=model.compute_dtype,
                gelu_approximate=model.gelu_approximate,
            )
    return model.apply(
        params,
        kpts0, desc0, mask0, size0,
        kpts1, desc1, mask1, size1,
    )


def match_features(
    params,
    feats0,
    size0: tuple,
    feats1,
    size1: tuple,
    *,
    input_dim: int = 256,
    depth: int = 9,
    filter_threshold: float = 0.1,
) -> MatchResult:
    """Functional entry point: match two SuperPointFeatures-like sets.

    ``size`` tuples are (height, width) of the corresponding images.
    """
    model = LightGlue(
        input_dim=input_dim, depth=depth, filter_threshold=filter_threshold
    )
    return apply_lightglue(
        model,
        params,
        feats0.keypoints,
        feats0.descriptors,
        feats0.mask,
        size0,
        feats1.keypoints,
        feats1.descriptors,
        feats1.mask,
        size1,
    )
