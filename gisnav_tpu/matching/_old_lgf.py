"""Fused LightGlue forward pass (Pallas/Mosaic, TPU inference hot path).

The flax module in ``matching/lightglue.py`` is the definition of record
(training, CPU, parity). At 2048x4096 keypoints its XLA lowering spends
~0.36 ms/layer outside attention: every sub-op (out_proj, FFN concat,
LayerNorm, gelu, residual) round-trips the (K, 256) activations through HBM,
and the (K, H, D) head layout forces transposes around each attention call.

This module runs the SAME computation (same param tree — converted kornia
checkpoints load unchanged) as nine fused transformer layers:

- **one Mosaic program per attention block** (self x2, cross x2 per layer):
  grid over 512-row query blocks; keys/values for the whole opposite set
  stay VMEM-resident; per head the (BLK, Kk) logits, softmax, message,
  out-projection, the [x | message] FFN (as two matmuls — the concat never
  exists), LayerNorm, gelu and the residual all happen in VMEM; only the
  updated (K, 256) activations return to HBM.
- **2D activations everywhere**: heads are static 64-lane slices inside the
  kernel, never a separate array axis, so the XLA-level transposes vanish.
- **rotary via weight permutation**: the Wqkv columns are permuted once per
  call so each head's q/k lanes hold [even pairs | odd pairs]; the rotary
  rotation is then plain elementwise math plus one 32-lane block swap
  (no strided even/odd deinterleave of activations).

Backward (training on TPU) recomputes each block through an XLA reference
implementation via ``jax.custom_vjp`` — same pattern as features/pallas_conv.

Replaces the reference's kornia ``LightGlueMatcher`` hot loop
(``core/pose_node.py:246-297`` in hmakelin/gisnav).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gisnav_tpu.matching.lightglue import (
    MatchResult,
    _extract_matches,
    normalize_keypoints,
)

__all__ = ["fused_lightglue_supported", "lightglue_fused_forward"]

_BLK_Q = 512
_LN_EPS = 1e-6


def fused_lightglue_supported(k0: int, k1: int, dim: int, heads: int) -> bool:
    """Shapes the fused path handles (else: flax/XLA module path)."""
    return (
        dim == 256
        and heads == 4
        and k0 % _BLK_Q == 0
        and k1 % _BLK_Q == 0
        and max(k0, k1) * dim * 2 * 2 <= 16 * 1024 * 1024
    )


# ---------------------------------------------------------------------------
# Fused attention + out_proj + FFN block kernel
# ---------------------------------------------------------------------------


def _gelu(x, approximate: bool):
    if approximate:  # flax nn.gelu(approximate=True)
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))
    # exact (erf) gelu: official LightGlue checkpoints use nn.GELU()
    return 0.5 * x * (1.0 + jax.lax.erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _block_kernel(heads, dh, scale, gelu_approximate, x_ref, q_ref, k_ref,
                  v_ref, bias_ref, wout_ref, bout_ref, w1x_ref, w1m_ref,
                  b1_ref, lns_ref, lnb_ref, w2_ref, b2_ref, out_ref, msg):
    for h in range(heads):
        qh = q_ref[:, h * dh:(h + 1) * dh]
        kh = k_ref[:, h * dh:(h + 1) * dh]
        vh = v_ref[:, h * dh:(h + 1) * dh]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[...]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        attn = (p / denom).astype(qh.dtype)
        msg[:, h * dh:(h + 1) * dh] = jax.lax.dot_general(
            attn, vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # out_proj (Dense bf16 semantics: bf16 out, then FFN casts as needed)
    m2 = (jax.lax.dot_general(
        msg[...].astype(q_ref.dtype), wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...]).astype(q_ref.dtype)
    # FFN: fc1([x | msg]) == x @ W1x + msg @ W1m (concat never materalized)
    xb = x_ref[...]
    y = (
        jax.lax.dot_general(
            xb.astype(q_ref.dtype), w1x_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            m2, w1m_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    # match the module path's fc1 bf16 rounding before the f32 LayerNorm
    y = y.astype(q_ref.dtype).astype(jnp.float32)
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(y * y, axis=1, keepdims=True) - mu * mu, 0.0)
    yn = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * lns_ref[...] + lnb_ref[...]
    g = _gelu(yn, gelu_approximate)
    y2 = jax.lax.dot_general(
        g.astype(q_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]
    # match the module path's fc2 bf16 output rounding before the residual
    y2 = y2.astype(q_ref.dtype).astype(jnp.float32)
    out_ref[...] = (xb.astype(jnp.float32) + y2).astype(out_ref.dtype)


def _block_pallas(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb,
                  w2, b2, *, heads: int, gelu_approximate: bool = True):
    """One fused transformer block: x + FFN([x | out_proj(attn(q, k, v))]).

    :param x: (Kq, dim) f32 residual stream
    :param q: (Kq, dim) bf16 (rotated) queries, head h at lanes [h*dh, ...)
    :param k, v: (Kk, dim) bf16 keys / values, same head layout
    :param bias_k: (1, Kk) f32 additive key mask (0 / -1e9)
    :return: (Kq, dim) f32
    """
    kq, dim = x.shape
    kk = k.shape[0]
    dh = dim // heads
    scale = 1.0 / float(dh) ** 0.5

    kernel = functools.partial(_block_kernel, heads, dh, scale,
                               gelu_approximate)
    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(kq // _BLK_Q,),
        in_specs=[
            pl.BlockSpec((_BLK_Q, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((_BLK_Q, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((kk, dim), const, memory_space=pltpu.VMEM),  # k
            pl.BlockSpec((kk, dim), const, memory_space=pltpu.VMEM),  # v
            pl.BlockSpec((1, kk), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, 2 * dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, 2 * dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * dim, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK_Q, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kq, dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BLK_Q, dim), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * kq * kk * dim * 2
            + 2 * kq * dim * (dim + 2 * 2 * dim * 2),
            bytes_accessed=(2 * kq * dim + 2 * kk * dim) * 2
            + 2 * kq * dim * 4,
            transcendentals=kq * (heads * kk + 3 * dim),
        ),
    )(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb, w2, b2)


def _block_reference(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb,
                     w2, b2, *, heads: int, gelu_approximate: bool = True):
    """XLA mirror of the fused block (backward pass + CPU parity)."""
    kq, dim = x.shape
    kk = k.shape[0]
    dh = dim // heads
    scale = 1.0 / float(dh) ** 0.5
    qh = q.reshape(kq, heads, dh)
    khh = k.reshape(kk, heads, dh)
    vh = v.reshape(kk, heads, dh)
    logits = jnp.einsum("qhd,khd->hqk", qh, khh,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_k[None, :, :]
    p = jax.nn.softmax(logits, axis=-1)
    msg = jnp.einsum("hqk,khd->qhd", p.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)
    msg = msg.reshape(kq, dim)
    m2 = (jnp.dot(msg.astype(q.dtype), wout,
                  preferred_element_type=jnp.float32) + bout).astype(q.dtype)
    y = (
        jnp.dot(x.astype(q.dtype), w1x, preferred_element_type=jnp.float32)
        + jnp.dot(m2, w1m, preferred_element_type=jnp.float32)
        + b1
    )
    y = y.astype(q.dtype).astype(jnp.float32)
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(y * y, axis=1, keepdims=True) - mu * mu, 0.0)
    yn = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * lns + lnb
    g = _gelu(yn, gelu_approximate)
    y2 = jnp.dot(g.astype(q.dtype), w2,
                 preferred_element_type=jnp.float32) + b2
    y2 = y2.astype(q.dtype).astype(jnp.float32)
    return x.astype(jnp.float32) + y2


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def fused_block(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb,
                w2, b2, heads=4, gelu_approximate=True):
    if jax.default_backend() in ("cpu",):
        return _block_reference(x, q, k, v, bias_k, wout, bout, w1x, w1m,
                                b1, lns, lnb, w2, b2, heads=heads,
                                gelu_approximate=gelu_approximate)
    return _block_pallas(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1,
                         lns, lnb, w2, b2, heads=heads,
                         gelu_approximate=gelu_approximate)


def _fused_block_fwd(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb,
                     w2, b2, heads, gelu_approximate):
    out = fused_block(x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns,
                      lnb, w2, b2, heads, gelu_approximate)
    return out, (x, q, k, v, bias_k, wout, bout, w1x, w1m, b1, lns, lnb,
                 w2, b2)


def _fused_block_bwd(heads, gelu_approximate, residuals, g):
    args = residuals
    out, vjp = jax.vjp(
        lambda *a: _block_reference(
            *a, heads=heads, gelu_approximate=gelu_approximate), *args)
    grads = vjp(g.astype(out.dtype))
    return grads


fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# ---------------------------------------------------------------------------
# Rotary via weight permutation
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _qkv_perm(heads: int, dh: int) -> np.ndarray:
    """Column permutation of the Wqkv kernel: natural flax layout
    ``j = h*(3*dh) + comp*dh + d`` (from ``reshape(K, H, 3, D)``) to
    component-major 2D layout with q/k pair-split lanes:

    - q/k: target ``comp*H*dh + h*dh + (d%2)*(dh/2) + d//2`` — per head the
      first dh/2 lanes hold even (pair) components, the next dh/2 the odd
      ones, so rotary becomes elementwise math + one 32-lane block swap;
    - v: natural per-head order (``out_proj`` rows expect it).
    """
    perm = np.zeros(heads * 3 * dh, np.int64)
    for h in range(heads):
        for comp in range(3):
            for d in range(dh):
                j = h * 3 * dh + comp * dh + d
                if comp < 2:
                    t = comp * heads * dh + h * dh + (d % 2) * (dh // 2) \
                        + d // 2
                else:
                    t = comp * heads * dh + h * dh + d
                perm[t] = j
    return perm


def _rotate_halfsplit(q2d, cos, sin, heads, dh):
    """Apply rotary to pair-split (K, heads*dh) q/k lanes.

    ``cos``/``sin`` are (K, dh/2) per-pair phases. With lanes laid out
    [evens | odds] per head: out = q * C + swap(q) * S where swap exchanges
    the two dh/2 halves of each head and S carries -sin on the even half.
    """
    k = q2d.shape[0]
    c64 = jnp.concatenate([cos, cos], axis=1)
    s64 = jnp.concatenate([-sin, sin], axis=1)
    cfull = jnp.tile(c64, (1, heads))
    sfull = jnp.tile(s64, (1, heads))
    swap = jnp.flip(
        q2d.reshape(k, heads, 2, dh // 2), axis=2
    ).reshape(k, heads * dh)
    return (
        q2d.astype(jnp.float32) * cfull + swap.astype(jnp.float32) * sfull
    )


# ---------------------------------------------------------------------------
# Functional forward over the flax param tree
# ---------------------------------------------------------------------------


def _p(tree, *path):
    node = tree["params"] if "params" in tree else tree
    for key in path:
        node = node[key]
    return node


def lightglue_fused_forward(
    params,
    kpts0, desc0, mask0, size0,
    kpts1, desc1, mask1, size1,
    *,
    depth: int = 9,
    heads: int = 4,
    dim: int = 256,
    filter_threshold: float = 0.1,
    compute_dtype=jnp.bfloat16,
    gelu_approximate: bool = True,
) -> MatchResult:
    """Run the LightGlue forward with fused Mosaic layer blocks.

    Parameters are the ``LightGlue`` flax tree (converted checkpoints load
    unchanged); results match ``model.apply`` to bf16 tolerance.
    """
    dh = dim // heads
    cd = compute_dtype

    wi = _p(params, "input_proj", "kernel").astype(jnp.float32)
    bi = _p(params, "input_proj", "bias").astype(jnp.float32)
    x0 = desc0.astype(jnp.float32) @ wi + bi
    x1 = desc1.astype(jnp.float32) @ wi + bi

    wr = _p(params, "posenc", "Wr", "kernel").astype(jnp.float32)
    p0 = normalize_keypoints(kpts0, size0[0], size0[1]) @ wr
    p1 = normalize_keypoints(kpts1, size1[0], size1[1]) @ wr
    cos0, sin0 = jnp.cos(p0), jnp.sin(p0)
    cos1, sin1 = jnp.cos(p1), jnp.sin(p1)

    bias0 = jnp.where(mask0, 0.0, -1e9).astype(jnp.float32)[None, :]
    bias1 = jnp.where(mask1, 0.0, -1e9).astype(jnp.float32)[None, :]

    perm = jnp.asarray(_qkv_perm(heads, dh))

    def ffn_weights(layer):
        f = _p(params, layer, "ffn")
        w1 = f["fc1"]["kernel"].astype(cd)
        return (
            w1[:dim], w1[dim:],
            f["fc1"]["bias"].astype(jnp.float32)[None, :],
            f["norm"]["scale"].astype(jnp.float32)[None, :],
            f["norm"]["bias"].astype(jnp.float32)[None, :],
            f["fc2"]["kernel"].astype(cd),
            f["fc2"]["bias"].astype(jnp.float32)[None, :],
        )

    for i in range(depth):
        # ---- self attention (both sets, shared weights) -----------------
        name = f"self_{i}"
        wqkv = _p(params, name, "Wqkv", "kernel")[:, perm].astype(cd)
        bqkv = _p(params, name, "Wqkv", "bias")[perm].astype(cd)
        wout = _p(params, name, "out_proj", "kernel").astype(cd)
        bout = _p(params, name, "out_proj", "bias") \
            .astype(jnp.float32)[None, :]
        fw = ffn_weights(name)

        def self_block(x, cos, sin, bias):
            qkv = x.astype(cd) @ wqkv + bqkv
            q = _rotate_halfsplit(qkv[:, :dim], cos, sin, heads, dh) \
                .astype(cd)
            k = _rotate_halfsplit(qkv[:, dim:2 * dim], cos, sin, heads, dh) \
                .astype(cd)
            v = qkv[:, 2 * dim:]
            return fused_block(x, q, k, v, bias, wout, bout, *fw, heads,
                               gelu_approximate)

        x0 = self_block(x0, cos0, sin0, bias0)
        x1 = self_block(x1, cos1, sin1, bias1)

        # ---- bidirectional cross attention ------------------------------
        name = f"cross_{i}"
        wqk = _p(params, name, "to_qk", "kernel").astype(cd)
        bqk = _p(params, name, "to_qk", "bias").astype(cd)
        wv = _p(params, name, "to_v", "kernel").astype(cd)
        bv = _p(params, name, "to_v", "bias").astype(cd)
        wo = _p(params, name, "to_out", "kernel").astype(cd)
        bo = _p(params, name, "to_out", "bias").astype(jnp.float32)[None, :]
        fw = ffn_weights(name)

        qk0 = x0.astype(cd) @ wqk + bqk
        qk1 = x1.astype(cd) @ wqk + bqk
        v0 = x0.astype(cd) @ wv + bv
        v1 = x1.astype(cd) @ wv + bv
        x0n = fused_block(x0, qk0, qk1, v1, bias1, wo, bo, *fw, heads,
                          gelu_approximate)
        x1n = fused_block(x1, qk1, qk0, v0, bias0, wo, bo, *fw, heads,
                          gelu_approximate)
        x0, x1 = x0n, x1n

    # ---- assignment head (XLA; small) -----------------------------------
    wf = _p(params, "final_proj", "kernel").astype(jnp.float32)
    bf = _p(params, "final_proj", "bias").astype(jnp.float32)
    md0 = (x0 @ wf + bf) / jnp.float32(dim) ** 0.25
    md1 = (x1 @ wf + bf) / jnp.float32(dim) ** 0.25
    sim = jnp.einsum("id,jd->ij", md0, md1,
                     preferred_element_type=jnp.float32)
    wm = _p(params, "matchability", "kernel").astype(jnp.float32)
    bm = _p(params, "matchability", "bias").astype(jnp.float32)
    z0 = jax.nn.sigmoid((x0 @ wm + bm)[:, 0])
    z1 = jax.nn.sigmoid((x1 @ wm + bm)[:, 0])

    pairmask = mask0[:, None] & mask1[None, :]
    sim = jnp.where(pairmask, sim, -1e9)
    scores = (
        jax.nn.softmax(sim, axis=1)
        * jax.nn.softmax(sim, axis=0)
        * (z0[:, None] * z1[None, :])
    )
    scores = jnp.where(pairmask, scores, 0.0)
    return _extract_matches(scores, mask0, mask1, filter_threshold)
