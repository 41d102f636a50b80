"""Pallas masked attention kernel for the LightGlue matcher.

XLA materializes the (Kq, Kk) attention logits of every layer in HBM
(~134 MB per direction per layer at 2048x4096 f32), making the 9-layer
matcher HBM-bound (~16 ms/frame measured on v5e). This kernel keeps the
logits in VMEM: grid over (heads, query blocks), whole K/V per head resident
in VMEM (Kk <= 8192 at D=64 is ~2 MB), one MXU matmul for the logits, masked
softmax in registers/VMEM, one MXU matmul for the output.

Interface matches ``lightglue._attention`` semantics: additive key mask,
f32 softmax, bf16 matmul inputs with f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_attention_pallas", "pallas_attention_supported"]

_BLK_Q = 256


def pallas_attention_supported(kq: int, kk: int, head_dim: int) -> bool:
    """Shapes the kernel handles: lane-aligned counts, VMEM-resident K/V."""
    return (
        kq % _BLK_Q == 0
        and kk % 128 == 0
        and head_dim in (32, 64, 128)
        and kk * head_dim * 4 <= 4 * 1024 * 1024
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_attention_pallas(q, k, v, mask_k, compute_dtype=jnp.bfloat16):
    """softmax(q k^T / sqrt(D) + mask_bias) v with a key-side mask.

    Forward runs the Mosaic kernel; the backward pass (training) recomputes
    the attention weights with the analytic gradients in plain XLA.

    :param q: (Kq, H, D)
    :param k, v: (Kk, H, D)
    :param mask_k: (Kk,) bool — False keys are excluded
    :return: (Kq, H, D) float32
    """
    kq, h, d = q.shape
    kk = k.shape[0]
    scale = 1.0 / float(d) ** 0.5

    qh = jnp.transpose(q, (1, 0, 2)).astype(compute_dtype)  # (H, Kq, D)
    kh = jnp.transpose(k, (1, 0, 2)).astype(compute_dtype)
    vh = jnp.transpose(v, (1, 0, 2)).astype(compute_dtype)
    bias = jnp.where(mask_k, 0.0, -1e9).astype(jnp.float32)[None, :]  # (1,Kk)

    def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
        logits = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLK_Q, Kk) f32
        logits = logits + bias_ref[:]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        attn = (p / denom).astype(compute_dtype)
        out_ref[0] = jax.lax.dot_general(
            attn, v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        grid=(h, kq // _BLK_Q),
        in_specs=[
            pl.BlockSpec((1, _BLK_Q, d), lambda hi, qi: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, d), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, d), lambda hi, qi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk), lambda hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK_Q, d), lambda hi, qi: (hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, kq, d), jnp.float32),
    )(qh, kh, vh, bias)
    return jnp.transpose(out, (1, 0, 2))


def _attention_fwd(q, k, v, mask_k, compute_dtype=jnp.bfloat16):
    out = masked_attention_pallas(q, k, v, mask_k, compute_dtype)
    return out, (q, k, v, mask_k)


def _attention_bwd(compute_dtype, residuals, g):
    """Analytic attention backward (recompute weights in f32 XLA)."""
    del compute_dtype
    q, k, v, mask_k = residuals
    d = q.shape[-1]
    scale = 1.0 / float(d) ** 0.5
    logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = jnp.where(mask_k[None, None, :], logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)  # (H, Kq, Kk)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("hqk,qhd->khd", p, gf)
    dp = jnp.einsum("qhd,khd->hqk", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("hqk,khd->qhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("hqk,qhd->khd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


masked_attention_pallas.defvjp(_attention_fwd, _attention_bwd)
