"""LightGlue weight conversion: official PyTorch checkpoint -> Flax params.

Maps the official LightGlue release layout (Lindenberger et al.,
``lightglue`` repo; the reference consumes it through kornia,
``core/pose_node.py:94-122`` in hmakelin/gisnav) onto this framework's
static-depth module:

- ``input_proj``                          -> input projection
- ``posenc.Wr``                           -> rotary frequency projection
- ``transformers.{i}.self_attn.Wqkv``     -> self_{i}/Wqkv
- ``transformers.{i}.self_attn.out_proj`` -> self_{i}/out_proj
- ``transformers.{i}.self_attn.ffn.*``    -> self_{i}/ffn (Linear, LN, Linear)
- ``transformers.{i}.cross_attn.to_qk/v/out`` and ``.ffn`` -> cross_{i}/*
- last layer's ``log_assignment.{final_proj, matchability}`` -> assignment
  head (the official model carries per-layer heads for its early-exit path;
  the static-depth TPU model keeps only the final one)

Linear kernels transpose from torch (out, in) to Flax (in, out).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

__all__ = ["lightglue_params_from_torch", "load_lightglue_checkpoint"]


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _dense(flat: Mapping[str, np.ndarray], name: str, required=True):
    w = flat.get(f"{name}.weight")
    if w is None:
        if required:
            raise KeyError(f"missing '{name}.weight' in checkpoint")
        return None
    out = {"kernel": np.ascontiguousarray(w.T.astype(np.float32))}
    b = flat.get(f"{name}.bias")
    if b is not None:
        out["bias"] = b.astype(np.float32)
    return out


def _qkv_deinterleave(dense: Dict, heads: int) -> Dict:
    """Fix the fused-projection row order of the official ``Wqkv``.

    The official ``SelfBlock`` unpacks its fused projection with
    ``qkv.unflatten(-1, (num_heads, -1, 3))`` — output order
    ``(head, head_dim, 3)``, i.e. q/k/v INTERLEAVED per scalar — while this
    framework's module reshapes to ``(head, 3, head_dim)`` (component-major).
    Permute the already-transposed flax kernel columns / bias entries from
    ``h*3*dh + d*3 + comp`` to ``h*3*dh + comp*dh + d``.
    """
    kernel = dense["kernel"]  # (in, 3*dim)
    out_dim = kernel.shape[1]
    dh = out_dim // 3 // heads
    kernel = (
        kernel.reshape(-1, heads, dh, 3)
        .transpose(0, 1, 3, 2)
        .reshape(-1, out_dim)
    )
    out = {"kernel": np.ascontiguousarray(kernel)}
    if "bias" in dense:
        out["bias"] = np.ascontiguousarray(
            dense["bias"].reshape(heads, dh, 3).transpose(0, 2, 1).reshape(-1)
        )
    return out


def _ffn(flat, prefix: str) -> Dict:
    """Sequential(Linear(2d,2d), LayerNorm, GELU, Linear(2d,d))."""
    fc1 = _dense(flat, f"{prefix}.0")
    ln_w = flat[f"{prefix}.1.weight"].astype(np.float32)
    ln_b = flat[f"{prefix}.1.bias"].astype(np.float32)
    fc2 = _dense(flat, f"{prefix}.3")
    return {
        "fc1": fc1,
        "norm": {"scale": ln_w, "bias": ln_b},
        "fc2": fc2,
    }


def lightglue_params_from_torch(state_dict: Mapping[str, object],
                                depth: int = 9, heads: int = 4) -> Dict:
    """Convert an official LightGlue state dict to this framework's params.

    :param depth: number of transformer layers to take (<= checkpoint depth)
    :param heads: attention head count (needed to unscramble the fused
        ``Wqkv`` projection's interleaved output order)
    """
    flat = {k: _to_numpy(v) for k, v in state_dict.items()}
    # how many layers does the checkpoint have?
    layer_ids = sorted({
        int(m.group(1))
        for k in flat
        for m in [re.match(r"transformers\.(\d+)\.", k)]
        if m
    })
    if not layer_ids:
        raise KeyError(
            "no 'transformers.N.*' entries found; keys look like: "
            + ", ".join(sorted(flat)[:8])
        )
    if depth > len(layer_ids):
        raise ValueError(f"requested depth {depth} > checkpoint depth "
                         f"{len(layer_ids)}")

    input_proj = _dense(flat, "input_proj", required=False)
    if input_proj is None:
        # superpoint-variant checkpoints (input_dim == dim) carry no
        # input projection (nn.Identity in the official model); this
        # framework's module always projects, so synthesize identity
        dim = flat["posenc.Wr.weight"].shape[0] * 2 * heads
        input_proj = {
            "kernel": np.eye(dim, dtype=np.float32),
            "bias": np.zeros(dim, np.float32),
        }
    params: Dict = {
        "input_proj": input_proj,
        "posenc": {"Wr": _dense(flat, "posenc.Wr")},
    }
    for i in range(depth):
        p = f"transformers.{i}"
        params[f"self_{i}"] = {
            "Wqkv": _qkv_deinterleave(
                _dense(flat, f"{p}.self_attn.Wqkv"), heads),
            "out_proj": _dense(flat, f"{p}.self_attn.out_proj"),
            "ffn": _ffn(flat, f"{p}.self_attn.ffn"),
        }
        params[f"cross_{i}"] = {
            "to_qk": _dense(flat, f"{p}.cross_attn.to_qk"),
            "to_v": _dense(flat, f"{p}.cross_attn.to_v"),
            "to_out": _dense(flat, f"{p}.cross_attn.to_out"),
            "ffn": _ffn(flat, f"{p}.cross_attn.ffn"),
        }
    # assignment head: the official model has one per layer (early exit);
    # take the deepest requested one
    last = depth - 1
    params["final_proj"] = _dense(
        flat, f"log_assignment.{last}.final_proj", required=False
    ) or _dense(flat, "log_assignment.final_proj")
    params["matchability"] = _dense(
        flat, f"log_assignment.{last}.matchability", required=False
    ) or _dense(flat, "log_assignment.matchability")
    return {"params": params}


def load_lightglue_checkpoint(path: str, depth: int = 9) -> Dict:
    """Load a ``.pth`` checkpoint via torch (CPU) and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return lightglue_params_from_torch(state, depth)
