"""SuperPoint weight conversion: PyTorch checkpoint -> Flax params.

The reference ships the pretrained weights inside its Docker image
(``docker/mavros/Dockerfile:83-85`` in hmakelin/gisnav); this converter loads
the public MagicLeap ``superpoint_v1.pth`` state dict (or any dict with the
same layer names) into this framework's Flax module. Conv kernels transpose
from torch OIHW to Flax HWIO.

No network access is assumed: pass a local checkpoint path or an
already-loaded mapping of numpy arrays.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["superpoint_params_from_torch", "SUPERPOINT_LAYERS"]

SUPERPOINT_LAYERS = (
    "conv1a", "conv1b", "conv2a", "conv2b",
    "conv3a", "conv3b", "conv4a", "conv4b",
    "convPa", "convPb", "convDa", "convDb",
)


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def superpoint_params_from_torch(state_dict: Mapping[str, object]) -> Dict:
    """Convert a SuperPoint torch state dict to this framework's params.

    :param state_dict: mapping with ``<layer>.weight`` / ``<layer>.bias``
        entries for every layer in :data:`SUPERPOINT_LAYERS` (the MagicLeap
        release layout). Prefixes like ``net.`` are stripped automatically.
    :return: Flax params pytree accepted by ``SuperPoint.apply``
    """
    flat = {}
    for key, value in state_dict.items():
        k = key.split(".")
        # strip any module prefixes: keep the last two components
        if len(k) >= 2:
            flat[(k[-2], k[-1])] = _to_numpy(value)

    params = {}
    for layer in SUPERPOINT_LAYERS:
        if (layer, "weight") not in flat:
            raise KeyError(
                f"missing '{layer}.weight' in checkpoint "
                f"(found layers: {sorted({a for a, _ in flat})})"
            )
        w = flat[(layer, "weight")]
        b = flat[(layer, "bias")]
        # torch conv: (out, in, kh, kw) -> flax: (kh, kw, in, out)
        kernel = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        params[layer] = {"kernel": kernel, "bias": b.astype(np.float32)}
    return {"params": params}


def load_superpoint_checkpoint(path: str) -> Dict:
    """Load a ``.pth`` checkpoint file via torch (CPU) and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return superpoint_params_from_torch(state)
