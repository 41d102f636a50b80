"""Device mesh + sharding helpers for multi-stream scale-out.

The reference has no tensor distribution at all — its "parallelism" is one OS
process per ROS node (SURVEY.md section 2.3). The TPU-native equivalents here:

- ``data`` mesh axis: N concurrent camera streams batched into one pjit'd
  program (BASELINE.json config 5: 8 feeds on a v5e-8); collectives ride ICI.
- ``model`` mesh axis: tensor-parallel sharding of the matcher/extractor
  weights (output-dim sharded Dense kernels; XLA inserts the all-reduces).
  SuperPoint+LightGlue fit easily in one chip's HBM, so TP is off (size 1) by
  default and exists for headroom experiments and as the generic mechanism.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_params_tp"]


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    :param n_devices: total devices to use (default: all)
    :param model_parallel: size of the model (tensor-parallel) axis
    """
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batched arrays with the leading axis sharded over
    ``data`` (one camera stream per data-slice)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def _tp_spec(path_str: str, value, model_axis: str) -> P:
    """Tensor-parallel spec for one parameter.

    Dense kernels (2D) shard their OUTPUT features over the model axis;
    matching biases (1D) shard likewise; everything else (conv kernels,
    layernorm scales) is replicated. XLA inserts the reduce-scatter /
    all-gather at the sharding boundaries.
    """
    if value.ndim == 2 and "kernel" in path_str:
        return P(None, model_axis)
    if value.ndim == 1 and "bias" in path_str and value.shape[0] % 2 == 0:
        return P(model_axis)
    return P()


def shard_params_tp(mesh: Mesh, params, model_axis: str = "model"):
    """Annotate a parameter pytree with tensor-parallel NamedShardings.

    With ``model`` axis size 1 this is equivalent to replication and costs
    nothing; with size > 1, Dense layers are output-sharded.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    model_size = mesh.shape[model_axis]
    for path, value in flat:
        path_str = "/".join(str(p) for p in path)
        spec = _tp_spec(path_str, value, model_axis)
        # only shard dims that divide evenly; fall back to replication
        ok = True
        for dim, name in zip(value.shape, spec + (None,) * value.ndim):
            if name is not None and dim % model_size:
                ok = False
        if not ok:
            spec = P()
        out.append(jax.device_put(value, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
