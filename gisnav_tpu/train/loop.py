"""Training loop driver for the self-supervised matcher training.

Usage (also exposed as ``python -m gisnav_tpu train`` via the CLI)::

    from gisnav_tpu.train.loop import train
    params = train(steps=1000, ckpt_dir="/tmp/gisnav_ckpt")
"""
from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.train.checkpoint import save_params
from gisnav_tpu.train.data import make_homography_batch
from gisnav_tpu.train.steps import TrainConfig, init_train_state, make_train_step

__all__ = ["train"]

log = logging.getLogger("gisnav_tpu.train")


def train(
    steps: int = 1000,
    batch_size: int = 8,
    config: Optional[TrainConfig] = None,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 200,
    log_every: int = 20,
    seed: int = 0,
    device_data: Optional[bool] = None,
    init_params=None,
):
    """Run self-supervised homography training; returns the final params.

    ``device_data=True`` (default on accelerators) generates supervision
    pairs on-device and advances the loop in jitted multi-step chunks —
    the host only polls metrics. ``False`` uses the host/cv2 generator
    (CPU default, exercised by tests).

    ``init_params``: start from an existing parameter tree (fine-tuning a
    bundled weight set) instead of random init; the optimizer state starts
    fresh. The tree structure must match the config's architecture.
    """
    config = config or TrainConfig()
    if device_data is None:
        device_data = jax.default_backend() not in ("cpu",)
    try:  # persistent jit cache: the train chunk costs minutes to compile
        from gisnav_tpu.utils.jitcache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:  # pragma: no cover - older jax
        pass
    is_loftr = type(config).__name__ == "LoFTRTrainConfig"
    if is_loftr:
        from gisnav_tpu.train.loftr_steps import init_loftr_train_state

        state, tx = init_loftr_train_state(jax.random.PRNGKey(seed), config)
    else:
        state, tx = init_train_state(jax.random.PRNGKey(seed), config)
    if init_params is not None:
        init_params = jax.device_put(init_params)
        ref_struct = jax.tree_util.tree_structure(state.params)
        got_struct = jax.tree_util.tree_structure(init_params)
        if ref_struct != got_struct:
            raise ValueError(
                "init_params tree structure does not match the config's "
                f"architecture: {got_struct} vs {ref_struct}")
        state = state._replace(params=init_params,
                               opt_state=tx.init(init_params))
    t0 = time.time()

    if device_data:
        if is_loftr:
            from gisnav_tpu.train.loftr_steps import (
                make_loftr_device_train_chunk as _make_chunk,
            )
        else:
            from gisnav_tpu.train.steps import (
                make_device_train_chunk as _make_chunk,
            )

        # fixed chunk size: it is baked into the scan length, so keeping it
        # constant lets the persistent jit cache hit across runs/configs
        chunk = 10
        chunk_fn = jax.jit(_make_chunk(config, tx, batch_size, chunk=chunk))
        key = jax.random.PRNGKey(seed + 1)
        done = 0
        metric_key = "coarse_acc" if is_loftr else "gt_recall"
        while done < steps:
            key, sub = jax.random.split(key)
            state, metrics = chunk_fn(state, sub)
            done += chunk
            log.info(
                "step %d loss %.4f %s %.3f (%.2f steps/s)",
                done, float(metrics["loss"]), metric_key,
                float(metrics[metric_key]), done / (time.time() - t0),
            )
            if ckpt_dir and (done % ckpt_every < chunk or done >= steps):
                save_params(ckpt_dir, done, state.params)
        return state.params
    if is_loftr:
        raise NotImplementedError(
            "LoFTR training uses the on-device data path; pass "
            "device_data=True (or run on an accelerator)")

    step_fn = jax.jit(make_train_step(config, tx))
    rng = np.random.default_rng(seed)
    for i in range(1, steps + 1):
        batch = make_homography_batch(rng, batch_size, config.image_shape)
        state, metrics = step_fn(
            state,
            jnp.asarray(batch.image0),
            jnp.asarray(batch.image1),
            jnp.asarray(batch.homography),
        )
        if i % log_every == 0:
            log.info(
                "step %d loss %.4f gt_recall %.3f (%.2f steps/s)",
                i, float(metrics["loss"]), float(metrics["gt_recall"]),
                i / (time.time() - t0),
            )
        if ckpt_dir and (i % ckpt_every == 0 or i == steps):
            save_params(ckpt_dir, i, state.params)
    return state.params
