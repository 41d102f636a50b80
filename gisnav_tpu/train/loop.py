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
):
    """Run self-supervised homography training; returns the final params."""
    config = config or TrainConfig()
    state, tx = init_train_state(jax.random.PRNGKey(seed), config)
    step_fn = jax.jit(make_train_step(config, tx))
    rng = np.random.default_rng(seed)

    t0 = time.time()
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
