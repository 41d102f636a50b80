"""Training step for the semi-dense LoFTR pipeline variant.

Supervision follows the LoFTR paper's recipe on this framework's on-device
homography pairs (``train/device_data.py``): cross-entropy on the coarse
dual-softmax assignment against ground-truth cell correspondences from the
known 3x3 transform, plus an L2 term on the fine-refined keypoint
reprojection for confidently matched cells.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from gisnav_tpu.matching.loftr import LoFTR
from gisnav_tpu.train.steps import TrainState

__all__ = ["LoFTRTrainConfig", "init_loftr_train_state",
           "make_loftr_train_step", "make_loftr_device_train_chunk"]


@dataclasses.dataclass(frozen=True)
class LoFTRTrainConfig:
    image_shape: Tuple[int, int] = (128, 160)
    max_matches: int = 256
    depth: int = 2
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    fine_loss_weight: float = 0.25
    # curriculum as in train.steps.TrainConfig
    curriculum_steps: int = 2000


def init_loftr_train_state(key, config: LoFTRTrainConfig):
    model = LoFTR(max_matches=config.max_matches, depth=config.depth)
    h, w = config.image_shape
    img = jnp.zeros((h, w), jnp.float32)
    params = {"loftr": model.init(key, img, img)}
    tx = optax.adamw(config.learning_rate,
                     weight_decay=config.weight_decay)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def _coarse_gt(homography, h: int, w: int, stride: int = 8):
    """Ground-truth coarse assignment: for each image0 cell center, the
    image1 cell index it lands in, or -1 when it projects outside."""
    hc, wc = h // stride, w // stride
    ys, xs = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = jnp.stack(
        [(xs.reshape(-1) + 0.5) * stride, (ys.reshape(-1) + 0.5) * stride],
        axis=1,
    ).astype(jnp.float32)  # (N0, 2) xy
    ones = jnp.ones((centers.shape[0], 1), jnp.float32)
    proj = jnp.concatenate([centers, ones], axis=1) @ homography.T
    proj = proj[:, :2] / jnp.maximum(proj[:, 2:3], 1e-6)
    cx = jnp.floor(proj[:, 0] / stride).astype(jnp.int32)
    cy = jnp.floor(proj[:, 1] / stride).astype(jnp.int32)
    inside = (cx >= 0) & (cx < wc) & (cy >= 0) & (cy < hc)
    idx = jnp.where(inside, cy * wc + cx, -1)
    return idx, proj


def make_loftr_train_step(config: LoFTRTrainConfig,
                          tx: optax.GradientTransformation) -> Callable:
    h, w = config.image_shape
    model = LoFTR(max_matches=config.max_matches, depth=config.depth)

    def loss_fn(params, image0, image1, homography):
        def per_pair(im0, im1, hom):
            matches, p = model.apply(params["loftr"], im0, im1,
                                     return_scores=True)
            gt_idx, _ = _coarse_gt(hom, h, w)
            pos = gt_idx >= 0
            n0 = p.shape[0]
            p_gt = p[jnp.arange(n0), jnp.clip(gt_idx, 0)]
            coarse = -jnp.log(jnp.clip(p_gt, 1e-9, 1.0))
            coarse = jnp.sum(jnp.where(pos, coarse, 0.0)) / jnp.maximum(
                jnp.sum(pos), 1.0)

            # fine loss: selected matches' kp1 vs GT projection of kp0
            ones = jnp.ones((matches.kp0.shape[0], 1), jnp.float32)
            proj = jnp.concatenate([matches.kp0, ones], axis=1) @ hom.T
            proj = proj[:, :2] / jnp.maximum(proj[:, 2:3], 1e-6)
            in1 = ((proj[:, 0] >= 0) & (proj[:, 0] < w)
                   & (proj[:, 1] >= 0) & (proj[:, 1] < h))
            sel = matches.mask & in1
            d2 = jnp.sum((matches.kp1 - proj) ** 2, axis=1)
            # Huber-style clamp: wrong coarse cells should not dominate
            d2 = jnp.minimum(d2, 64.0)
            fine = jnp.sum(jnp.where(sel, d2, 0.0)) / jnp.maximum(
                jnp.sum(sel), 1.0)

            # diagnostic: fraction of GT-covered cells matched to the
            # correct cell
            best1 = jnp.argmax(p, axis=1)
            hit = (best1 == gt_idx) & pos
            acc = jnp.sum(hit) / jnp.maximum(jnp.sum(pos), 1.0)
            return coarse + config.fine_loss_weight * fine, acc

        losses, accs = jax.vmap(per_pair)(image0, image1, homography)
        return jnp.mean(losses), jnp.mean(accs)

    def train_step(state: TrainState, image0, image1, homography):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image0, image1, homography
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {
            "loss": loss, "coarse_acc": acc}

    return train_step


def make_loftr_device_train_chunk(config: LoFTRTrainConfig,
                                  tx: optax.GradientTransformation,
                                  batch_size: int, chunk: int = 10
                                  ) -> Callable:
    """Scanned multi-step chunk with on-device data (see
    ``train.steps.make_device_train_chunk``)."""
    from gisnav_tpu.train.device_data import device_batch

    step_fn = make_loftr_train_step(config, tx)

    def chunk_fn(state: TrainState, key):
        def body(st, k):
            if config.curriculum_steps > 0:
                d = jnp.clip(
                    st.step.astype(jnp.float32) / config.curriculum_steps,
                    0.0, 1.0,
                )
            else:
                d = jnp.float32(1.0)
            img0, img1, hom = device_batch(
                k, batch_size, config.image_shape,
                max_angle_deg=20.0 + 160.0 * d,
                max_scale=0.3 + 1.3 * d,
                max_shift=0.06 + 0.06 * d,
                max_blur_sigma=1.6 * d,
            )
            st, metrics = step_fn(st, img0, img1, hom)
            return st, metrics

        keys = jax.random.split(key, chunk)
        state, metrics = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(jnp.mean, metrics)

    return chunk_fn
