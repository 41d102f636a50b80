"""Jitted training steps for SuperPoint + LightGlue (joint, end-to-end).

One ``train_step`` is the unit the driver's multi-chip dry-run compiles over a
(data, model) mesh: images are sharded over the ``data`` axis (one camera
stream / batch slice per device group) and Dense kernels may be output-sharded
over ``model`` (see ``parallel.mesh``). Gradients flow through the LightGlue
assignment into SuperPoint's descriptor head and encoder; the keypoint top-k
is non-differentiable by construction (standard for this model family).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gisnav_tpu.features.superpoint import SuperPoint
from gisnav_tpu.matching.lightglue import LightGlue
from gisnav_tpu.pipeline.geopose import PipelineConfig, init_pipeline_params

__all__ = ["TrainState", "init_train_state", "make_train_step", "matcher_loss"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    image_shape: Tuple[int, int] = (128, 160)
    max_keypoints: int = 256
    lightglue_depth: int = 3
    # NOTE: depth>=5 LightGlue dustbin-collapses at 3e-4; 1e-4 is stable
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    gt_radius_px: float = 3.0  # keypoint-reprojection radius for positives
    detector_mode: str = "learned"  # "harris" = train descriptors/matcher only
    detector_loss_weight: float = 1.0  # Harris-distillation CE ("learned")
    # curriculum: augmentation difficulty ramps 0 -> 1 over this many steps
    # (cold-start on the full 180-deg/2.6x-scale/blur task never leaves the
    # random-matcher plateau; easy-first reaches 0.97 GT recall in 600 steps
    # at the same lr -- measured on-TPU, see train/device_data.py ranges)
    curriculum_steps: int = 4000


def init_train_state(key, config: TrainConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    pcfg = PipelineConfig(
        image_shape=config.image_shape,
        max_keypoints=config.max_keypoints,
        lightglue_depth=config.lightglue_depth,
        detector_mode=config.detector_mode,
    )
    params = init_pipeline_params(key, pcfg)
    tx = optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32)), tx


def _ground_truth_assignment(kp0, mask0, kp1, mask1, homography, radius):
    """GT match index for each kp0 from the known homography (or -1)."""
    ones = jnp.ones((kp0.shape[0], 1), kp0.dtype)
    proj = jnp.concatenate([kp0, ones], axis=1) @ homography.T
    proj = proj[:, :2] / jnp.maximum(proj[:, 2:3], 1e-6)
    d2 = jnp.sum((proj[:, None, :] - kp1[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(mask1[None, :], d2, jnp.inf)
    nn = jnp.argmin(d2, axis=1).astype(jnp.int32)
    ok = (jnp.min(d2, axis=1) < radius * radius) & mask0
    return jnp.where(ok, nn, -1)


def matcher_loss(scores, gt_idx, mask0):
    """LightGlue-style NLL: -log P(i, gt_i) for positives, -log(1 - sum_j
    P(i, :)) for confirmed negatives."""
    k0, k1 = scores.shape
    pos = gt_idx >= 0
    p_match = scores[jnp.arange(k0), jnp.clip(gt_idx, 0)]
    pos_loss = -jnp.log(jnp.clip(p_match, 1e-9, 1.0))
    row_sum = jnp.sum(scores, axis=1)
    neg_loss = -jnp.log(jnp.clip(1.0 - row_sum, 1e-9, 1.0))
    loss = jnp.where(pos, pos_loss, jnp.where(mask0, neg_loss, 0.0))
    denom = jnp.maximum(jnp.sum(mask0), 1.0)
    return jnp.sum(loss) / denom


def _harris_cell_labels(image: jnp.ndarray, thr: float = 0.02
                        ) -> jnp.ndarray:
    """(H, W) image -> (H/8, W/8) int32 cell labels distilling Harris.

    Per 8x8 cell: index (0..63) of the NMS'd Harris response argmax, or 64
    (the SuperPoint dustbin) when the cell has no corner above ``thr``.
    This is the original SuperPoint supervised recipe (MagicLeap trains on
    synthetic-corner pseudo-labels; our training textures are synthetic
    corner-rich blobs where Harris IS near-ground-truth), so the learned
    head trains jointly with the matcher without an external checkpoint.
    """
    from gisnav_tpu.features.harris import harris_response
    from gisnav_tpu.features.nms import simple_nms

    h, w = image.shape
    hc, wc = h // 8, w // 8
    nms = simple_nms(harris_response(image), radius=4)
    cells = nms.reshape(hc, 8, wc, 8).transpose(0, 2, 1, 3)
    cells = cells.reshape(hc, wc, 64)
    cmax = jnp.max(cells, axis=-1)
    carg = jnp.argmax(cells, axis=-1).astype(jnp.int32)
    return jnp.where(cmax > thr, carg, 64)


def detector_distill_loss(logits: jnp.ndarray, images: jnp.ndarray
                          ) -> jnp.ndarray:
    """Cross-entropy of the (B, hc, wc, 65) detector cell logits against
    per-image Harris pseudo-labels."""
    labels = jax.vmap(_harris_cell_labels)(images.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(ce)


def make_train_step(config: TrainConfig, tx: optax.GradientTransformation
                    ) -> Callable:
    """Build the jittable (state, batch) -> (state, metrics) step.

    ``batch`` is a ``MatchBatch``-like pytree of (B, H, W) image pairs and
    (B, 3, 3) homographies; the whole forward runs batched via vmap.
    """
    h, w = config.image_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    detector_mode=config.detector_mode,
                    conv_backend="xla_batched")
    lg = LightGlue(depth=config.lightglue_depth, filter_threshold=0.0)

    def loss_fn(params, image0, image1, homography):
        # SuperPoint runs natively batched over the stacked (2B, H, W)
        # images: its trunk unrolls the batch loop, keeping the fused
        # Pallas conv kernels un-vmapped (Mosaic rejects batched
        # ANY-memory-space blocks, see features/pallas_conv.py). Only the
        # matcher + loss are vmapped per pair.
        bsz = image0.shape[0]
        images = jnp.concatenate([image0, image1], axis=0)
        feats, det_logits = sp.apply(
            params["superpoint"], images, return_logits=True,
        )
        f0s = jax.tree.map(lambda a: a[:bsz], feats)
        f1s = jax.tree.map(lambda a: a[bsz:], feats)

        def per_pair(f0, f1, hom):
            res = lg.apply(
                params["lightglue"],
                f0.keypoints, f0.descriptors, f0.mask, (h, w),
                f1.keypoints, f1.descriptors, f1.mask, (h, w),
            )
            gt = _ground_truth_assignment(
                f0.keypoints, f0.mask, f1.keypoints, f1.mask, hom,
                config.gt_radius_px,
            )
            loss = matcher_loss(res.scores, gt, f0.mask)
            # recall among GT positives (diagnostic, no gradient needed)
            hit = (res.matches0 == gt) & (gt >= 0)
            recall = jnp.sum(hit) / jnp.maximum(jnp.sum(gt >= 0), 1)
            return loss, recall

        losses, recalls = jax.vmap(per_pair)(f0s, f1s, homography)
        loss = jnp.mean(losses)
        if det_logits is not None:
            loss = loss + config.detector_loss_weight * detector_distill_loss(
                det_logits, images)
        return loss, jnp.mean(recalls)

    def train_step(state: TrainState, image0, image1, homography):
        (loss, recall), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image0, image1, homography
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss, "gt_recall": recall}

    return train_step


@dataclasses.dataclass(frozen=True)
class CachedRegimeConfig:
    """Asymmetric (cached-reference deployment regime) fine-tune config.

    Matches what ``build_frame_to_geopose_cached`` sees at inference: a
    small rotated query against a LARGE north-up reference raster with a
    spatially uniform (tiled) keypoint budget, where most keypoints on
    both sides are unmatched. Symmetric-pair training alone leaves the
    matcher weak in this regime (measured: 7/10 valid poses on the
    synthetic sweep vs 10/10 for the scale/rotation-aligned warp mode).
    """

    q_shape: Tuple[int, int] = (256, 320)
    r_shape: Tuple[int, int] = (576, 640)
    q_keypoints: int = 256
    r_keypoints: int = 512
    r_tile_grid: Tuple[int, int] = (4, 4)
    lightglue_depth: int = 5
    learning_rate: float = 5e-5  # fine-tune from the symmetric checkpoint
    weight_decay: float = 1e-5
    gt_radius_px: float = 4.0  # in reference px (coarser than the query)
    detector_mode: str = "harris"
    curriculum_steps: int = 1000  # angle/blur ramp (scale stays asymmetric)


def make_cached_regime_train_step(config: CachedRegimeConfig,
                                  tx: optax.GradientTransformation
                                  ) -> Callable:
    """Asymmetric train step: query and reference go through SEPARATE
    extractor configs (global top-k vs tiled budget, different shapes),
    then the standard matcher NLL against the known query->ref transform."""
    hq, wq = config.q_shape
    hr, wr = config.r_shape
    sp_q = SuperPoint(max_keypoints=config.q_keypoints,
                      detector_mode=config.detector_mode,
                      conv_backend="xla_batched")
    sp_r = SuperPoint(max_keypoints=config.r_keypoints,
                      detector_mode=config.detector_mode,
                      select_tiles=config.r_tile_grid,
                      conv_backend="xla_batched")
    lg = LightGlue(depth=config.lightglue_depth, filter_threshold=0.0)

    def loss_fn(params, query, ref, transform):
        fq = sp_q.apply(params["superpoint"], query)
        fr = sp_r.apply(params["superpoint"], ref)

        def per_pair(f0, f1, hom):
            res = lg.apply(
                params["lightglue"],
                f0.keypoints, f0.descriptors, f0.mask, (hq, wq),
                f1.keypoints, f1.descriptors, f1.mask, (hr, wr),
            )
            gt = _ground_truth_assignment(
                f0.keypoints, f0.mask, f1.keypoints, f1.mask, hom,
                config.gt_radius_px,
            )
            loss = matcher_loss(res.scores, gt, f0.mask)
            hit = (res.matches0 == gt) & (gt >= 0)
            recall = jnp.sum(hit) / jnp.maximum(jnp.sum(gt >= 0), 1)
            return loss, recall

        losses, recalls = jax.vmap(per_pair)(fq, fr, transform)
        return jnp.mean(losses), jnp.mean(recalls)

    def train_step(state: TrainState, query, ref, transform):
        (loss, recall), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, query, ref, transform
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), {
            "loss": loss, "gt_recall": recall}

    return train_step


def make_cached_regime_chunk(config: CachedRegimeConfig,
                             tx: optax.GradientTransformation,
                             batch_size: int, chunk: int = 10) -> Callable:
    """Scanned on-device chunk for the asymmetric fine-tune."""
    from gisnav_tpu.train.device_data import device_batch_asymmetric

    step_fn = make_cached_regime_train_step(config, tx)

    def chunk_fn(state: TrainState, key):
        def body(st, k):
            if config.curriculum_steps > 0:
                d = jnp.clip(
                    st.step.astype(jnp.float32) / config.curriculum_steps,
                    0.0, 1.0,
                )
            else:
                d = jnp.float32(1.0)
            q, r, hom = device_batch_asymmetric(
                k, batch_size, config.q_shape, config.r_shape,
                max_angle_deg=30.0 + 150.0 * d,
                max_blur_sigma=1.2 * d,
                shadow_strength=0.45 * d,
            )
            st, metrics = step_fn(st, q, r, hom)
            return st, metrics

        keys = jax.random.split(key, chunk)
        state, metrics = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(jnp.mean, metrics)

    return chunk_fn


def make_device_train_chunk(config: TrainConfig,
                            tx: optax.GradientTransformation,
                            batch_size: int, chunk: int = 20) -> Callable:
    """Build a jittable (state, key) -> (state, metrics) that runs ``chunk``
    train steps with ON-DEVICE data generation inside one ``lax.scan``.

    Removes the host from the loop entirely: supervision pairs come from
    ``train.device_data.device_batch`` on the accelerator, and one host
    round-trip advances ``chunk`` steps (the dev-tunnel TPU moves ~15 MB/s
    with ~30 ms RTT — per-step host batches would dominate wall-clock).
    """
    from gisnav_tpu.train.device_data import device_batch

    step_fn = make_train_step(config, tx)

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
                shadow_strength=0.45 * d,
            )
            st, metrics = step_fn(st, img0, img1, hom)
            return st, metrics

        keys = jax.random.split(key, chunk)
        state, metrics = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(jnp.mean, metrics)

    return chunk_fn
