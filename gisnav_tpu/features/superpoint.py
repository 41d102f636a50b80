"""SuperPoint keypoint detector + descriptor network (Flax linen).

TPU-native replacement for the reference's CPU SIFT extraction
(``core/twist_node.py:60-93,227-232`` and ``core/pose_node.py:226-241`` in
hmakelin/gisnav): a small VGG-style CNN whose conv stacks run on the MXU in
bf16, with a fixed-size top-K keypoint head (see ``features.nms``) instead of
ragged cv2 keypoint lists.

Architecture follows the published SuperPoint design (DeTone et al. 2018,
MagicLeap release): shared VGG encoder (64-64-64-64-128-128-128-128, three
2x2 maxpools), a 65-channel detector head decoded by 8x8 pixel-shuffle, and a
256-d descriptor head sampled bilinearly at keypoint locations. Weight layout
is kept converter-compatible with the public PyTorch checkpoint (see
``features/convert.py``).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gisnav_tpu.features.nms import select_keypoints

__all__ = ["SuperPoint", "SuperPointFeatures", "extract_features"]


class SuperPointFeatures(NamedTuple):
    """Fixed-size feature set for one image."""

    keypoints: jnp.ndarray  # (K, 2) float32 pixel xy
    scores: jnp.ndarray  # (K,) detector confidence
    descriptors: jnp.ndarray  # (K, 256) L2-normalized
    mask: jnp.ndarray  # (K,) bool — False for padded slots


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact param tree (HWIO kernel, bias).

    The compute is routed explicitly (fused Pallas stage on TPU, XLA conv
    elsewhere) instead of through nn.Conv, but checkpoints stay
    layout-compatible with both nn.Conv and the torch converter
    (features/convert.py).
    """

    features: int
    kernel_hw: tuple = (3, 3)

    @nn.compact
    def __call__(self, in_features: int):
        kh, kw = self.kernel_hw
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


def _conv_relu_xla(x, kernel, bias, dtype):
    """Plain 3x3 SAME conv + relu (used for the 1-channel stem)."""
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return nn.relu(out.astype(jnp.float32) + bias).astype(dtype)


class SuperPoint(nn.Module):
    """SuperPoint forward pass for a single grayscale image.

    Input: (H, W) or (H, W, 1) float32 in [0, 1]; H and W must be multiples
    of 8. Compute runs in bfloat16 on the MXU with float32 heads.
    """

    max_keypoints: int = 1024
    score_threshold: float = 0.0005
    nms_radius: int = 4
    border: int = 4
    descriptor_dim: int = 256
    compute_dtype: jnp.dtype = jnp.bfloat16
    detector_mode: str = "learned"  # "learned" (SuperPoint head) | "harris"
    select_tiles: tuple = (1, 1)  # (ty, tx) != (1,1): spatially uniform
    # top-K — the budget splits evenly over a tile grid (reference-raster
    # extraction; see features.nms.select_keypoints_tiled)
    conv_backend: str = "auto"  # "auto" (Pallas on TPU, per-image) |
    # "xla_batched": natively batched XLA convs for the whole trunk. Used by
    # training: the per-image Pallas trunk would be traced once per batch
    # element (compile-time explosion under scan+vjp) and Mosaic rejects
    # vmapped ANY-memory-space blocks; one batched conv also drives the MXU
    # far better at small training shapes than B sequential kernels.
    # "harris": parameter-free device Harris response replaces the learned
    # detector head, so the descriptor/matcher stack trains in-framework with
    # repeatable keypoints and no external detector checkpoint (the score
    # threshold is interpreted on the normalized Harris response)

    @nn.compact
    def __call__(self, image: jnp.ndarray, return_logits: bool = False):
        """Extract features; with ``return_logits`` also return the raw
        (B, H/8, W/8, 65) detector cell logits (training supervision for
        the learned head — see ``train.steps`` detector distillation)."""
        # Accept (H, W), (H, W, 1) or batched (B, H, W); convs run natively
        # batched (MXU-friendly), per-image postprocessing is vmapped.
        batched = True
        if image.ndim == 2:
            image, batched = image[None], False
        elif image.ndim == 3 and image.shape[-1] == 1:
            image, batched = image[None, :, :, 0], False
        b, h, w = image.shape
        dt = self.compute_dtype
        from gisnav_tpu.features.pallas_conv import conv_stage, stem_stage

        # parameter registration (nn.Conv-compatible tree, explicit compute)
        k1a, b1a = _ConvParams(64, name="conv1a")(1)
        k1b, b1b = _ConvParams(64, name="conv1b")(64)
        k2a, b2a = _ConvParams(64, name="conv2a")(64)
        k2b, b2b = _ConvParams(64, name="conv2b")(64)
        k3a, b3a = _ConvParams(128, name="conv3a")(64)
        k3b, b3b = _ConvParams(128, name="conv3b")(128)
        k4a, b4a = _ConvParams(128, name="conv4a")(128)
        k4b, b4b = _ConvParams(128, name="conv4b")(128)

        if self.conv_backend == "xla_batched":
            def bpool(v):
                bb, hh, ww, c = v.shape
                return v.reshape(bb, hh // 2, 2, ww // 2, 2, c).max(
                    axis=(2, 4))

            x = image[..., None]
            x = _conv_relu_xla(x, k1a, b1a, dt)
            x = bpool(_conv_relu_xla(x, k1b, b1b, dt))
            x = _conv_relu_xla(x, k2a, b2a, dt)
            x = bpool(_conv_relu_xla(x, k2b, b2b, dt))
            x = _conv_relu_xla(x, k3a, b3a, dt)
            x = bpool(_conv_relu_xla(x, k3b, b3b, dt))
            x = _conv_relu_xla(x, k4a, b4a, dt)
            x = _conv_relu_xla(x, k4b, b4b, dt)
        else:
            def trunk(img):
                # fused VGG stages: Pallas on TPU (pallas_conv.py), XLA
                # elsewhere. The 1->64 stem is folded into the stage-1
                # kernel via an im2col matmul (a standalone XLA stem conv
                # costs ~13.7 ms at 1080p in layout copies + a 1-lane conv
                # emitter).
                v = stem_stage(img, k1a, b1a, k1b, b1b, pool=True)
                v = conv_stage(v, k2a, b2a, k2b, b2b, pool=True)
                v = conv_stage(v, k3a, b3a, k3b, b3b, pool=True)
                v = conv_stage(v, k4a, b4a, k4b, b4b, pool=False)
                return v

            # batch is 1-2 images in every pipeline mode: unrolled loop
            # keeps the Pallas kernels un-vmapped (single-image grids)
            x = jnp.stack([trunk(image[i]) for i in range(b)])

        hc, wc = h // 8, w // 8
        if self.detector_mode == "harris":
            from gisnav_tpu.features.harris import harris_response

            heatmap = jax.vmap(harris_response)(image.astype(jnp.float32))
            logits = None
        else:
            # Detector head: 65 = 8x8 cell + dustbin (3x3 conv fused, the
            # 1x1 is a plain matmul)
            kpa, bpa = _ConvParams(256, name="convPa")(128)
            kpb, bpb = _ConvParams(65, kernel_hw=(1, 1), name="convPb")(256)
            if self.conv_backend == "xla_batched":
                cpa = _conv_relu_xla(x, kpa, bpa, dt)
            else:
                cpa = jnp.stack(
                    [conv_stage(x[i], kpa, bpa) for i in range(b)])
            logits = jnp.einsum(
                "bhwc,cd->bhwd", cpa.astype(dt), kpb[0, 0].astype(dt),
                preferred_element_type=jnp.float32,
            ) + bpb
            probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # no dustbin
            heatmap = probs.reshape(b, hc, wc, 8, 8)
            heatmap = heatmap.transpose(0, 1, 3, 2, 4).reshape(b, h, w)

        # Descriptor head
        kda, bda = _ConvParams(256, name="convDa")(128)
        kdb, bdb = _ConvParams(
            self.descriptor_dim, kernel_hw=(1, 1), name="convDb")(256)
        if self.conv_backend == "xla_batched":
            cda = _conv_relu_xla(x, kda, bda, dt)
        else:
            cda = jnp.stack([conv_stage(x[i], kda, bda) for i in range(b)])
        dmap = jnp.einsum(
            "bhwc,cd->bhwd", cda.astype(dt), kdb[0, 0].astype(dt),
            preferred_element_type=jnp.float32,
        ) + bdb  # (B, hc, wc, D)
        # smooth normalization: linalg.norm has a NaN gradient at exactly
        # zero rows (the maximum() clamp does not protect sqrt'(0))
        dmap = dmap * jax.lax.rsqrt(
            jnp.sum(dmap * dmap, axis=-1, keepdims=True) + 1e-12
        )

        def select_and_sample(heat, dm):
            if tuple(self.select_tiles) != (1, 1):
                from gisnav_tpu.features.nms import select_keypoints_tiled

                keypoints, scores, valid = select_keypoints_tiled(
                    heat,
                    self.max_keypoints,
                    tuple(self.select_tiles),
                    self.score_threshold,
                    self.border,
                    self.nms_radius,
                )
            else:
                keypoints, scores, valid = select_keypoints(
                    heat,
                    self.max_keypoints,
                    self.score_threshold,
                    self.border,
                    self.nms_radius,
                    prefer_pallas=self.conv_backend != "xla_batched",
                )
            descs = _sample_descriptors(keypoints, dm, stride=8)
            return SuperPointFeatures(
                keypoints=keypoints, scores=scores, descriptors=descs,
                mask=valid,
            )

        if self.conv_backend == "xla_batched":
            # training batches are large (2B images) but small-resolution:
            # the batched top-k is safe there, and vmap keeps trace/compile
            # time linear in ONE image instead of 2B unrolled copies
            out = jax.vmap(select_and_sample)(heatmap, dmap)
        else:
            # Unrolled over the (small, static) batch rather than vmapped:
            # the TPU windowed top-k emitter CHECK-crashes on batched
            # (rank-2) operands at large sizes, and rank-1 top-k also
            # compiles much faster. Batch is 1-2 images in every pipeline
            # mode.
            per_image = [
                select_and_sample(heatmap[i], dmap[i]) for i in range(b)
            ]
            out = jax.tree.map(lambda *xs: jnp.stack(xs), *per_image)
        if not batched:
            out = jax.tree.map(lambda a: a[0], out)
            if return_logits:
                return out, (None if logits is None else logits[0])
            return out
        return (out, logits) if return_logits else out


def _sample_descriptors(kpts: jnp.ndarray, dmap: jnp.ndarray, stride: int
                        ) -> jnp.ndarray:
    """Bilinearly sample the coarse descriptor map at keypoint pixel coords
    (align-corners-on-cell-centers convention of the MagicLeap release) and
    re-normalize."""
    hc, wc, d = dmap.shape
    # pixel coords -> coarse grid coords (cell centers at stride/2 - 0.5)
    gx = (kpts[:, 0] - stride / 2 + 0.5) / stride
    gy = (kpts[:, 1] - stride / 2 + 0.5) / stride
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0)[:, None]
    fy = (gy - y0)[:, None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, hc - 1)
    x1 = jnp.clip(x0 + 1, 0, wc - 1)
    y1 = jnp.clip(y0 + 1, 0, hc - 1)
    v00, v01 = dmap[y0, x0], dmap[y0, x1]
    v10, v11 = dmap[y1, x0], dmap[y1, x1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out * jax.lax.rsqrt(
        jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12
    )


def extract_features(
    params, image: jnp.ndarray, *, max_keypoints: int = 1024, **kwargs
) -> SuperPointFeatures:
    """Functional entry point: run SuperPoint with given params on one image."""
    model = SuperPoint(max_keypoints=max_keypoints, **kwargs)
    return model.apply(params, image)
