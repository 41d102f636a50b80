"""Device Harris corner response (jit-compiled, parameter-free).

An alternative detector head for the extractor: Harris corners are
repeatable across viewpoint/rotation changes without any learned weights, so
the deep matcher stack (CNN descriptors + LightGlue) can be trained
end-to-end in-framework — no dependency on external pretrained detector
checkpoints. Pairs with ``features.nms.select_keypoints`` for the fixed-size
keypoint set.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["harris_response"]


def _separable_blur(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable blur of (H, W) via two 1D convolutions."""
    k = kernel / jnp.sum(kernel)
    pad = (len(kernel) - 1) // 2
    xp = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    cols = sum(
        xp[i : i + x.shape[0], :] * k[i] for i in range(len(kernel))
    )
    xp = jnp.pad(cols, ((0, 0), (pad, pad)), mode="edge")
    rows = sum(
        xp[:, i : i + x.shape[1]] * k[i] for i in range(len(kernel))
    )
    return rows


def harris_response(image: jnp.ndarray, k: float = 0.04,
                    blur_sigma: float = 1.0) -> jnp.ndarray:
    """Harris corner response map of a grayscale image in [0, 1].

    det(M) - k tr(M)^2 over the blurred structure tensor M, normalized to a
    0..1-ish range so ``select_keypoints`` score thresholds stay meaningful.
    """
    img = image.astype(jnp.float32)
    # Sobel gradients (replicate-padded)
    p = jnp.pad(img, 1, mode="edge")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) / 8.0
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) / 8.0

    gauss = jnp.exp(
        -0.5 * (jnp.arange(-2, 3, dtype=jnp.float32) / blur_sigma) ** 2
    )
    ixx = _separable_blur(gx * gx, gauss)
    iyy = _separable_blur(gy * gy, gauss)
    ixy = _separable_blur(gx * gy, gauss)

    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    resp = det - k * tr * tr
    # normalize: positive corner responses scaled by the image's own max
    resp = jnp.maximum(resp, 0.0)
    return resp / jnp.maximum(jnp.max(resp), 1e-12)

