"""Device-side training-pair generation (fully jit-compiled).

Generating supervision ON the accelerator removes the host->device data path
from the training loop entirely (important here: the dev tunnel to the TPU
moves ~15 MB/s, and production pods want input pipelines off the host too):
multi-octave textures come from ``jax.image.resize`` of random grids, and the
partner view is an affine warp (rotation/scale/translation — the warp kernel
family the pipeline itself uses) with the exact 3x3 ground-truth transform.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gisnav_tpu.raster.warp import warp_affine

__all__ = ["device_batch", "device_batch_asymmetric"]


def _texture(key, shape: Tuple[int, int]) -> jnp.ndarray:
    """Multi-octave noise mixed with thresholded blobs (corner-rich regions
    resembling built structures; pure noise alone transfers poorly to
    imagery with man-made edges)."""
    h, w = shape
    keys = jax.random.split(key, 6)
    acc = jnp.zeros((h, w), jnp.float32)
    for k, octave in zip(keys[:4], (6, 16, 48, 128)):
        grid = jax.random.uniform(k, (octave, octave), jnp.float32)
        acc = acc + jax.image.resize(grid, (h, w), method="cubic")
    acc = acc - jnp.min(acc)
    acc = acc / jnp.maximum(jnp.max(acc), 1e-6)
    # blob layer: hard-thresholded coarse noise = sharp-cornered regions
    blob_grid = jax.random.uniform(keys[4], (24, 24), jnp.float32)
    blobs = jax.image.resize(blob_grid, (h, w), method="cubic")
    level = jax.random.uniform(keys[5], (), minval=0.4, maxval=0.6)
    blobs = (blobs > level).astype(jnp.float32)
    return 0.55 * acc + 0.45 * blobs


def _random_affine(key, shape: Tuple[int, int], max_angle_deg: float,
                   max_scale: float, max_shift: float) -> jnp.ndarray:
    """3x3 affine mapping img0 pixel coords to img1 pixel coords.

    Scale is log-uniform in [1/(1+max_scale), 1+max_scale] so a 2x zoom-out
    is as likely as a 2x zoom-in (the deployed matcher sees query/map GSD
    ratios of 2-3x from the FOV-padded map sizing).
    """
    h, w = shape
    ka, ks, kx, ky = jax.random.split(key, 4)
    ang = jnp.radians(
        jax.random.uniform(ka, (), minval=-max_angle_deg, maxval=max_angle_deg)
    )
    log_s = jax.random.uniform(
        ks, (), minval=-jnp.log(1.0 + max_scale), maxval=jnp.log(1.0 + max_scale)
    )
    s = jnp.exp(log_s)
    tx = jax.random.uniform(kx, (), minval=-max_shift, maxval=max_shift) * w
    ty = jax.random.uniform(ky, (), minval=-max_shift, maxval=max_shift) * h
    c, si = jnp.cos(ang) * s, jnp.sin(ang) * s
    cx, cy = w / 2.0, h / 2.0
    # rotate+scale about the image center, then shift
    a = jnp.array(
        [
            [c, -si, cx - c * cx + si * cy + tx],
            [si, c, cy - si * cx - c * cy + ty],
            [0.0, 0.0, 1.0],
        ]
    )
    return a


def _gaussian_blur(img: jnp.ndarray, sigma, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur with a TRACED sigma (7-tap, sigma <~ 1.8).

    Simulates the resampling low-pass both deployed views carry: the
    reference crop goes through the 3-shear chained-lerp warp (blur grows
    with rotation angle) and the orthoimage itself is an area-downsampled
    WMS raster. Matching must survive unequal blur between the views.
    """
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    g = g / jnp.sum(g)
    x = img[None, :, :, None]
    kx = g.reshape(1, 2 * radius + 1, 1, 1)
    ky = g.reshape(2 * radius + 1, 1, 1, 1)
    for kern in (ky, kx):
        x = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return x[0, :, :, 0]


def _cast_shadows(key, img: jnp.ndarray, n: int = 6,
                  max_strength: float = 0.45) -> jnp.ndarray:
    """Multiplicative soft dark quads: cast shadows / novel occluders.

    Real query/map pairs differ by sun angle — structures cast dark quads
    that exist in only ONE view. A matcher that anchors on shadow
    boundaries collapses on real imagery (measured with the unaugmented
    harris_lg5 bundle: 25 phantom quads drop a 40-inlier fix to 4 inliers,
    ``tests/test_world_appearance.py`` sun_shadows scenario). Applied to
    the query view only, so shadow edges are unmatched by construction.
    ``n`` is static; each quad is a product of four sigmoids (soft ~1.5 px
    penumbra), all fully traced.
    """
    h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one(k, im):
        kx, ky, kw, kh2, ks_ = jax.random.split(k, 5)
        x0 = jax.random.uniform(kx, (), minval=0.0, maxval=float(w))
        y0 = jax.random.uniform(ky, (), minval=0.0, maxval=float(h))
        bw = jax.random.uniform(kw, (), minval=0.04, maxval=0.14) * w
        bh = jax.random.uniform(kh2, (), minval=0.04, maxval=0.14) * h
        # max_strength may be traced (curriculum ramp)
        s = max_strength * jax.random.uniform(ks_, (), minval=0.25,
                                              maxval=1.0)
        soft = 1.5
        mx = (jax.nn.sigmoid((xs - x0) / soft)
              * jax.nn.sigmoid((x0 + bw - xs) / soft))
        my = (jax.nn.sigmoid((ys - y0) / soft)
              * jax.nn.sigmoid((y0 + bh - ys) / soft))
        return im * (1.0 - s * mx * my)

    keys = jax.random.split(key, n)
    for i in range(n):
        img = one(keys[i], img)
    return img


def device_batch(key, batch: int, shape: Tuple[int, int],
                 max_angle_deg: float = 180.0, max_scale: float = 1.6,
                 max_shift: float = 0.12, max_blur_sigma: float = 1.6,
                 shadow_quads: int = 6, shadow_strength=0.45):
    """(image0, image1, transform) batch generated on device.

    ``transform`` maps image0 pixels to image1 pixels (last row [0, 0, 1]),
    directly usable as the training ground truth "homography".
    """
    def one(k):
        k_tex, k_aff, k_pho, k_blur, k_sh = jax.random.split(k, 5)
        img0 = _texture(k_tex, shape)
        a = _random_affine(k_aff, shape, max_angle_deg, max_scale, max_shift)
        img1 = warp_affine(img0[..., None], jnp.linalg.inv(a), shape)[..., 0]
        # independent blur per view (deployment: query camera render vs
        # 3-shear-resampled map crop — both low-passed, unequally)
        kb0, kb1 = jax.random.split(k_blur)
        s0 = jax.random.uniform(kb0, (), minval=0.0, maxval=max_blur_sigma)
        s1 = jax.random.uniform(kb1, (), minval=0.0, maxval=max_blur_sigma)
        img0 = _gaussian_blur(img0, s0)
        img1 = _gaussian_blur(img1, s1)
        # photometric gap between the views (the real query camera and the
        # orthoimagery come from different sensors/seasons)
        kg, kb, kn = jax.random.split(k_pho, 3)
        gain = 1.0 + jax.random.uniform(kg, (), minval=-0.3, maxval=0.3)
        bias = jax.random.uniform(kb, (), minval=-0.15, maxval=0.15)
        noise = 0.02 * jax.random.normal(kn, shape)
        img1 = jnp.clip(img1 * gain + bias + noise, 0.0, 1.0)
        if shadow_quads:
            img1 = _cast_shadows(k_sh, img1, n=shadow_quads,
                                 max_strength=shadow_strength)
        return img0, img1, a

    keys = jax.random.split(key, batch)
    return jax.vmap(one)(keys)


def device_batch_asymmetric(key, batch: int,
                            q_shape: Tuple[int, int] = (256, 320),
                            r_shape: Tuple[int, int] = (576, 640),
                            max_angle_deg: float = 180.0,
                            scale_lo: float = 0.6, scale_hi: float = 1.4,
                            max_blur_sigma: float = 1.2,
                            shadow_quads: int = 6, shadow_strength=0.45):
    """Cached-reference deployment regime: (query, reference, transform).

    The reference is a LARGE north-up raster; the query is a small rotated
    view whose content covers only a fraction of it (the regime
    ``build_frame_to_geopose_cached`` matches in: most reference keypoints
    have no partner, most query keypoints map into a small reference
    region). ``transform`` maps query px -> reference px; scale is
    log-uniform in [scale_lo, scale_hi] (reference px per query px — the
    residual GSD gap left after the runner's integer pooling).
    """
    hq, wq = q_shape
    hr, wr = r_shape

    def one(k):
        k_tex, k_aff, k_pho, k_blur, k_sh = jax.random.split(k, 5)
        ref = _texture(k_tex, r_shape)
        ka, ks, kx, ky = jax.random.split(k_aff, 4)
        ang = jnp.radians(jax.random.uniform(
            ka, (), minval=-max_angle_deg, maxval=max_angle_deg))
        log_s = jax.random.uniform(
            ks, (), minval=jnp.log(scale_lo), maxval=jnp.log(scale_hi))
        s = jnp.exp(log_s)
        # keep the query footprint inside the reference (worst case: the
        # rotated footprint's half-diagonal at the largest scale)
        half_diag = 0.5 * s * jnp.sqrt(jnp.float32(hq * hq + wq * wq))
        cx = jax.random.uniform(kx, (), minval=half_diag,
                                maxval=wr - half_diag)
        cy = jax.random.uniform(ky, (), minval=half_diag,
                                maxval=hr - half_diag)
        c, si = jnp.cos(ang) * s, jnp.sin(ang) * s
        cqx, cqy = wq / 2.0, hq / 2.0
        # query px -> reference px (rotate+scale about query center, then
        # place at (cx, cy))
        a = jnp.array(
            [
                [c, -si, 0.0],
                [si, c, 0.0],
                [0.0, 0.0, 1.0],
            ]
        )
        a = a.at[0, 2].set(cx - c * cqx + si * cqy)
        a = a.at[1, 2].set(cy - si * cqx - c * cqy)
        query = warp_affine(ref[..., None], a, q_shape)[..., 0]
        kb0, kb1 = jax.random.split(k_blur)
        s0 = jax.random.uniform(kb0, (), minval=0.0, maxval=max_blur_sigma)
        s1 = jax.random.uniform(kb1, (), minval=0.0, maxval=max_blur_sigma)
        query = _gaussian_blur(query, s0)
        ref_b = _gaussian_blur(ref, s1)
        kg, kb, kn = jax.random.split(k_pho, 3)
        gain = 1.0 + jax.random.uniform(kg, (), minval=-0.3, maxval=0.3)
        bias = jax.random.uniform(kb, (), minval=-0.15, maxval=0.15)
        noise = 0.02 * jax.random.normal(kn, q_shape)
        query = jnp.clip(query * gain + bias + noise, 0.0, 1.0)
        if shadow_quads:
            query = _cast_shadows(k_sh, query, n=shadow_quads,
                                  max_strength=shadow_strength)
        return query, ref_b, a

    keys = jax.random.split(key, batch)
    return jax.vmap(one)(keys)
