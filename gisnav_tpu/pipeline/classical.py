"""Classical (SIFT + MNN) frame->geopose pipeline variant.

Mirrors the deep pipeline of ``pipeline.geopose`` with the reference's
classical ingredients — host cv2 SIFT extraction and ratio-test matching
(``core/twist_node.py:227-267`` in hmakelin/gisnav) — while the warp, the
distance-matrix matching, RANSAC-PnP and the geopose assembly all run on
device. Useful as:

- a weights-free end-to-end numerical path (the deep pipeline needs trained
  SuperPoint/LightGlue parameters);
- the parity baseline the deep path is validated against;
- a fallback extraction backend, like the reference's CPU configuration.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.features.sift import extract_sift, pad_features
from gisnav_tpu.matching.mnn import mnn_ratio_match
from gisnav_tpu.pipeline.geopose import GeoPose, PipelineConfig, assemble_geopose
from gisnav_tpu.pnp.dem import gather_elevation
from gisnav_tpu.pnp.ransac import ransac_pnp
from gisnav_tpu.raster import rotate_and_crop_auto

__all__ = ["classical_frame_to_geopose"]


def _device_tail(config: PipelineConfig):
    """Jitted device portion: match + z-lift + PnP + geopose assembly."""

    def tail(kp_q, desc_q, mask_q, kp_r, desc_r, mask_r,
             dem_crop, m_crop, k, crs_affine, key):
        midx, _ = mnn_ratio_match(
            desc_q, desc_r, mask_q, mask_r, ratio=0.7, mutual=True
        )
        mvalid = midx >= 0
        ref_idx = jnp.clip(midx, 0)
        mkp_qry = kp_q
        mkp_ref = kp_r[ref_idx]
        num_matches = jnp.sum(mvalid).astype(jnp.int32)

        z_scale = crs_affine[2, 2]
        dem_m = gather_elevation(dem_crop, mkp_ref)
        obj = jnp.concatenate([mkp_ref, (dem_m / z_scale)[:, None]], axis=1)

        pnp = ransac_pnp(
            obj, mkp_qry, k, mvalid,
            key=key,
            num_hypotheses=config.num_hypotheses,
            threshold_px=config.threshold_px,
            min_inliers=config.min_matches,
            refine_iters=config.refine_iters,
        )
        ecef, quat, lla, cam_pos = assemble_geopose(
            pnp.r, pnp.t, m_crop, crs_affine
        )
        valid = pnp.valid & (num_matches >= config.min_matches)
        return GeoPose(
            ecef_position=ecef,
            ecef_quat=quat,
            lon_lat_alt=lla,
            r_raster=pnp.r,
            cam_pos_raster=cam_pos,
            m_crop=m_crop,
            num_matches=num_matches,
            num_inliers=pnp.num_inliers,
            valid=valid,
            matched_qry=mkp_qry,
            matched_ref=mkp_ref,
            match_mask=mvalid & pnp.inliers,
        )

    return jax.jit(tail)


_TAIL_CACHE: dict = {}


def classical_frame_to_geopose(
    query: np.ndarray,
    ortho: np.ndarray,
    dem: np.ndarray,
    rotation_deg: float,
    k: np.ndarray,
    crs_affine: np.ndarray,
    config: Optional[PipelineConfig] = None,
    seed: int = 0,
) -> GeoPose:
    """Run the classical pipeline on host images.

    :param query: (h, w) uint8 grayscale camera frame
    :param ortho: (H, W) uint8 grayscale orthoimage
    :param dem: (H, W) float32 DEM meters
    :param rotation_deg: camera-yaw rotation for the reference crop
    :param k: (3, 3) intrinsics
    :param crs_affine: (4, 4) pixel->WGS84 affine of the full orthoimage
    """
    config = config or PipelineConfig()
    h, w = config.image_shape

    stack = jnp.stack(
        [jnp.asarray(ortho, jnp.float32), jnp.asarray(dem, jnp.float32)], axis=-1
    )
    warped, m_crop = jax.jit(
        rotate_and_crop_auto, static_argnames="crop_shape"
    )(stack, jnp.float32(rotation_deg), crop_shape=(h, w))
    ref_img = np.clip(np.asarray(warped[:, :, 0]), 0, 255).astype(np.uint8)
    dem_crop = warped[:, :, 1]

    kq = config.max_keypoints
    fq = pad_features(*extract_sift(query, kq), kq)
    fr = pad_features(*extract_sift(ref_img, kq), kq)

    cache_key = (config, )
    if cache_key not in _TAIL_CACHE:
        _TAIL_CACHE[cache_key] = _device_tail(config)
    tail = _TAIL_CACHE[cache_key]
    return tail(
        jnp.asarray(fq.keypoints), jnp.asarray(fq.descriptors),
        jnp.asarray(fq.mask),
        jnp.asarray(fr.keypoints), jnp.asarray(fr.descriptors),
        jnp.asarray(fr.mask),
        dem_crop, m_crop, jnp.asarray(k, jnp.float32),
        jnp.asarray(crs_affine, jnp.float32),
        jax.random.PRNGKey(seed),
    )
