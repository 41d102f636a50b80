"""Pipeline runners: host-facing callables around the jitted device programs.

``make_deep_runner`` packages the warp-mode deep pipeline (rotate/crop the
map to camera yaw, Harris+descriptors extraction, LightGlue matching,
RANSAC-PnP) with the bundled in-framework-trained weights into the callable
the PoseNode's ``deep_runner`` hook expects.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.pipeline.geopose import (
    GeoPose,
    PipelineConfig,
    build_frame_to_geopose,
)

__all__ = ["make_deep_runner", "PRETRAINED_CONFIG"]

PRETRAINED_CONFIG = PipelineConfig(
    image_shape=(480, 640),
    max_keypoints=512,
    lightglue_depth=5,
    detector_mode="harris",
    min_matches=15,
)
"""Config matching the bundled ``weights/gisnav_tpu_harris_lg5.npz``."""


def make_deep_runner(params=None, config: Optional[PipelineConfig] = None):
    """Build a PoseNode-compatible deep runner.

    Returned callable signature (see ``nodes.pose_node.PoseNode.estimate``)::

        runner(query_u8, ortho_image_u8, dem_f32, rotation_deg, k, crs_affine)
            -> GeoPose

    The jitted program is cached per orthoimage shape (the query shape is
    fixed by the config).
    """
    config = config or PRETRAINED_CONFIG
    if params is None:
        from gisnav_tpu.weights import load_pretrained

        params = load_pretrained()
    fn = build_frame_to_geopose(config)
    cache: Dict[Tuple[int, int], object] = {}
    counter = {"n": 0}

    def runner(query: np.ndarray, ortho: np.ndarray, dem: np.ndarray,
               rotation_deg: float, k: np.ndarray,
               crs_affine: np.ndarray) -> GeoPose:
        shape = ortho.shape[:2]
        if shape not in cache:
            cache[shape] = jax.jit(fn)
        counter["n"] += 1
        return cache[shape](
            params,
            jnp.asarray(query, jnp.float32) / 255.0,
            jnp.asarray(ortho, jnp.float32) / 255.0,
            jnp.asarray(dem, jnp.float32),
            jnp.float32(rotation_deg),
            jnp.asarray(k, jnp.float32),
            jnp.asarray(crs_affine, jnp.float32),
            jax.random.PRNGKey(counter["n"]),
        )

    return runner
