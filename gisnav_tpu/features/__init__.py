"""Keypoint extraction: SuperPoint (Flax) on device, SIFT (cv2) host fallback."""
from gisnav_tpu.features.nms import select_keypoints, simple_nms  # noqa: F401
from gisnav_tpu.features.superpoint import (  # noqa: F401
    SuperPoint,
    SuperPointFeatures,
    extract_features,
)
