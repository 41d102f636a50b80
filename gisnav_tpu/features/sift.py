"""Host-side SIFT extraction + the structured keypoint wire format.

The reference extracts SIFT on CPU (``core/twist_node.py:60-93,227-232`` in
hmakelin/gisnav) and ships keypoints between nodes as a structured
``(x, y, z, size, angle, descriptor[128])`` float32 record array
(``core/_shared.py:26-35``, ``twist_node.py:149-204``). We keep that wire
format for interop/parity and add fixed-size padding so the records can feed
the device matcher directly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

__all__ = [
    "KEYPOINT_DTYPE",
    "SiftFeatures",
    "extract_sift",
    "pack_keypoints",
    "unpack_keypoints",
    "pad_features",
]

KEYPOINT_DTYPE = np.dtype(
    [
        ("x", np.float32),
        ("y", np.float32),
        ("z", np.float32),
        ("size", np.float32),
        ("angle", np.float32),
        ("descriptor", np.float32, (128,)),
    ]
)
"""Wire format identical to the reference's SIFT-over-PointCloud2 records."""


class SiftFeatures(NamedTuple):
    keypoints: np.ndarray  # (K, 2) float32 xy
    sizes: np.ndarray  # (K,)
    angles: np.ndarray  # (K,) degrees
    descriptors: np.ndarray  # (K, 128) float32
    mask: np.ndarray  # (K,) bool


def extract_sift(
    image: np.ndarray, max_keypoints: int = 1024
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cv2 SIFT detect+compute, capped like the reference CPU path
    (``twist_node.py:60-93``: 1024 keypoints).

    :param image: (H, W) uint8 grayscale
    :return: (keypoints (N, 2), sizes (N,), angles (N,), descriptors (N, 128))
    """
    import cv2

    sift = cv2.SIFT_create(nfeatures=max_keypoints)
    kps, descs = sift.detectAndCompute(image, None)
    if not kps:
        z2 = np.zeros((0, 2), np.float32)
        return z2, np.zeros(0, np.float32), np.zeros(0, np.float32), np.zeros(
            (0, 128), np.float32
        )
    pts = np.array([k.pt for k in kps], dtype=np.float32)
    sizes = np.array([k.size for k in kps], dtype=np.float32)
    angles = np.array([k.angle for k in kps], dtype=np.float32)
    return pts, sizes, angles, descs.astype(np.float32)


def pad_features(
    pts: np.ndarray,
    sizes: np.ndarray,
    angles: np.ndarray,
    descs: np.ndarray,
    max_keypoints: int,
) -> SiftFeatures:
    """Pad/truncate ragged SIFT output to a fixed size with a validity mask."""
    n = min(len(pts), max_keypoints)
    kp = np.zeros((max_keypoints, 2), np.float32)
    sz = np.zeros(max_keypoints, np.float32)
    an = np.zeros(max_keypoints, np.float32)
    de = np.zeros((max_keypoints, descs.shape[1] if descs.size else 128), np.float32)
    mask = np.zeros(max_keypoints, bool)
    kp[:n] = pts[:n]
    sz[:n] = sizes[:n]
    an[:n] = angles[:n]
    de[:n] = descs[:n]
    mask[:n] = True
    return SiftFeatures(kp, sz, an, de, mask)


def pack_keypoints(feats: SiftFeatures) -> bytes:
    """Serialize features into the reference's structured wire format."""
    n = int(feats.mask.sum())
    data = np.empty(n, dtype=KEYPOINT_DTYPE)
    data["x"] = feats.keypoints[:n, 0]
    data["y"] = feats.keypoints[:n, 1]
    data["z"] = 0.0
    data["size"] = feats.sizes[:n]
    data["angle"] = feats.angles[:n]
    data["descriptor"] = feats.descriptors[:n]
    return data.tobytes()


def unpack_keypoints(raw: bytes, max_keypoints: int) -> SiftFeatures:
    """Parse the structured wire format back into padded fixed-size arrays."""
    data = np.frombuffer(raw, dtype=KEYPOINT_DTYPE)
    pts = np.stack([data["x"], data["y"]], axis=1)
    return pad_features(pts, data["size"], data["angle"], data["descriptor"],
                        max_keypoints)
