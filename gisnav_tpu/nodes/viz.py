"""Developer visualization: match image + projected camera position.

Capability parity with the reference's dev topics ``~/dev/matches_image``
and ``~/dev/position_image`` (``core/pose_node.py:145-151,310-346`` and
``core/_shared.py:38-86`` in hmakelin/gisnav): draw matched keypoint pairs
side by side and mark the solved camera ground-position on the reference
raster.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["draw_matches", "draw_position"]


def draw_matches(
    query: np.ndarray,
    reference: np.ndarray,
    mkp_qry: np.ndarray,
    mkp_ref: np.ndarray,
    mask: np.ndarray,
    max_draw: int = 200,
) -> np.ndarray:
    """Side-by-side match visualization (grayscale in, BGR out)."""
    import cv2

    h = max(query.shape[0], reference.shape[0])
    w = query.shape[1] + reference.shape[1]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[: query.shape[0], : query.shape[1]] = cv2.cvtColor(
        query, cv2.COLOR_GRAY2BGR
    )
    canvas[: reference.shape[0], query.shape[1]:] = cv2.cvtColor(
        reference, cv2.COLOR_GRAY2BGR
    )
    off = query.shape[1]
    idx = np.flatnonzero(np.asarray(mask))[:max_draw]
    for i in idx:
        p0 = tuple(np.round(mkp_qry[i]).astype(int))
        p1 = tuple(np.round(mkp_ref[i]).astype(int) + np.array([off, 0]))
        cv2.line(canvas, p0, p1, (0, 200, 0), 1, cv2.LINE_AA)
        cv2.circle(canvas, p0, 2, (0, 120, 255), -1)
        cv2.circle(canvas, p1, 2, (0, 120, 255), -1)
    return canvas


def draw_position(
    reference: np.ndarray,
    cam_pos_raster: np.ndarray,
    matched_ref: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Mark the solved camera ground position (and inlier spread) on the
    reference raster; None when the position is outside the raster
    (the reference warns and skips, ``pose_node.py:336-343``)."""
    import cv2

    x, y = int(cam_pos_raster[0]), int(cam_pos_raster[1])
    h, w = reference.shape[:2]
    if not (0 <= x < w and 0 <= y < h):
        return None
    canvas = cv2.cvtColor(reference, cv2.COLOR_GRAY2BGR)
    if matched_ref is not None and mask is not None:
        for i in np.flatnonzero(np.asarray(mask))[:500]:
            cv2.circle(canvas, tuple(np.round(matched_ref[i]).astype(int)),
                       1, (180, 180, 0), -1)
    cv2.circle(canvas, (x, y), 6, (0, 255, 0), -1)
    cv2.drawMarker(canvas, (x, y), (0, 0, 255), cv2.MARKER_CROSS, 18, 2)
    return canvas
