"""SE(3) rigid transforms as 4x4 homogeneous matrices (numpy, host-side).

Replaces the reference's tf2-message-centric helpers
(``_transformations.py:290-297,396-450,500-576`` in hmakelin/gisnav) with a
plain-matrix API; the node layer converts to/from wire messages at the edges.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from gisnav_tpu.geometry.quaternion import (
    matrix_to_quat,
    quat_inverse,
    quat_mul,
    quat_slerp,
    quat_to_matrix,
)

__all__ = [
    "make_transform",
    "split_transform",
    "invert",
    "compose",
    "interpolate_transform",
    "poses_to_twist",
]


def make_transform(r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Build a 4x4 homogeneous transform from 3x3 rotation and 3-vector."""
    h = np.eye(4)
    h[:3, :3] = np.asarray(r, dtype=np.float64)
    h[:3, 3] = np.asarray(t, dtype=np.float64).reshape(3)
    return h


def split_transform(h: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """4x4 homogeneous transform -> (3x3 rotation, 3-vector translation)."""
    h = np.asarray(h, dtype=np.float64)
    return h[:3, :3].copy(), h[:3, 3].copy()


def invert(h: np.ndarray) -> np.ndarray:
    """Invert a rigid transform without a general matrix inverse."""
    r, t = split_transform(h)
    return make_transform(r.T, -r.T @ t)


def compose(*hs: np.ndarray) -> np.ndarray:
    """Compose transforms left-to-right: ``compose(a, b)(x) = a @ b @ x``."""
    out = np.eye(4)
    for h in hs:
        out = out @ np.asarray(h, dtype=np.float64)
    return out


def interpolate_transform(h0: np.ndarray, h1: np.ndarray, alpha: float) -> np.ndarray:
    """Interpolate between two stamped transforms (slerp rotation, lerp
    translation). Used by the host transform graph for tf2-style time travel.
    """
    r0, t0 = split_transform(h0)
    r1, t1 = split_transform(h1)
    q = quat_slerp(matrix_to_quat(r0), matrix_to_quat(r1), alpha)
    t = (1.0 - alpha) * t0 + alpha * t1
    return make_transform(quat_to_matrix(q), t)


def poses_to_twist(
    pos2: np.ndarray,
    quat2: np.ndarray,
    stamp2_us: int,
    pos1: np.ndarray,
    quat1: np.ndarray,
    stamp1_us: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Differentiate two stamped poses into (linear, angular) velocity.

    Reference semantics: ``poses_to_twist`` (``_transformations.py:396-450``):
    linear velocity is the position difference over dt; angular velocity is
    the axis-angle of ``q2 * q1^-1`` over dt.

    :param pos2, quat2, stamp2_us: newer pose (xyz meters, xyzw, microseconds)
    :param pos1, quat1, stamp1_us: older pose
    :return: (linear_velocity (3,), angular_velocity (3,)) in the poses' frame
    """
    dt = (int(stamp2_us) - int(stamp1_us)) / 1e6
    if dt <= 0:
        raise ValueError(f"non-positive time step {dt}")
    lin = (np.asarray(pos2, dtype=np.float64) - np.asarray(pos1, dtype=np.float64)) / dt

    q_diff = quat_mul(quat2, quat_inverse(quat1))
    q_diff = q_diff / np.linalg.norm(q_diff)
    w = np.clip(q_diff[3], -1.0, 1.0)
    angle = 2.0 * np.arccos(w)
    sin_half = np.sqrt(max(1.0 - w * w, 0.0))
    if sin_half < 1e-12:  # no rotation
        ang = np.zeros(3)
    else:
        ang = (angle / sin_half) * q_diff[:3] / dt
    return lin, ang
