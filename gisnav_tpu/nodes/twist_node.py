"""TwistNode: shallow-matching visual odometry on consecutive frames.

Capability parity with the reference TwistNode (``core/twist_node.py`` in
hmakelin/gisnav): SIFT on consecutive frames, ratio-test matching, PnP
against the previous frame's flat pixel plane, metric scaling from
distance-to-ground and the camera focal length, cumulative pose integration
in the ``gisnav_odom`` frame. The matcher and PnP run on device.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gisnav_tpu.constants import (
    ROS_NAMESPACE,
    ROS_TOPIC_CAMERA_INFO,
    ROS_TOPIC_IMAGE,
    ROS_TOPIC_MAVROS_GLOBAL_POSITION,
    ROS_TOPIC_RELATIVE_POSE,
    TWIST_NODE_NAME,
)
from gisnav_tpu.features.sift import SiftFeatures, extract_sift, pad_features
from gisnav_tpu.geometry.quaternion import matrix_to_quat
from gisnav_tpu.geometry.se3 import compose, make_transform
from gisnav_tpu.matching.mnn import mnn_ratio_match
from gisnav_tpu.nodes.base import Node
from gisnav_tpu.pnp.ransac import ransac_pnp
from gisnav_tpu.utils.devlock import device_lock

__all__ = ["TwistNode", "TOPIC_TWIST_POSE"]

# the VO pose topic is "~/pose" under the twist node, same as the reference
# graph surface the EKF configs bind to ("/gisnav/twist_node/pose",
# ekf_global_node.yaml:41)
TOPIC_TWIST_POSE = (
    f"/{ROS_NAMESPACE}/{TWIST_NODE_NAME}/"
    + ROS_TOPIC_RELATIVE_POSE.replace("~/", "")
)

# VO covariance template (reference core/_shared.py:8-15)
_VO_COV = np.diag([9.0, 9.0, 9.0] + [np.radians(3.0) ** 2] * 3)


class TwistNode(Node):
    """Publishes the integrated VO pose in the ``gisnav_odom`` frame."""

    MIN_MATCHES = 30  # reference twist_node.py:66
    RATIO = 0.7  # reference twist_node.py:54

    def __init__(self, bus, params=None, tf=None):
        super().__init__(TWIST_NODE_NAME, bus, params, tf)
        self._camera_info = None
        self._prev: Optional[SiftFeatures] = None
        self._pose_odom = np.eye(4)  # odom <- camera
        self._distance_to_ground = float(
            self.param("default_distance_to_ground", 100.0)
        )
        self._ground_alt = float(self.param("ground_altitude_m", 0.0))
        self._max_kp = int(self.param("max_keypoints", 1024))
        self._initialized = False
        self._attitude = None
        self.subscribe(ROS_TOPIC_CAMERA_INFO, self._camera_info_cb)
        self.subscribe(ROS_TOPIC_MAVROS_GLOBAL_POSITION, self._nav_fix_cb)
        from gisnav_tpu.constants import (
            ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS,
        )

        self.subscribe(ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS,
                       self._attitude_cb)
        self.subscribe(ROS_TOPIC_IMAGE, self._image_cb)

    def _camera_info_cb(self, msg):
        self._camera_info = msg

    def _nav_fix_cb(self, msg):
        self._distance_to_ground = max(
            msg["alt_ellipsoid"] - self._ground_alt, 1.0
        )

    def _attitude_cb(self, msg):
        self._attitude = msg

    def _camera_pointed_at_ground(self) -> bool:
        """Gate VO on the camera looking closer to nadir than half the
        horizontal FOV (reference semantics, ``twist_node.py:323-353``: the
        ground-plane scaling assumption breaks off-nadir)."""
        if self._attitude is None or self._camera_info is None:
            return True  # no attitude source: assume nadir rig
        from gisnav_tpu.geometry.quaternion import quat_rotate

        fwd_enu = quat_rotate(
            np.asarray(self._attitude["quat_xyzw"]), np.array([0.0, 0.0, 1.0])
        )  # camera optical +z in ENU
        cos_nadir = -fwd_enu[2] / max(np.linalg.norm(fwd_enu), 1e-9)
        angle_off_nadir = np.arccos(np.clip(cos_nadir, -1.0, 1.0))
        k = np.asarray(self._camera_info["k"]).reshape(3, 3)
        hfov = 2.0 * np.arctan(self._camera_info["width"] / (2.0 * k[0, 0]))
        return bool(angle_off_nadir < np.pi / 2 - hfov / 2)

    def initialize_pose(self, h_odom_cam: np.ndarray) -> None:
        """Seed the cumulative pose (e.g. from the first global fix); until
        then the odom frame is the first camera frame."""
        self._pose_odom = np.asarray(h_odom_cam, np.float64).copy()
        self._initialized = True

    def _image_cb(self, msg) -> None:
        out = self.step(msg)
        # pre-bootstrap VO lives in an arbitrary first-camera frame (z=0);
        # publishing it would seed the fusion filters hundreds of meters
        # from the map frame and the convergence transient leaks into
        # map->odom (observed: mock-GPS altitude halfway between odom and
        # map origins). The reference's twist node similarly boots from
        # FCU tf before publishing (twist_node.py:417-477).
        if out is not None and self._initialized:
            self.publish(TOPIC_TWIST_POSE, out)

    def step(self, image_msg) -> Optional[dict]:
        if self._camera_info is None:
            return None
        if not self._camera_pointed_at_ground():
            self._prev = None  # do not match across a gimbal slew
            return None
        feats = pad_features(
            *extract_sift(image_msg["image"], self._max_kp), self._max_kp
        )
        prev, self._prev = self._prev, feats
        if prev is None or prev.mask.sum() < self.MIN_MATCHES:
            return None

        delta = self._relative_transform(prev, feats)
        if delta is None:
            return None
        # integrate: odom <- cur = (odom <- prev) o (prev <- cur)
        self._pose_odom = compose(self._pose_odom, delta)
        r = self._pose_odom[:3, :3]
        return {
            "stamp_us": int(image_msg["stamp_us"]),
            "frame_id": "gisnav_odom",
            "position": self._pose_odom[:3, 3].copy(),
            "quat_xyzw": matrix_to_quat(r),
            "covariance": _VO_COV.copy(),
        }

    def _relative_transform(self, prev: SiftFeatures, cur: SiftFeatures
                            ) -> Optional[np.ndarray]:
        """(prev camera <- current camera) rigid transform, in meters.

        The previous frame's keypoints form a flat object plane at the
        camera's distance-to-ground; PnP solves the current camera against
        it. In pixel units the previous camera sits at height ``fx`` above
        its own image plane (so one pixel equals ``d / fx`` meters on the
        ground — the reference's hfov scaling, ``twist_node.py:356-404``).
        """
        with device_lock:
            matches, _ = mnn_ratio_match(
                jnp.asarray(cur.descriptors), jnp.asarray(prev.descriptors),
                jnp.asarray(cur.mask), jnp.asarray(prev.mask),
                ratio=self.RATIO, mutual=False,
            )
            matches = np.asarray(matches)
            valid = matches >= 0
            if valid.sum() < self.MIN_MATCHES:
                return None

            k = np.asarray(self._camera_info["k"], np.float64).reshape(3, 3)
            obj = np.zeros((len(matches), 3), np.float32)
            obj[:, :2] = prev.keypoints[np.clip(matches, 0, None)]
            res = ransac_pnp(
                jnp.asarray(obj), jnp.asarray(cur.keypoints),
                jnp.asarray(k, jnp.float32), jnp.asarray(valid),
                min_inliers=self.MIN_MATCHES,
            )
            if not bool(res.valid):
                return None
            r = np.asarray(res.r, np.float64)
            t = np.asarray(res.t, np.float64)

        fx = k[0, 0]
        cx, cy = k[0, 2], k[1, 2]
        gsd = self._distance_to_ground / fx  # meters per pixel
        c1 = -r.T @ t  # current camera center in prev pixel frame
        c0 = np.array([cx, cy, -fx])  # previous camera center, pixel units
        t_rel = (c1 - c0) * gsd
        return make_transform(r.T, t_rel)
