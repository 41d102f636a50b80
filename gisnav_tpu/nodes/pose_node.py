"""PoseNode: deep/classical global pose from camera frame vs orthoimage.

Capability parity with the reference PoseNode (``core/pose_node.py:186-497``
in hmakelin/gisnav): match the frame against the current map raster, solve
PnP, bootstrap the ``earth -> gisnav_map`` frame on the first valid fix, and
publish the pose in the ``gisnav_map`` frame with the reference covariance
template. Two backends:

- ``classical`` (default): host SIFT + device MNN/PnP — works untrained;
- ``deep``: the cached-reference SuperPoint+LightGlue device program
  (requires trained/converted parameters).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from gisnav_tpu.constants import (
    POSE_NODE_NAME,
    ROS_NAMESPACE,
    ROS_TOPIC_CAMERA_INFO,
    ROS_TOPIC_IMAGE,
    ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS,
    ROS_TOPIC_MAVROS_GLOBAL_POSITION,
    ROS_TOPIC_RELATIVE_POSE,
)
from gisnav_tpu.geometry.crs import enu_to_ecef_matrix, proj_to_affine, wgs84_to_ecef
from gisnav_tpu.geometry.quaternion import matrix_to_quat, quat_to_matrix
from gisnav_tpu.geometry.se3 import invert, make_transform
from gisnav_tpu.nodes.base import Node
from gisnav_tpu.nodes.gis_node import TOPIC_ORTHOIMAGE
from gisnav_tpu.pipeline import PipelineConfig
from gisnav_tpu.pipeline.classical import classical_frame_to_geopose
from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
from gisnav_tpu.utils.devlock import device_lock

__all__ = ["PoseNode", "TOPIC_POSE"]

TOPIC_POSE = (
    f"/{ROS_NAMESPACE}/{POSE_NODE_NAME}/"
    + ROS_TOPIC_RELATIVE_POSE.replace("~/", "")
)

# Reference covariance template: 3 m position SD, ~3 deg angle SD
# (core/_shared.py:8-23)
_POSE_COV = np.diag([9.0, 9.0, 9.0] + [np.radians(3.0) ** 2] * 3)


class PoseNode(Node):
    """Publishes the global pose in the ``gisnav_map`` frame."""

    def __init__(self, bus, params=None, tf=None, deep_runner=None):
        super().__init__(POSE_NODE_NAME, bus, params, tf)
        self._camera_info = None
        self._ortho = None
        self._attitude = None
        self._map_origin = None  # (H_earth_map 4x4, lon, lat)
        self._config = PipelineConfig(
            image_shape=tuple(self.param("image_shape", (480, 640))),
            max_keypoints=int(self.param("max_keypoints", 1024)),
            min_matches=int(self.param("min_matches", 15)),
        )
        self._deep_runner = deep_runner
        if self._deep_runner is None and self.param("backend") == "semidense":
            from gisnav_tpu.pipeline.runners import make_semidense_runner

            # detector-free LoFTR variant (no weight-file requirement;
            # pass trained params via runner injection for best quality)
            self._deep_runner = make_semidense_runner(
                params=self.param("semidense_params", None))
        if self._deep_runner is None and self.param("backend") == "deep":
            try:
                from gisnav_tpu.pipeline.runners import (
                    PRETRAINED_CONFIG,
                    make_cached_deep_runner,
                    make_deep_runner,
                )

                from gisnav_tpu.pipeline.runners import load_bundled

                # weights: "learned_lg9" (default; the round-4 both-gates
                # production architecture) or "harris_lg5" (fastest at the
                # reference-class 640x480 camera in cached mode)
                wparams, wconfig = load_bundled(
                    self.param("weights", "learned_lg9"))
                # production default: BUCKETED warp mode — the map crop is
                # warped at a 15-degree-quantized rotation and its features
                # cached; per frame only the query extracts (8/8 yaws <10 m
                # at worst-case bucket-edge residuals AND 80 FPS at
                # 1080p/2048 kp on one v5e; the headline bench.py measures).
                # "warp" is the exact per-frame warp (dual extraction,
                # ~52 FPS); "cached" keeps unwarped map features between
                # refreshes (fastest, rotation-weaker at high resolution).
                mode = self.param("deep_mode", "warp-bucketed")
                if mode == "warp-bucketed":
                    from gisnav_tpu.pipeline.runners import (
                        make_bucketed_warp_runner,
                    )

                    self._deep_runner = make_bucketed_warp_runner(
                        params=wparams, config=wconfig)
                elif mode == "warp":
                    self._deep_runner = make_deep_runner(
                        params=wparams, config=wconfig)
                else:
                    # derotate_query: opt-in query-side derotation for
                    # rotation-sensitive weight sets (converted public
                    # checkpoints); the bundled rotation-trained sets
                    # measure better without it
                    self._deep_runner = make_cached_deep_runner(
                        params=wparams, config=wconfig,
                        derotate=bool(self.param("derotate_query", False)))
                self._config = wconfig
            except FileNotFoundError as e:
                self.log.warning(
                    "deep backend requested but %s; using classical", e
                )
        self._runner_takes_map_stamp = False
        self._runner_takes_altitude = False
        self._runner_takes_prior = False
        self._altitude_agl = None
        self._prior_lonlat = None
        if self._deep_runner is not None:
            import inspect

            try:
                sig = inspect.signature(self._deep_runner)
                self._runner_takes_map_stamp = "map_stamp" in sig.parameters
                self._runner_takes_altitude = (
                    "altitude_agl" in sig.parameters)
                self._runner_takes_prior = (
                    "prior_lonlat" in sig.parameters)
            except (TypeError, ValueError):
                pass
        self.subscribe(ROS_TOPIC_CAMERA_INFO, self._camera_info_cb)
        self.subscribe(TOPIC_ORTHOIMAGE, self._orthoimage_cb)
        self.subscribe(
            ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS, self._attitude_cb
        )
        self.subscribe(ROS_TOPIC_MAVROS_GLOBAL_POSITION, self._nav_fix_cb)
        self.subscribe(ROS_TOPIC_IMAGE, self._image_cb)

    # -- inputs ------------------------------------------------------------

    def _camera_info_cb(self, msg):
        self._camera_info = msg

    def _nav_fix_cb(self, msg):
        # rough altitude drives cached-mode GSD matching (runner shrinks
        # the query to the map raster's ground sample distance); rough
        # lon/lat drives the position-prior candidate gate
        self._altitude_agl = float(
            msg.get("alt_ellipsoid", 0.0)
        ) - float(self.param("ground_altitude_m", 0.0))
        if "lon" in msg and "lat" in msg:
            self._prior_lonlat = (float(msg["lon"]), float(msg["lat"]))

    def _orthoimage_cb(self, msg):
        self._ortho = msg

    def _attitude_cb(self, msg):
        self._attitude = msg

    # -- core --------------------------------------------------------------

    def _image_cb(self, msg) -> None:
        pose = self.estimate(msg)
        if pose is not None:
            self.publish(TOPIC_POSE, pose)

    def _rotation_deg(self) -> float:
        """Map-alignment rotation: rotate the north-up reference raster by
        this angle (cv2 CCW, y-down) so its content matches the camera
        image orientation.

        Derived geometrically: the IMAGE-UP direction in ENU is the
        camera_optical frame's -y axis; the map rotation that aligns map
        north with image up is that vector's compass angle
        ``atan2(up_east, up_north)`` (render-alignment verified, ncc 0.986
        at the correct angle on the synthetic world). The previous
        ``-heading`` formula was off by a yaw-dependent amount — masked for
        the SIFT/LightGlue backends by their rotation robustness, fatal
        for the semidense (LoFTR) backend whose coarse cell matching has
        none.
        """
        if self._attitude is None:
            return 0.0
        r = quat_to_matrix(np.asarray(self._attitude["quat_xyzw"]))
        up = -r[:, 1]  # image-up in ENU
        return float(np.degrees(np.arctan2(up[0], up[1])))

    def estimate(self, image_msg) -> Optional[dict]:
        if self._ortho is None or self._camera_info is None:
            return None
        query = image_msg["image"]
        h, w = self._config.image_shape
        if query.shape != (h, w):
            self.log.warning("frame shape %s != configured %s", query.shape,
                             (h, w))
            return None

        aff = proj_to_affine(self._ortho["crs"])
        aff4 = np.eye(4)
        aff4[:3, :] = aff
        with device_lock:
            if self._deep_runner is not None:
                kw = {}
                if self._runner_takes_map_stamp:
                    kw["map_stamp"] = self._ortho.get("stamp_us")
                if self._runner_takes_altitude:
                    kw["altitude_agl"] = self._altitude_agl
                if self._runner_takes_prior:
                    kw["prior_lonlat"] = self._prior_lonlat
                geopose = self._deep_runner(
                    query, self._ortho["image"], self._ortho["dem"],
                    self._rotation_deg(), self._camera_info["k"], aff4, **kw,
                )
            else:
                geopose = classical_frame_to_geopose(
                    query,
                    self._ortho["image"],
                    self._ortho["dem"],
                    self._rotation_deg(),
                    self._camera_info["k"],
                    aff4,
                    self._config,
                )
            if not bool(geopose.valid):
                self.log.debug("no valid pose (%d matches)",
                               int(geopose.num_matches))
                return None

        if self.param("dev_topics", False):
            self._publish_dev_images(image_msg, geopose)

        out = geopose_to_wgs84_f64(geopose, aff4)
        return self._to_map_frame(image_msg["stamp_us"], out)

    def _publish_dev_images(self, image_msg, geopose) -> None:
        """Dev topics: match image + camera-position image (reference
        ``~/dev/matches_image`` / ``~/dev/position_image``,
        ``pose_node.py:145-151,310-346``)."""
        from gisnav_tpu.nodes.viz import draw_matches, draw_position

        m = np.asarray(geopose.m_crop, np.float64)
        mkp_ref = np.asarray(geopose.matched_ref, np.float64)
        ones = np.ones((len(mkp_ref), 1))
        ref_full = (np.hstack([mkp_ref, ones]) @ m.T)[:, :2]
        mask = np.asarray(geopose.match_mask)
        stamp = image_msg["stamp_us"]

        matches_img = draw_matches(
            image_msg["image"], self._ortho["image"],
            np.asarray(geopose.matched_qry), ref_full, mask,
        )
        self.publish(f"/{ROS_NAMESPACE}/{POSE_NODE_NAME}/dev/matches_image",
                     {"stamp_us": stamp, "image": matches_img})

        cam = np.asarray(geopose.cam_pos_raster, np.float64)
        cam_full = (m @ np.array([cam[0], cam[1], 1.0]))[:2]
        pos_img = draw_position(self._ortho["image"], cam_full, ref_full, mask)
        if pos_img is not None:
            self.publish(
                f"/{ROS_NAMESPACE}/{POSE_NODE_NAME}/dev/position_image",
                {"stamp_us": stamp, "image": pos_img},
            )

    # -- frame bootstrap ---------------------------------------------------

    def _to_map_frame(self, stamp_us: int, wgs84: dict) -> dict:
        """Bootstrap ``earth -> gisnav_map`` on the first fix, then express
        the camera pose in the map (local ENU) frame
        (reference ``pose_node.py:389-473``)."""
        ecef = np.asarray(wgs84["ecef"])
        if self._map_origin is None:
            r = enu_to_ecef_matrix(wgs84["lon"], wgs84["lat"])
            origin = np.array(
                wgs84_to_ecef(wgs84["lon"], wgs84["lat"], 0.0)
            )
            h_earth_map = make_transform(r, origin)
            self._map_origin = (h_earth_map, wgs84["lon"], wgs84["lat"])
            if self.tf is not None:
                self.tf.add("earth", "gisnav_map", h_earth_map, stamp_us,
                            static=True)
        h_earth_map, _, _ = self._map_origin

        pos_map = (invert(h_earth_map) @ np.append(ecef, 1.0))[:3]
        # camera orientation in map(ENU) frame
        r_map_cam = np.asarray(wgs84["r_enu_cam"])
        return {
            "stamp_us": int(stamp_us),
            "frame_id": "gisnav_map",
            "position": pos_map,
            "quat_xyzw": matrix_to_quat(r_map_cam),
            "covariance": _POSE_COV.copy(),
            "lon": wgs84["lon"],
            "lat": wgs84["lat"],
            "alt_ellipsoid": wgs84["alt_ellipsoid"],
        }
