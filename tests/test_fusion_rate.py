"""Fixed-rate fusion output + EGM96 geoid conversion.

The reference publishes robot_localization odometry at a fixed 5 Hz
(``launch/params/ekf_global_node.yaml:13``) and converts vertical datums via
pyproj's EGM96 transform (``extensions/_mock_gps_node.py:57-65,392-408``).
"""
import time

import numpy as np

from gisnav_tpu.nodes.bus import LocalBus
from gisnav_tpu.nodes.fusion_node import TOPIC_ODOMETRY, FusionNode
from gisnav_tpu.nodes.twist_node import TOPIC_TWIST_POSE


def _pose_msg(stamp_us, x=0.0):
    return {
        "stamp_us": stamp_us,
        "position": np.array([x, 0.0, 100.0]),
        "quat_xyzw": np.array([0.0, 0.0, 0.0, 1.0]),
        "covariance": np.diag([1.0] * 3 + [0.01] * 3),
    }


class TestFixedRateFusion:
    def test_output_survives_vo_starvation(self):
        """VO drives ticks normally; when VO stops (e.g. the off-nadir
        gimbal gate), the 5 Hz timer keeps odometry flowing."""
        bus = LocalBus()
        node = FusionNode(bus)
        odoms = []
        bus.subscribe(TOPIC_ODOMETRY, odoms.append)

        # feed VO (absolute into the local filter) for 1 simulated second
        stamp = 1_000_000
        for i in range(6):
            stamp += 200_000
            bus.publish(TOPIC_TWIST_POSE, _pose_msg(stamp, x=i * 1.0))
        n_before = len(odoms)
        assert n_before >= 5

        # VO starves: drive the fixed-rate timer path at 5 Hz stamps
        for k in range(1, 11):
            out = node.tick(stamp + k * 200_000)
            assert out is not None
        assert len(odoms) == n_before + 10
        # stamps advance at the tick rate and the filter keeps predicting
        stamps = [o["stamp_us"] for o in odoms[n_before:]]
        assert stamps == sorted(stamps)
        assert all(np.isfinite(o["position"]).all() for o in odoms)

    def test_tick_now_extrapolates_wall_time(self):
        bus = LocalBus()
        node = FusionNode(bus)
        odoms = []
        bus.subscribe(TOPIC_ODOMETRY, odoms.append)
        stamp = 5_000_000
        for i in range(3):
            stamp += 100_000
            bus.publish(TOPIC_TWIST_POSE, _pose_msg(stamp, x=float(i)))
        time.sleep(0.05)
        out = node.tick_now()
        assert out is not None
        assert out["stamp_us"] > stamp  # extrapolated past the last input

    def test_tick_now_before_any_input(self):
        node = FusionNode(LocalBus())
        assert node.tick_now() is None


class TestGeoid:
    def test_known_egm96_values(self):
        """Spot values from the EGM96 model (the reference's vertical datum
        transform); KSQL airport is the reference's SITL world."""
        from gisnav_tpu.geometry.geoid import geoid_height

        assert abs(geoid_height(-122.25, 37.51) - (-32.2)) < 1.5  # KSQL
        assert abs(geoid_height(24.94, 60.17) - 18.0) < 1.5  # Helsinki
        assert abs(geoid_height(0.0, 51.5) - 46.0) < 1.5  # London
        assert abs(geoid_height(86.93, 27.99) - (-28.5)) < 1.5  # Everest

    def test_lon_wraparound_and_lat_clamp(self):
        from gisnav_tpu.geometry.geoid import geoid_height

        a = geoid_height(179.99, 10.0)
        b = geoid_height(-180.01, 10.0)
        assert abs(a - b) < 0.5
        assert np.isfinite(geoid_height(0.0, 90.0))
        assert np.isfinite(geoid_height(0.0, -90.0))

    def test_mock_gps_uses_geoid(self):
        """alt_amsl = alt_ellipsoid - N(lon, lat) unless geoid_offset_m
        overrides."""
        from gisnav_tpu.geometry.crs import wgs84_to_ecef
        from gisnav_tpu.geometry.geoid import geoid_height
        from gisnav_tpu.nodes.mock_gps import UORBNode
        from gisnav_tpu.nodes.tf import TransformGraph

        lon, lat = 24.94, 60.17
        bus = LocalBus()
        tf = TransformGraph()
        node = UORBNode(bus, tf=tf)
        # earth -> gisnav_odom: odom origin at (lon, lat, 500m ellipsoid)
        h = np.eye(4)
        h[:3, 3] = wgs84_to_ecef(lon, lat, 500.0)
        tf.add("earth", "gisnav_odom", h, 1_000_000, static=True)

        odom = {
            "stamp_us": 1_000_000,
            "frame_id": "gisnav_odom",
            "position": np.zeros(3),
            "quat_xyzw": np.array([0.0, 0.0, 0.0, 1.0]),
            "pose_covariance": np.eye(6),
            "velocity_body": np.zeros(3),
            "angular_velocity_body": np.zeros(3),
            "twist_covariance": np.eye(6),
            "latest_global_match_stamp_us": 1_000_000,
        }
        node._counter = 100  # skip warmup
        fix = node.odom_to_fix(odom)
        n = geoid_height(lon, lat)
        assert abs(fix["altitude_ellipsoid"] - 500.0) < 0.5
        assert abs(fix["altitude_amsl"] - (500.0 - n)) < 0.5

        node2 = UORBNode(bus, params={"geoid_offset_m": 3.0}, tf=tf)
        node2._counter = 100
        fix2 = node2.odom_to_fix(odom)
        assert abs(fix2["altitude_amsl"] - 497.0) < 0.5

    def test_heading_variance_modes(self):
        """Default: cov[5,5] (already rad^2) passes through; the reference's
        double-square unit error is reproducible behind
        ``strict_reference_variance`` (docs/parity.md)."""
        from gisnav_tpu.geometry.crs import wgs84_to_ecef
        from gisnav_tpu.nodes.mock_gps import UORBNode
        from gisnav_tpu.nodes.tf import TransformGraph

        bus = LocalBus()
        tf = TransformGraph()
        h = np.eye(4)
        h[:3, 3] = wgs84_to_ecef(24.94, 60.17, 500.0)
        tf.add("earth", "gisnav_odom", h, 1_000_000, static=True)
        cov = np.eye(6)
        cov[5, 5] = 0.04  # yaw variance (0.2 rad SD)
        odom = {
            "stamp_us": 1_000_000,
            "frame_id": "gisnav_odom",
            "position": np.zeros(3),
            "quat_xyzw": np.array([0.0, 0.0, 0.0, 1.0]),
            "pose_covariance": cov,
            "velocity_body": np.zeros(3),
            "angular_velocity_body": np.zeros(3),
            "twist_covariance": np.eye(6),
            "latest_global_match_stamp_us": 1_000_000,
        }
        sane = UORBNode(bus, tf=tf)
        sane._counter = 100
        assert abs(sane.odom_to_fix(odom)["h_variance_rad"] - 0.04) < 1e-9

        strict = UORBNode(bus, params={"strict_reference_variance": True},
                          tf=tf)
        strict._counter = 100
        assert abs(strict.odom_to_fix(odom)["h_variance_rad"]
                   - 0.04 ** 2) < 1e-9
