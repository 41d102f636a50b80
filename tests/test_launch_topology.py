"""Launch-topology smoke test: the graph exposes the expected node/topic set.

Equivalent of the reference's launch tests
(``test/launch/test_default_launch.py`` + ``testcases.py:29-60`` in
hmakelin/gisnav), which boot the launch file and assert the expected nodes
and topics appear. Here the app constructs synchronously, so the check is
direct: every expected node exists, every expected topic has a subscriber or
a publisher, and each protocol launch arg selects the right extension node.
"""
import pytest

from gisnav_tpu.constants import (
    ROS_TOPIC_CAMERA_INFO,
    ROS_TOPIC_IMAGE,
    ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS,
    ROS_TOPIC_MAVROS_GLOBAL_POSITION,
    ROS_TOPIC_ROBOT_LOCALIZATION_ODOMETRY,
)
from gisnav_tpu.nodes import GisNavApp, NMEANode, UBXNode, UORBNode
from gisnav_tpu.nodes.bbox_node import TOPIC_FOV_BOUNDING_BOX
from gisnav_tpu.nodes.bus import LocalBus
from gisnav_tpu.nodes.gis_node import TOPIC_ORTHOIMAGE
from gisnav_tpu.nodes.pose_node import TOPIC_POSE
from gisnav_tpu.nodes.twist_node import TOPIC_TWIST_POSE


class _SpyBus(LocalBus):
    def __init__(self):
        super().__init__()
        self.subscribed_topics = set()
        self.published_topics = set()

    def subscribe(self, topic, callback):
        self.subscribed_topics.add(topic)
        super().subscribe(topic, callback)

    def publish(self, topic, message):
        self.published_topics.add(topic)
        super().publish(topic, message)


EXPECTED_NODE_NAMES = {
    "bbox_node", "gis_node", "pose_node", "twist_node", "fusion_node",
}

EXPECTED_SUBSCRIBED = {
    ROS_TOPIC_IMAGE,
    ROS_TOPIC_CAMERA_INFO,
    ROS_TOPIC_MAVROS_GLOBAL_POSITION,
    ROS_TOPIC_MAVROS_GIMBAL_DEVICE_ATTITUDE_STATUS,
    TOPIC_FOV_BOUNDING_BOX,
    TOPIC_ORTHOIMAGE,
    TOPIC_POSE,
    TOPIC_TWIST_POSE,
    ROS_TOPIC_ROBOT_LOCALIZATION_ODOMETRY,
}


class TestLaunchTopology:
    def test_expected_nodes_and_subscriptions(self):
        bus = _SpyBus()
        app = GisNavApp(bus=bus, protocol="uorb")
        names = {n.name for n in app.nodes}
        assert EXPECTED_NODE_NAMES <= names
        assert "uorb_node" in names
        missing = EXPECTED_SUBSCRIBED - bus.subscribed_topics
        assert not missing, missing

    @pytest.mark.parametrize("protocol,cls,name", [
        ("uorb", UORBNode, "uorb_node"),
        ("nmea", NMEANode, "nmea_node"),
        ("ubx", UBXNode, "ubx_node"),
    ])
    def test_protocol_selects_extension_node(self, protocol, cls, name):
        app = GisNavApp(bus=_SpyBus(), protocol=protocol)
        assert isinstance(app.mock_gps, cls)
        assert app.mock_gps.name == name

    def test_unknown_protocol_rejected(self):
        with pytest.raises(ValueError, match="protocol"):
            GisNavApp(bus=_SpyBus(), protocol="bogus")

    def test_topic_names_match_reference_surface(self):
        # spot-check the exact strings the reference graph exposes
        assert TOPIC_POSE == "/gisnav/pose_node/pose"
        assert TOPIC_TWIST_POSE == "/gisnav/twist_node/pose"
        assert TOPIC_ORTHOIMAGE == "/gisnav/gis_node/orthoimage"
        assert TOPIC_FOV_BOUNDING_BOX == "/gisnav/bbox_node/fov/bounding_box"
        assert (ROS_TOPIC_ROBOT_LOCALIZATION_ODOMETRY
                == "/robot_localization/odometry/filtered")


class TestHealth:
    def test_health_report(self):
        import time

        app = GisNavApp(bus=_SpyBus(), protocol="uorb")
        rep = app.health(stale_after_s=10.0)
        assert set(n.name for n in app.nodes) == set(rep)
        assert all(v["healthy"] for v in rep.values())  # just constructed
        # simulate staleness
        app.pose.last_activity = time.time() - 100
        rep = app.health(stale_after_s=10.0)
        assert not rep["pose_node"]["healthy"]
