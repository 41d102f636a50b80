"""The node graph: transport, transform graph, and all framework nodes."""
from gisnav_tpu.nodes.app import GisNavApp  # noqa: F401
from gisnav_tpu.nodes.base import Node  # noqa: F401
from gisnav_tpu.nodes.bbox_node import BBoxNode  # noqa: F401
from gisnav_tpu.nodes.bus import LocalBus, ShmBus  # noqa: F401
from gisnav_tpu.nodes.fusion_node import FusionNode  # noqa: F401
from gisnav_tpu.nodes.gis_node import GISNode  # noqa: F401
from gisnav_tpu.nodes.mock_gps import (  # noqa: F401
    MockGPSNode,
    NMEANode,
    UBXNode,
    UORBNode,
)
from gisnav_tpu.nodes.pose_node import PoseNode  # noqa: F401
from gisnav_tpu.nodes.tf import TransformGraph, TransformLookupError  # noqa: F401
from gisnav_tpu.nodes.twist_node import TwistNode  # noqa: F401
from gisnav_tpu.nodes.wfst_node import WFSTNode  # noqa: F401
