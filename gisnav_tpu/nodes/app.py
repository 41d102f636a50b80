"""Application wiring: construct and connect the full node graph.

The launch-file equivalent (reference ``launch/base.launch.py`` /
``local.launch.py`` in hmakelin/gisnav): instantiates the core nodes, the
fusion node, and the protocol-selected mock-GPS extension over one bus and
one transform graph. Timers (GIS publish, fusion output) are driven by the
caller (``spin``) or externally (tests call ``gis.tick()`` directly).
"""
from __future__ import annotations

import threading
import time
from typing import Any, Dict, Optional

import numpy as np

from gisnav_tpu.nodes.bbox_node import BBoxNode
from gisnav_tpu.nodes.bus import LocalBus
from gisnav_tpu.nodes.fusion_node import FusionNode
from gisnav_tpu.nodes.gis_node import GISNode
from gisnav_tpu.nodes.mock_gps import NMEANode, UBXNode, UORBNode
from gisnav_tpu.nodes.pose_node import TOPIC_POSE, PoseNode
from gisnav_tpu.nodes.tf import TransformGraph
from gisnav_tpu.nodes.twist_node import TwistNode
from gisnav_tpu.nodes.wfst_node import WFSTNode
from gisnav_tpu.geometry.quaternion import quat_to_matrix
from gisnav_tpu.geometry.se3 import make_transform

__all__ = ["GisNavApp"]

_PROTOCOLS = {"uorb": UORBNode, "nmea": NMEANode, "ubx": UBXNode}


class GisNavApp:
    """The full perception graph in one process.

    :param protocol: mock-GPS output protocol ("uorb" | "nmea" | "ubx"),
        mirroring the reference launch argument (``local.launch.py:28-75``)
    :param wfst: also run the WFS-T telemetry sink
    :param deep_runner: optional deep-pipeline callable for PoseNode
    """

    def __init__(
        self,
        bus=None,
        params: Optional[Dict[str, Dict[str, Any]]] = None,
        wms_client=None,
        protocol: str = "uorb",
        wfst: bool = False,
        deep_runner=None,
    ):
        params = params or {}
        self.bus = bus or LocalBus()
        self.tf = TransformGraph()

        self.bbox = BBoxNode(self.bus, params.get("bbox_node"), self.tf)
        self.gis = GISNode(self.bus, params.get("gis_node"), self.tf,
                           wms_client=wms_client)
        self.pose = PoseNode(self.bus, params.get("pose_node"), self.tf,
                             deep_runner=deep_runner)
        self.twist = TwistNode(self.bus, params.get("twist_node"), self.tf)
        self.fusion = FusionNode(self.bus, params.get("fusion_node"), self.tf)
        if protocol not in _PROTOCOLS:
            raise ValueError(f"unknown protocol {protocol!r}")
        self.mock_gps = _PROTOCOLS[protocol](
            self.bus, params.get(f"{protocol}_node"), self.tf
        )
        self.wfst = (
            WFSTNode(self.bus, params.get("wfst_node"), self.tf) if wfst
            else None
        )

        # Bootstrap the VO odom frame from the first global fix so
        # gisnav_odom starts aligned with gisnav_map (the reference does the
        # analogous bootstrap from FCU tf, twist_node.py:417-477)
        self._vo_bootstrapped = False
        self.bus.subscribe(TOPIC_POSE, self._bootstrap_vo)

        self._stop = threading.Event()
        self._threads = []

    def _bootstrap_vo(self, pose_msg) -> None:
        if self._vo_bootstrapped:
            return
        h = make_transform(
            quat_to_matrix(np.asarray(pose_msg["quat_xyzw"])),
            np.asarray(pose_msg["position"]),
        )
        self.twist.initialize_pose(h)
        self._vo_bootstrapped = True

    @property
    def nodes(self):
        out = [self.bbox, self.gis, self.pose, self.twist, self.fusion,
               self.mock_gps]
        if self.wfst is not None:
            out.append(self.wfst)
        return out

    def spin(self, gis_rate_hz: float = 1.0,
             fusion_rate_hz: float = 5.0) -> None:
        """Start background timers (non-blocking).

        :param fusion_rate_hz: fixed odometry output rate (the reference
            publishes robot_localization at 5 Hz,
            ``launch/params/ekf_global_node.yaml:13``) — keeps mock-GPS
            output alive through VO dropouts
        """

        def gis_timer():
            while not self._stop.is_set():
                try:
                    self.gis.tick()
                except Exception:  # noqa: BLE001
                    import traceback

                    traceback.print_exc()
                time.sleep(1.0 / gis_rate_hz)

        def fusion_timer():
            while not self._stop.is_set():
                try:
                    self.fusion.tick_now()
                except Exception:  # noqa: BLE001
                    import traceback

                    traceback.print_exc()
                time.sleep(1.0 / fusion_rate_hz)

        def health_timer():
            while not self._stop.is_set():
                try:
                    self.bus.publish("/gisnav/health", self.health())
                except Exception:  # noqa: BLE001
                    pass
                time.sleep(5.0)

        for target in (gis_timer, fusion_timer, health_timer):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def health(self, stale_after_s: float = 10.0) -> Dict[str, Dict]:
        """Per-node liveness report (the reference relies on Docker
        healthchecks + the autoheal container, SURVEY.md section 5; here the
        graph is one process, so health is introspected directly). Published
        to ``/gisnav/health`` by the spin loop for external monitors."""
        now = time.time()
        report = {}
        for n in self.nodes:
            idle = now - n.last_activity
            report[n.name] = {
                "idle_s": round(idle, 1),
                "healthy": idle < stale_after_s or n.name in
                ("wfst_node",),  # sinks may be legitimately idle
            }
        return report

    def shutdown(self) -> Dict[str, Dict]:
        """Stop timers; return per-node handler timing stats (the reference
        dumps cProfile stats at shutdown, ``__init__.py:160-170``)."""
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        close = getattr(self.bus, "close", None)
        if close is not None:
            close()
        return {n.name: n.timing_stats() for n in self.nodes}
