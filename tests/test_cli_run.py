"""CLI ``run`` wiring tests: the deployed entrypoint must launch the real
product (deep backend + ROS bridge), not a host-SIFT fallback.

The reference's launch layer picks the node set + protocol at startup
(``launch/local.launch.py:28-75`` in hmakelin/gisnav); these tests drive
``cli.build_app`` — the exact construction path of ``gisnav_tpu run`` — and
fly the synthetic world through it with the deep backend.
"""
import argparse
import json

import numpy as np
import pytest

import tests.test_integration as ti
from gisnav_tpu.cli import build_app
from gisnav_tpu.geometry.crs import haversine_m
from gisnav_tpu.nodes.mock_gps import TOPIC_SENSOR_GPS

wms_url = ti.wms_url  # re-export the module-scoped stub-WMS fixture


def _args(**over):
    base = dict(
        protocol="uorb", params=None, shm=False, namespace="gisnav",
        wfst=False, gis_rate=1.0, backend="deep", weights="harris_lg5",
        deep_mode="cached", ros=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


class TestBuildApp:
    def test_serial_tcp_bridge_attached(self):
        """--serial-tcp wires a TCP SerialBridge into the constructed app
        (the SITL-constellation GPS feed; docker-compose.vehicle.yaml)."""
        import socket
        import threading

        srv = socket.create_server(("127.0.0.1", 0))
        srv.settimeout(5.0)
        port = srv.getsockname()[1]
        accepted = []
        t = threading.Thread(
            target=lambda: accepted.append(srv.accept()[0]))
        t.start()
        app, _ = build_app(_args(
            protocol="nmea", backend="classical",
            serial_tcp=f"127.0.0.1:{port}"))
        try:
            t.join(timeout=5.0)
            assert getattr(app, "serial_bridge", None) is not None
            assert app.serial_bridge.connected
        finally:
            app.serial_bridge.close()
            for c in accepted:
                c.close()
            srv.close()

    def test_serial_bridge_skipped_for_uorb(self):
        """uorb rides the DDS agent; no byte-level serial feed exists."""
        app, _ = build_app(_args(
            protocol="uorb", backend="classical",
            serial_tcp="127.0.0.1:1"))
        assert getattr(app, "serial_bridge", None) is None

    def test_deep_backend_attaches_runner(self):
        app, adapter = build_app(_args())
        assert app.pose._deep_runner is not None, (
            "deep backend must not fall back to host SIFT"
        )
        # bundled harris_lg5 comes with its own 480x640/512kp config
        assert app.pose._config.detector_mode == "harris"
        assert adapter is None  # --ros not requested

    def test_classical_backend_has_no_runner(self):
        app, _ = build_app(_args(backend="classical"))
        assert app.pose._deep_runner is None

    def test_semidense_backend_attaches_runner(self):
        app, _ = build_app(_args(backend="semidense"))
        assert app.pose._deep_runner is not None

    def test_learned_lg9_weights_selectable(self):
        app, _ = build_app(_args(weights="learned_lg9"))
        assert app.pose._deep_runner is not None
        assert app.pose._config.lightglue_depth == 9

    def test_npz_path_weights(self):
        from gisnav_tpu.weights import PRETRAINED_PATH

        app, _ = build_app(_args(weights=str(PRETRAINED_PATH)))
        assert app.pose._deep_runner is not None

    def test_params_file_overrides_survive(self, tmp_path):
        p = tmp_path / "params.json"
        p.write_text(json.dumps({
            "pose_node": {"min_matches": 21},
            "gis_node": {"wms_url": "http://example:80/wms"},
        }))
        app, _ = build_app(_args(params=str(p)))
        assert app.pose.param("min_matches") == 21
        assert app.pose.param("backend") == "deep"  # CLI default threaded in

    def test_protocol_selects_extension_node(self):
        from gisnav_tpu.nodes.mock_gps import NMEANode

        app, _ = build_app(_args(protocol="nmea", backend="classical"))
        assert isinstance(app.mock_gps, NMEANode)

    def test_ros_flag_degrades_gracefully_without_rclpy(self, capsys):
        # rclpy is absent in this environment: --ros must warn, not crash
        app, adapter = build_app(_args(ros=True, backend="classical"))
        assert adapter is None
        assert app is not None


@pytest.mark.slow
class TestCliRunEndToEnd:
    def test_deep_backend_flies_the_synthetic_world(self, wms_url, tmp_path):
        """Hover through the CLI-constructed wiring with the deep backend:
        fixes must clear the reference's 10 m SITL gate.

        The CLI bus is async (per-subscriber worker queues with sensor-QoS
        drops), so this drives a stationary hover on a wall-clock loop —
        frames dropped while the device programs compile don't matter, and
        the constant ground truth makes the gate timing-independent.
        """
        import time

        p = tmp_path / "params.json"
        p.write_text(json.dumps({
            "gis_node": {
                "wms_url": wms_url,
                "wms_layers": ["imagery"],
                "wms_dem_layers": ["dem"],
            },
            "twist_node": {"ground_altitude_m": 0.0},
            "bbox_node": {"ground_altitude_m": 0.0},
            "pose_node": {"ground_altitude_m": 0.0},
        }))
        app, _ = build_app(_args(params=str(p)))
        assert app.pose._deep_runner is not None

        fixes = []
        app.bus.subscribe(TOPIC_SENSOR_GPS, fixes.append)
        app.bus.publish("/camera/camera_info",
                        {"k": ti.K_CAM, "width": 640, "height": 480})

        lat0, lon0, alt = 60.02, 24.03, 500.0
        frame = ti._render_frame(lon0, lat0, alt, ti.YAW_DEG)
        quat = ti._camera_attitude_quat(ti.YAW_DEG)
        stamp = 1_000_000
        deadline = time.monotonic() + 480.0
        # gate STEADY-STATE output statistically: the first fused fixes
        # ride the global filter's convergence transient (how converged is
        # process-warmth-dependent — observed 12.9 m on fix #1 in-suite vs
        # <2 m standalone), and on a loaded 1-core host individual fixes
        # also vary with frame-drop timing and the per-frame RANSAC draw.
        # The reference's SITL gate is likewise statistical over a mission
        # (sitl_px4.py:263-280 averages over the flight). Collect eight,
        # gate the MEDIAN of the last five.
        want = 8
        while len(fixes) < want and time.monotonic() < deadline:
            stamp += 250_000
            app.bus.publish("/mavros/global_position/global", {
                "stamp_us": stamp, "lat": lat0, "lon": lon0,
                "alt_ellipsoid": alt,
            })
            app.bus.publish(
                "/mavros/gimbal_control/device/attitude_status",
                {"stamp_us": stamp, "quat_xyzw": quat},
            )
            if stamp % 2_000_000 < 250_000:
                app.gis.tick()
            app.bus.publish("/camera/image_raw", {
                "stamp_us": stamp, "frame_id": "camera_optical",
                "image": frame,
            })
            time.sleep(0.25)
        app.shutdown()

        assert len(fixes) >= want, f"deep CLI path produced {len(fixes)} fixes"
        tail = fixes[-5:]
        horizs = [haversine_m(lat0, lon0, f["lat"] / 1e7, f["lon"] / 1e7)
                  for f in tail]
        alts = [abs(f["alt_ellipsoid"] / 1e3 - alt) for f in tail]
        assert float(np.median(horizs)) < 10.0, (horizs, tail)
        assert float(np.median(alts)) < 10.0, (alts, tail)
