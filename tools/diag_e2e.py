"""Diagnostic for the CLI e2e hover: logs every raw pose measurement and
every mock-GPS fix against ground truth to localize convergence offsets.

Not a test — a forensic tool for the in-suite 10.4 m converged-offset and
filter-NaN failure modes (round 5). Usage::

    python tools/diag_e2e.py [--seconds 240] [--deep-mode cached]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reproduce test-suite conditions: virtual CPU platform (the env's jax
# plugin re-pins jax_platforms at import, so go through jax.config)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=240.0)
    ap.add_argument("--deep-mode", default="cached")
    ap.add_argument("--weights", default="harris_lg5")
    args = ap.parse_args()

    import argparse as _ap
    import threading
    from http.server import HTTPServer

    import tests.test_integration as ti
    from gisnav_tpu.cli import build_app
    from gisnav_tpu.geometry.crs import haversine_m
    from gisnav_tpu.nodes.pose_node import TOPIC_POSE
    from gisnav_tpu.nodes.mock_gps import TOPIC_SENSOR_GPS

    server = HTTPServer(("127.0.0.1", 0), ti._WorldWMS)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    wms_url = f"http://127.0.0.1:{server.server_address[1]}/wms"

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "params.json")
        with open(p, "w") as f:
            json.dump({
                "gis_node": {
                    "wms_url": wms_url,
                    "wms_layers": ["imagery"],
                    "wms_dem_layers": ["dem"],
                },
                "twist_node": {"ground_altitude_m": 0.0},
                "bbox_node": {"ground_altitude_m": 0.0},
                "pose_node": {"ground_altitude_m": 0.0},
            }, f)

        ns = _ap.Namespace(
            protocol="uorb", params=p, shm=False, namespace="gisnav",
            wfst=False, gis_rate=1.0, backend="deep", weights=args.weights,
            deep_mode=args.deep_mode, ros=False,
        )
        app, _ = build_app(ns)

        lat0, lon0, alt = 60.02, 24.03, 500.0
        poses, fixes = [], []
        t_start = time.monotonic()

        def on_pose(msg):
            lon, lat = float(msg["lon"]), float(msg["lat"])
            err = haversine_m(lat0, lon0, lat, lon)
            poses.append((time.monotonic() - t_start, err,
                          float(msg["alt_ellipsoid"]) - alt))
            print(f"POSE  t={poses[-1][0]:7.2f}s horiz={err:7.2f} m "
                  f"dalt={poses[-1][2]:7.2f} m", flush=True)

        def on_fix(msg):
            err = haversine_m(lat0, lon0, msg["lat"] / 1e7, msg["lon"] / 1e7)
            fixes.append((time.monotonic() - t_start, err,
                          msg["alt_ellipsoid"] / 1e3 - alt))
            print(f"FIX   t={fixes[-1][0]:7.2f}s horiz={err:7.2f} m "
                  f"dalt={fixes[-1][2]:7.2f} m", flush=True)

        app.bus.subscribe(TOPIC_POSE, on_pose)
        app.bus.subscribe(TOPIC_SENSOR_GPS, on_fix)
        app.bus.publish("/camera/camera_info",
                        {"k": ti.K_CAM, "width": 640, "height": 480})

        frame = ti._render_frame(lon0, lat0, alt, ti.YAW_DEG)
        quat = ti._camera_attitude_quat(ti.YAW_DEG)
        stamp = 1_000_000
        deadline = time.monotonic() + args.seconds
        while time.monotonic() < deadline and len(fixes) < 20:
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
        server.shutdown()

        print(f"\n{len(poses)} poses, {len(fixes)} fixes")
        if poses:
            tail = [e for _, e, _ in poses[-5:]]
            print("pose tail horiz:", [round(e, 3) for e in tail])
        if fixes:
            tail = [e for _, e, _ in fixes[-5:]]
            print("fix tail horiz:", [round(e, 3) for e in tail])


if __name__ == "__main__":
    main()
