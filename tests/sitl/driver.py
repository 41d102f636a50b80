"""SITL end-to-end test driver: fly a mission, gate mock GPS vs truth.

Pins the integration contract of the reference's SITL suite
(``ros/gisnav/test/sitl/sitl_px4.py:245-280`` and ``sitl_utils.py:44-54``
in hmakelin/gisnav): boot the Docker Compose simulation, fly the KSQL
airport mission over MAVSDK, subscribe simultaneously to GISNav's mock GPS
output (``/fmu/in/sensor_gps``) and the simulator's ground truth
(``/fmu/out/vehicle_global_position``), and require per-message agreement
within 10 m horizontal / 10 m vertical.

This module is import-safe everywhere: docker, mavsdk, rclpy, and px4_msgs
are only imported inside the functions that need them, and
:func:`sitl_available` reports exactly which prerequisite is missing so the
pytest wrapper can skip with a precise reason. The driver itself is
environment-agnostic — the day a docker-capable host runs it, nothing needs
rewriting.

Differences from the reference (deliberate):

- the GPS gate *fails the test* when the pass fraction drops below
  ``min_pass_fraction`` (the reference logs and comments the failure out,
  ``sitl_px4.py:276-280``);
- agreement statistics are written as one JSON artifact
  (``sitl_report.json``) in the same shape the replay harness and
  ``tools/sweep_headline.py`` emit, instead of requiring the ULog notebook;
- compose services are the in-repo ``docker-compose.vehicle.yaml``
  constellation (px4 + micro-ros-agent + mavros + gscam) layered on the
  perception graph of ``docker-compose.yaml``.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import time
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DOCKER_DIR = os.path.join(REPO_ROOT, "docker")
MISSION_PLAN = os.path.join(DOCKER_DIR, "plans", "ksql_airport_px4.plan")

COMPOSE_FILES = ("docker-compose.yaml", "docker-compose.vehicle.yaml")
SITL_SERVICES = ("px4", "micro-ros-agent", "mavros", "gscam", "gisnav")

MAVLINK_ADDR = "udp://0.0.0.0:14550"
WMS_URL = os.environ.get("GISNAV_SITL_WMS_URL", "http://localhost:80/wms")

MAVLINK_CONNECT_TIMEOUT_S = 180.0  # cold container start compiles the model
WMS_POLL_TIMEOUT_S = 60.0
MISSION_UPLOAD_TIMEOUT_S = 120.0
HEALTH_CHECK_TIMEOUT_S = 120.0
MISSION_TIMEOUT_S = 900.0

HORIZONTAL_GATE_M = 10.0  # reference sitl_px4.py:263-280
VERTICAL_GATE_M = 10.0


def sitl_available() -> Optional[str]:
    """Return None if the SITL stack can run here, else the missing piece.

    Checked in order of increasing cost so the common CI skip (no docker
    binary) is instant.
    """
    if shutil.which("docker") is None:
        return "docker binary not on PATH"
    try:
        probe = subprocess.run(
            ["docker", "info", "--format", "{{.ServerVersion}}"],
            capture_output=True, timeout=20)
    except (subprocess.TimeoutExpired, OSError):
        return "docker daemon not responding"
    if probe.returncode != 0:
        return "docker daemon not available"
    for mod in ("mavsdk", "rclpy", "px4_msgs"):
        try:
            __import__(mod)
        except ImportError:
            return f"python package '{mod}' not importable"
    return None


def _compose_cmd(*verbs: str) -> List[str]:
    cmd = ["docker", "compose"]
    for f in COMPOSE_FILES:
        cmd += ["-f", os.path.join(DOCKER_DIR, f)]
    return cmd + list(verbs)


class SitlEnvironment:
    """Context manager owning the compose constellation lifecycle."""

    def __enter__(self) -> "SitlEnvironment":
        subprocess.run(
            _compose_cmd("up", "-d", "--wait", *SITL_SERVICES),
            check=True, cwd=DOCKER_DIR)
        return self

    def __exit__(self, *exc) -> None:
        # always tear down, even on failure — a half-up constellation
        # poisons the next run (same rule as the reference's cleanup())
        subprocess.run(_compose_cmd("down", "--timeout", "30"),
                       cwd=DOCKER_DIR)


def poll_wms(url: str = WMS_URL,
             timeout_s: float = WMS_POLL_TIMEOUT_S) -> None:
    """Block until the WMS endpoint answers GetCapabilities."""
    import urllib.error
    import urllib.request

    deadline = time.monotonic() + timeout_s
    cap = url + "?service=WMS&request=GetCapabilities"
    last_err: Exception = TimeoutError("never attempted")
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(cap, timeout=5) as resp:
                if resp.status == 200:
                    return
        except (urllib.error.URLError, OSError) as e:
            last_err = e
        time.sleep(1.0)
    raise TimeoutError(f"WMS at {url} not reachable: {last_err}")


@dataclass
class AgreementRow:
    t_us: int
    horiz_m: float
    vert_m: float

    @property
    def ok(self) -> bool:
        return (self.horiz_m <= HORIZONTAL_GATE_M
                and self.vert_m <= VERTICAL_GATE_M)


@dataclass
class AgreementReport:
    rows: List[AgreementRow] = field(default_factory=list)
    # row index at which the simulated GPS was failed (`failure gps off`);
    # None = no injection. Rows from this index on were produced while the
    # vehicle navigated on the mock GPS ALONE — the product's actual claim.
    outage_start_idx: Optional[int] = None

    @property
    def pass_fraction(self) -> float:
        return (sum(r.ok for r in self.rows) / len(self.rows)
                if self.rows else 0.0)

    def mark_gps_outage(self) -> None:
        self.outage_start_idx = len(self.rows)

    def summary(self) -> dict:
        summary = self._stats(self.rows)
        summary["gate"] = {"horizontal_m": HORIZONTAL_GATE_M,
                           "vertical_m": VERTICAL_GATE_M}
        if self.outage_start_idx is not None:
            summary["gps_outage"] = self._stats(
                self.rows[self.outage_start_idx:])
        return summary

    @staticmethod
    def _stats(rows: List[AgreementRow]) -> dict:
        import numpy as np

        horiz = [r.horiz_m for r in rows]
        vert = [r.vert_m for r in rows]
        n_ok = sum(r.ok for r in rows)
        return {
            "messages": len(rows),
            "pass_10m": n_ok,
            "pass_fraction": round(n_ok / len(rows), 4) if rows else 0.0,
            "mean_horiz_m": round(float(np.mean(horiz)), 2) if horiz else None,
            "max_horiz_m": round(float(np.max(horiz)), 2) if horiz else None,
            "mean_vert_m": round(float(np.mean(vert)), 2) if vert else None,
            "max_vert_m": round(float(np.max(vert)), 2) if vert else None,
        }


class GpsAgreementMonitor:
    """rclpy node pairing mock-GPS fixes with the nearest-in-time truth.

    Mirrors the pairing rule of the reference's listener
    (``sitl_px4.py:245-268``): keep a short ring of
    ``VehicleGlobalPosition`` truth samples, and for every
    ``/fmu/in/sensor_gps`` fix compare against the closest timestamp.
    Errors are computed with the framework's own haversine
    (``gisnav_tpu.geometry.crs``) so the gate math is the audited one.
    """

    def __init__(self, node_name: str = "gisnav_sitl_monitor",
                 buffer_size: int = 32):
        import rclpy
        from px4_msgs.msg import SensorGps, VehicleGlobalPosition
        from rclpy.node import Node
        from rclpy.qos import QoSPresetProfiles

        if not rclpy.ok():
            rclpy.init()
        self.report = AgreementReport()
        self._truth: deque = deque(maxlen=buffer_size)
        self.node = Node(node_name)
        qos = QoSPresetProfiles.SENSOR_DATA.value
        self.node.create_subscription(
            VehicleGlobalPosition, "/fmu/out/vehicle_global_position",
            self._truth_cb, qos)
        self.node.create_subscription(
            SensorGps, "/fmu/in/sensor_gps", self._fix_cb, qos)

    def _truth_cb(self, msg) -> None:
        self._truth.append(msg)

    def _fix_cb(self, msg) -> None:
        from gisnav_tpu.geometry.crs import haversine_m

        if not self._truth:
            return
        truth = min(self._truth,
                    key=lambda m: abs(m.timestamp - msg.timestamp))
        horiz = haversine_m(truth.lat, truth.lon,
                            msg.lat * 1e-7, msg.lon * 1e-7)
        vert = abs(truth.alt - msg.alt * 1e-3)
        self.report.rows.append(AgreementRow(
            t_us=int(msg.timestamp), horiz_m=float(horiz),
            vert_m=float(vert)))

    def spin_some(self, seconds: float) -> None:
        import rclpy

        deadline = time.monotonic() + seconds
        while time.monotonic() < deadline:
            rclpy.spin_once(self.node, timeout_sec=0.2)

    def close(self) -> None:
        self.node.destroy_node()


async def inject_gps_failure(drone, monitor: GpsAgreementMonitor) -> bool:
    """Turn the simulated GNSS off mid-flight (the product demo).

    Automates the reference's manual procedure (``README.md:70-76`` in
    hmakelin/gisnav: type ``failure gps off`` into the PX4 shell while the
    mission flies; the vehicle must continue on GISNav's mock GPS alone).
    Primary path is MAVSDK's failure plugin (the MAVLink equivalent of the
    pxh command); the mavlink-shell command is the fallback for PX4 builds
    without the failure plugin compiled in. Returns True when an injection
    path succeeded; the agreement report is marked so rows from this point
    are gated separately as the GNSS-denied window.
    """
    try:
        from mavsdk.failure import FailureType, FailureUnit

        await drone.failure.inject(FailureUnit.SENSOR_GPS,
                                   FailureType.OFF, instance=0)
        monitor.report.mark_gps_outage()
        return True
    except Exception:
        pass
    try:  # fallback: the literal demo command over the mavlink shell
        await drone.shell.send("failure gps off")
        monitor.report.mark_gps_outage()
        return True
    except Exception:
        return False


async def fly_mission(monitor: GpsAgreementMonitor,
                      plan_path: str = MISSION_PLAN,
                      gps_failure_at: Optional[float] = 0.4) -> None:
    """Connect, upload the plan, arm, fly it to completion.

    The monitor is spun between progress polls so agreement rows accrue
    throughout the flight (the reference nests a blocking ``rclpy.spin``
    inside the progress loop; interleaving keeps this single-threaded).

    :param gps_failure_at: mission-progress fraction at which to fail the
        simulated GNSS (``failure gps off``) and continue on mock GPS
        alone — the GNSS-denied product demo. None disables injection.
    """
    import asyncio

    from mavsdk import System

    drone = System()
    await asyncio.wait_for(_connect(drone),
                           timeout=MAVLINK_CONNECT_TIMEOUT_S)
    poll_wms()

    if gps_failure_at is not None:
        # PX4 rejects MAVLink failure injection unless SYS_FAILURE_EN is
        # set; do it before arming (same knob the manual pxh demo needs)
        try:
            await drone.param.set_param_int("SYS_FAILURE_EN", 1)
        except Exception:
            pass  # fall through; injection will use the shell path

    imported = await drone.mission_raw.import_qgroundcontrol_mission(
        plan_path)
    await asyncio.wait_for(
        drone.mission_raw.upload_mission(imported.mission_items),
        timeout=MISSION_UPLOAD_TIMEOUT_S)
    await asyncio.wait_for(_wait_healthy(drone),
                           timeout=HEALTH_CHECK_TIMEOUT_S)
    await drone.action.arm()
    await drone.mission_raw.start_mission()

    injected = gps_failure_at is None
    deadline = time.monotonic() + MISSION_TIMEOUT_S
    async for progress in drone.mission.mission_progress():
        monitor.spin_some(1.0)
        if (not injected and progress.total_mission_items > 0
                and progress.current_item_index
                >= gps_failure_at * progress.total_mission_items):
            injected = await inject_gps_failure(drone, monitor)
        if progress.current_item_index >= progress.total_mission_items:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"mission did not complete in {MISSION_TIMEOUT_S:.0f} s "
                f"(at item {progress.current_item_index}/"
                f"{progress.total_mission_items})")


async def _connect(drone) -> None:
    import asyncio

    await drone.connect(system_address=MAVLINK_ADDR)
    async for state in drone.core.connection_state():
        if state.is_connected:
            return
        await asyncio.sleep(0.5)


async def _wait_healthy(drone) -> None:
    import asyncio

    async for health in drone.telemetry.health():
        if (health.is_global_position_ok
                and health.is_home_position_ok
                and health.is_armable):
            return
        await asyncio.sleep(1.0)


def run_sitl_test(out_path: Optional[str] = None,
                  min_pass_fraction: float = 0.9,
                  gps_failure_at: Optional[float] = 0.4) -> dict:
    """The full end-to-end test; returns the agreement summary dict.

    Raises AssertionError when fewer than ``min_pass_fraction`` of the
    mock-GPS fixes agree with truth inside the 10 m gate, or when no fixes
    arrived at all (a silent pipeline is a failure, not a pass). With GPS
    failure injection enabled (default, at 40% mission progress), the same
    gate is additionally applied to the GNSS-denied window alone, and the
    mission completing at all proves the continuation — the reference's
    manual ``failure gps off`` demo as an automated assertion.
    """
    import asyncio

    with SitlEnvironment():
        monitor = GpsAgreementMonitor()
        try:
            asyncio.run(fly_mission(monitor, gps_failure_at=gps_failure_at))
            monitor.spin_some(5.0)  # drain in-flight messages
        finally:
            monitor.close()

    summary = monitor.report.summary()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=2)
    assert summary["messages"] > 0, \
        "no mock GPS fixes observed during the mission"
    assert summary["pass_fraction"] >= min_pass_fraction, \
        f"GPS agreement gate failed: {summary}"
    if gps_failure_at is not None:
        outage = summary.get("gps_outage")
        assert outage is not None, \
            "GPS failure injection never fired (no failure plugin AND no " \
            "mavlink shell?) — the GNSS-denied demo was not exercised"
        assert outage["messages"] > 0, \
            "no mock GPS fixes during the GNSS outage — the pipeline " \
            "stopped publishing exactly when it mattered"
        assert outage["pass_fraction"] >= min_pass_fraction, \
            f"GNSS-denied agreement gate failed: {outage}"
    return summary


if __name__ == "__main__":
    missing = sitl_available()
    if missing is not None:
        raise SystemExit(f"SITL prerequisites missing: {missing}")
    print(json.dumps(run_sitl_test(out_path="sitl_report.json"), indent=2))
