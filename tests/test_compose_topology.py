"""Compose-constellation topology checks.

The reference validates its launch topology with testcases over the node
graph (``test/launch/testcases.py`` in hmakelin/gisnav); the compose files
are this framework's deployment topology, so the same idea applies: parse
them and assert the service wiring the docs promise — before a docker host
ever sees them.
"""
import os

import pytest

yaml = pytest.importorskip("yaml")

HERE = os.path.dirname(__file__)
DOCKER = os.path.join(HERE, os.pardir, "docker")


def _load(name):
    with open(os.path.join(DOCKER, name)) as f:
        return yaml.safe_load(f)


class TestPerceptionCompose:
    def test_gisnav_runs_the_deep_backend_with_ros(self):
        svc = _load("docker-compose.yaml")["services"]["gisnav"]
        cmd = " ".join(svc["command"])
        assert "--backend" in cmd and "--ros" in cmd, (
            "the deployed container must launch the benched deep path "
            "with ROS inputs, not a host-SIFT fallback")

    def test_gis_services_have_healthchecks(self):
        services = _load("docker-compose.yaml")["services"]
        for name in ("mapserver", "postgres"):
            assert "healthcheck" in services[name], name

    def test_gisnav_healthcheck_rides_the_shm_bus(self):
        """The heartbeat probe is a separate process — the graph must run
        on the shm transport for it to attach."""
        svc = _load("docker-compose.yaml")["services"]["gisnav"]
        assert "--shm" in svc["command"]
        assert "health" in svc["healthcheck"]["test"]


class TestVehicleCompose:
    def test_constellation_services_present(self):
        services = _load("docker-compose.vehicle.yaml")["services"]
        for name in ("px4", "ardupilot", "micro-ros-agent", "mavros",
                     "gscam"):
            assert name in services, name

    def test_ardupilot_is_profile_gated(self):
        """PX4 and ArduPilot are alternatives; only PX4 runs by default."""
        services = _load("docker-compose.vehicle.yaml")["services"]
        assert "ardupilot" in services["ardupilot"].get("profiles", [])

    def test_gps_bridge_port_is_published(self):
        """`--serial-tcp px4:15000` needs the listener reachable."""
        px4 = _load("docker-compose.vehicle.yaml")["services"]["px4"]
        assert any("15000" in p for p in px4["ports"])

    def test_gscam_shares_the_px4_network(self):
        """The RTP stream is udp:5600 inside the px4 netns."""
        gscam = _load("docker-compose.vehicle.yaml")["services"]["gscam"]
        assert gscam.get("network_mode") == "service:px4"

    def test_vehicle_contexts_exist(self):
        services = _load("docker-compose.vehicle.yaml")["services"]
        for name, svc in services.items():
            ctx = svc.get("build", {}).get("context")
            if ctx:
                path = os.path.join(DOCKER, ctx)
                assert os.path.isfile(os.path.join(path, "Dockerfile")), (
                    f"{name}: build context {ctx} has no Dockerfile")


class TestToolsOverlay:
    def test_tooling_services_present(self):
        services = _load("docker-compose.tools.yaml")["services"]
        for name in ("admin", "qgc", "rviz", "rqt", "monitoring"):
            assert name in services, name

    def test_monitoring_sees_host_pids(self):
        mon = _load("docker-compose.tools.yaml")["services"]["monitoring"]
        assert mon.get("pid") == "host"

    def test_admin_surface_complete(self):
        """Reference parity: nginx proxy + homepage + OpenLayers WFS-T
        track map (hmakelin/gisnav docker-compose.yaml:119-133)."""
        admin = _load("docker-compose.tools.yaml")["services"]["admin"]
        ctx = os.path.join(DOCKER, admin["build"]["context"])
        assert os.path.isfile(os.path.join(ctx, "Dockerfile"))
        conf = open(os.path.join(ctx, "nginx.conf")).read()
        assert "mapserver" in conf and "/wfst" in conf
        page = open(os.path.join(ctx, "html", "index.html")).read()
        # the admin map must read the exact feature type the WFSTNode
        # writes, through the same-origin proxy
        assert "gisnav:position" in page
        assert "/wms" in page


class TestHilOverlay:
    def test_hil_passes_serial_devices_through(self):
        services = _load("docker-compose.hil.yaml")["services"]
        assert services["px4"]["privileged"] is True
        gisnav = services["gisnav"]
        assert any("GISNAV_SERIAL_DEVICE" in v for v in gisnav["volumes"])
        assert "--serial-device" in gisnav["command"]

    def test_hil_mavros_uses_serial_fcu_url(self):
        mavros = _load("docker-compose.hil.yaml")["services"]["mavros"]
        assert any("serial://" in c for c in mavros["command"])
