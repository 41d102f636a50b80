"""SITL end-to-end test (PX4 + Gazebo + full perception graph).

The executable form of the reference's ``test/sitl/test_sitl.py``: boots
the in-repo compose constellation, flies the KSQL airport mission, and
*fails* (not just logs) when the mock GPS diverges from simulator truth
beyond the 10 m gate. Skips with a precise reason on hosts without
docker / mavsdk / rclpy — the driver module itself (``driver.py``) stays
environment-agnostic, so the contract is pinned even where it cannot run.

The always-on tests below validate everything that does not need a
simulator: mission plan integrity, compose service coverage, and the
agreement-gate math.
"""
import json
import os

import pytest

from tests.sitl import driver


def test_mission_plan_is_valid_qgc_plan():
    """The committed plan must import cleanly into mission_raw.

    Checks the QGC `.plan` schema subset MAVSDK's
    ``import_qgroundcontrol_mission`` requires, plus flight-envelope sanity
    (all waypoints within WMS coverage of the compose home point).
    """
    with open(driver.MISSION_PLAN) as f:
        plan = json.load(f)
    assert plan["fileType"] == "Plan"
    mission = plan["mission"]
    items = mission["items"]
    assert items[0]["command"] == 22, "first item must be NAV_TAKEOFF"
    assert items[-1]["command"] in (20, 21), "last item must be RTL/LAND"
    home_lat, home_lon, _ = mission["plannedHomePosition"]
    from gisnav_tpu.geometry.crs import haversine_m

    for item in items:
        if item["command"] != 16:
            continue
        _, _, _, _, lat, lon, alt = item["params"]
        assert 30.0 <= alt <= 800.0, "altitude outside the usable envelope"
        assert haversine_m(home_lat, home_lon, lat, lon) < 2000.0, \
            "waypoint too far from home for the provisioned map extent"


def test_compose_files_cover_sitl_services():
    """Every service the driver boots must exist in the compose files."""
    import re

    declared = set()
    for name in driver.COMPOSE_FILES:
        path = os.path.join(driver.DOCKER_DIR, name)
        with open(path) as f:
            text = f.read()
        in_services = False
        for line in text.splitlines():
            if re.match(r"^services:\s*$", line):
                in_services = True
                continue
            if in_services and re.match(r"^\S", line):
                in_services = False
            m = re.match(r"^  ([A-Za-z0-9_-]+):\s*$", line)
            if in_services and m:
                declared.add(m.group(1))
    missing = set(driver.SITL_SERVICES) - declared
    assert not missing, f"compose files missing services: {missing}"


def test_agreement_gate_math():
    """The pass/fail rule matches the reference's 10 m tolerance."""
    rows = [
        driver.AgreementRow(t_us=0, horiz_m=3.0, vert_m=4.0),
        driver.AgreementRow(t_us=1, horiz_m=10.0, vert_m=10.0),  # inclusive
        driver.AgreementRow(t_us=2, horiz_m=10.1, vert_m=0.0),
        driver.AgreementRow(t_us=3, horiz_m=0.0, vert_m=11.0),
    ]
    report = driver.AgreementReport(rows=rows)
    assert [r.ok for r in rows] == [True, True, False, False]
    assert report.pass_fraction == 0.5
    summary = report.summary()
    assert summary["messages"] == 4
    assert summary["pass_10m"] == 2
    assert summary["max_horiz_m"] == 10.1


def test_empty_report_is_a_failure_not_a_pass():
    assert driver.AgreementReport().pass_fraction == 0.0


def test_gps_outage_window_is_gated_separately():
    """Rows after mark_gps_outage() form the GNSS-denied gate window."""
    report = driver.AgreementReport()
    report.rows.append(driver.AgreementRow(t_us=0, horiz_m=1.0, vert_m=1.0))
    report.rows.append(driver.AgreementRow(t_us=1, horiz_m=99.0, vert_m=0.0))
    report.mark_gps_outage()
    report.rows.append(driver.AgreementRow(t_us=2, horiz_m=2.0, vert_m=2.0))
    report.rows.append(driver.AgreementRow(t_us=3, horiz_m=3.0, vert_m=3.0))
    summary = report.summary()
    assert summary["messages"] == 4
    outage = summary["gps_outage"]
    assert outage["messages"] == 2
    assert outage["pass_fraction"] == 1.0
    assert outage["max_horiz_m"] == 3.0
    # no injection -> no outage block (run_sitl_test then requires none)
    assert "gps_outage" not in driver.AgreementReport(
        rows=report.rows[:1]).summary()


@pytest.mark.slow
@pytest.mark.skipif(driver.sitl_available() is not None,
                    reason=f"SITL: {driver.sitl_available()}")
def test_sitl_px4_mission_gps_agreement(tmp_path):
    """The real thing. Runs only on a docker+ROS capable host."""
    summary = driver.run_sitl_test(
        out_path=str(tmp_path / "sitl_report.json"))
    assert summary["pass_fraction"] >= 0.9
