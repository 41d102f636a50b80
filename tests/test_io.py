"""Tests for NMEA/UBX/uORB mock-GPS encoders."""
import numpy as np

from gisnav_tpu.io import (
    decimal_to_nmea,
    make_gga,
    make_hdt,
    make_nav_pvt,
    make_rmc,
    make_sensor_gps,
    nmea_checksum,
    sentences_for_fix,
    unix_to_gps_time,
)

FIX = dict(
    lat=int(60.123456 * 1e7),
    lon=int(24.654321 * 1e7),
    altitude_ellipsoid=120.5,
    altitude_amsl=103.2,
    yaw_degrees=45.0,
    h_variance_rad=0.01,
    vel_n_m_s=3.0,
    vel_e_m_s=4.0,
    vel_d_m_s=-0.5,
    cog=np.arctan2(4.0, 3.0),
    cog_variance_rad=0.02,
    s_variance_m_s=0.3,
    timestamp=1_700_000_000_000_000,  # us
    eph=2.0,
    epv=3.0,
    satellites_visible=255,
)


class TestNMEA:
    def test_checksum_known_value(self):
        # classic example sentence
        payload = "GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,"
        assert nmea_checksum(payload) == "47"

    def test_decimal_to_nmea(self):
        assert decimal_to_nmea(48.1173) == "4807.0380"
        assert decimal_to_nmea(-11.5167) == "1131.0020"

    def test_gga_structure(self):
        s = make_gga(FIX["timestamp"], 60.123456, 24.654321, 103.2)
        assert s.startswith("$GPGGA,")
        body, cs = s[1:].split("*")
        assert nmea_checksum(body) == cs
        fields = body.split(",")
        assert fields[3] == "N" and fields[5] == "E"
        assert fields[6] == "1" and fields[7] == "12"  # fix, satellites
        assert fields[9] == "103.2"

    def test_all_sentences_have_valid_checksums(self):
        for s in sentences_for_fix(**FIX):
            assert s.startswith("$")
            body, cs = s[1:].split("*")
            assert nmea_checksum(body) == cs, s

    def test_sentence_block_contents(self):
        block = sentences_for_fix(**FIX)
        kinds = [s[3:6] for s in block]
        for k in ("GGA", "VTG", "GSA", "HDT", "GST", "RMC", "GSV"):
            assert k in kinds, k
        assert kinds.count("GSV") == 12
        # velocity sentences removable (PX4 nmea.cpp zeroes s_variance)
        novel = sentences_for_fix(**{**FIX, "include_velocity": False})
        kinds2 = [s[3:6] for s in novel]
        assert "VTG" not in kinds2 and "RMC" not in kinds2

    def test_hdt_rmc(self):
        assert make_hdt(123.456) == make_hdt(123.456)
        s = make_rmc(FIX["timestamp"], 60.1, 24.7, 10.0, 90.0)
        assert ",A," in s


class TestUBX:
    def test_gps_time_of_week(self):
        week, tow = unix_to_gps_time(315964800.0)  # GPS epoch
        assert week == 0 and tow == 0.0
        week, tow = unix_to_gps_time(315964800.0 + 604800 * 10 + 3600)
        assert week == 10 and tow == 3600.0

    def test_nav_pvt_fields(self):
        msg = make_nav_pvt(**FIX)
        assert msg["lat"] == FIX["lat"] and msg["lon"] == FIX["lon"]
        assert msg["height"] == int(120.5 * 1e3)
        assert msg["h_msl"] == int(103.2 * 1e3)
        assert msg["fix_type"] == 3 and msg["flags"] == 0x01
        assert msg["vel_n"] == 3000 and msg["vel_e"] == 4000
        assert msg["g_speed"] == 5000
        assert msg["num_sv"] == 255
        assert msg["year"] == 2023  # timestamp is Nov 2023
        assert 0 <= msg["i_tow"] < 604800 * 1000


class TestUORB:
    def test_sensor_gps_fields(self):
        msg = make_sensor_gps(**FIX)
        assert msg["fix_type"] == 3
        assert msg["lat"] == FIX["lat"]
        assert msg["alt_ellipsoid"] == int(120.5 * 1e3)
        assert msg["alt"] == int(103.2 * 1e3)
        assert np.isclose(msg["vel_m_s"], np.sqrt(9 + 16 + 0.25))
        assert msg["satellites_used"] == 255  # the GISNav fingerprint
        assert np.isclose(msg["heading"], np.radians(45.0))
        assert msg["timestamp"] == 0  # let the consumer stamp it
        assert msg["timestamp_sample"] == FIX["timestamp"]


class TestNMEAGoldenBlock:
    def test_full_block_byte_exact(self):
        """Byte-level golden of the complete per-fix sentence block.

        Field layout mirrors the reference's NMEANode renderers
        (``extensions/nmea_node.py:107-504``): GGA + VTG + GSA + HDT + GST +
        RMC + 12x GSV + ZDA, NMEA checksums per sentence. Any formatting
        drift (coordinate minutes, date fields, checksum casing) breaks the
        PX4 nmea.cpp consumer, so the block is frozen byte-for-byte.
        """
        expected = [
            "$GPGGA,221320.000,6007.4074,N,2439.2593,E,1,12,0.00,103.2,M,"
            "0.0,M,,*68",
            "$GPVTG,53.1,T,,M,9.7,N,,K*77",
            "$GPGSA,A,3,00,01,02,03,04,05,06,07,08,09,10,11,"
            "0.00,0.00,0.00*02",
            "$GPHDT,45.0,T*04",
            "$GPGST,221320.000,3.61,2.00,2.00,0.0,1.41,1.41,9.00*6A",
            "$GPRMC,221320.000,A,6007.4074,N,2439.2593,E,9.7,53.1,231114,"
            "0.0,E*62",
            "$GPGSV,12,1,12,01,85,000,99*74",
            "$GPGSV,12,2,12,02,85,030,99*77",
            "$GPGSV,12,3,12,03,85,060,99*72",
            "$GPGSV,12,4,12,04,85,090,99*7D",
            "$GPGSV,12,5,12,05,85,120,99*77",
            "$GPGSV,12,6,12,06,85,150,99*70",
            "$GPGSV,12,7,12,07,85,180,99*7D",
            "$GPGSV,12,8,12,08,85,210,99*77",
            "$GPGSV,12,9,12,09,85,240,99*72",
            "$GPGSV,12,10,12,10,85,270,99*41",
            "$GPGSV,12,11,12,11,85,300,99*47",
            "$GPGSV,12,12,12,12,85,330,99*44",
            "$GPZDA,221320,14,11,2023,0,0*4E",
        ]
        assert sentences_for_fix(**FIX) == expected


class TestUbxFraming:
    def _pvt(self):
        from gisnav_tpu.io.ubx import make_nav_pvt

        return make_nav_pvt(
            lat=600200000, lon=240300000, altitude_ellipsoid=500.0,
            altitude_amsl=480.0, yaw_degrees=15.0, h_variance_rad=0.01,
            vel_n_m_s=1.0, vel_e_m_s=2.0, vel_d_m_s=0.0, cog=0.5,
            s_variance_m_s=0.3, timestamp=1_700_000_000_000_000, eph=1.0,
            epv=2.0, satellites_visible=255,
        )

    def test_frame_layout_and_checksum(self):
        import struct

        from gisnav_tpu.io.ubx import frame_nav_pvt

        b = frame_nav_pvt(self._pvt())
        assert b[:2] == b"\xb5\x62"          # sync
        assert b[2:4] == b"\x01\x07"          # NAV-PVT class/id
        assert int.from_bytes(b[4:6], "little") == 92
        assert len(b) == 100
        # Fletcher checksum over class..payload
        ck_a = ck_b = 0
        for byte in b[2:-2]:
            ck_a = (ck_a + byte) & 0xFF
            ck_b = (ck_b + ck_a) & 0xFF
        assert b[-2] == ck_a and b[-1] == ck_b
        # lon/lat land at the documented payload offsets (24, 28)
        lon = struct.unpack_from("<l", b, 6 + 24)[0]
        lat = struct.unpack_from("<l", b, 6 + 28)[0]
        assert lon == 240300000 and lat == 600200000


def _read_pty(fd: int, n: int, timeout_s: float = 5.0) -> bytes:
    """Drain up to ``n`` bytes from a pty fd, never blocking past timeout."""
    import os
    import select

    buf = b""
    while len(buf) < n:
        ready, _, _ = select.select([fd], [], [], timeout_s)
        if not ready:
            break
        buf += os.read(fd, n - len(buf))
        timeout_s = 0.2  # subsequent chunks: short drain window
    return buf


class TestSerialBridge:
    def test_nmea_bytes_reach_the_pty(self):
        from gisnav_tpu.io.serial_bridge import SerialBridge
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.mock_gps import TOPIC_NMEA_SENTENCE

        bus = LocalBus()
        bridge = SerialBridge(bus, protocol="nmea")
        try:
            bus.publish(TOPIC_NMEA_SENTENCE,
                        {"stamp_us": 1, "sentence": "$GPGGA,test*00"})
            # byte-exact CRLF: PX4's NMEA parser requires \r\n terminators
            data = _read_pty(bridge._slave, 16)
            assert data == b"$GPGGA,test*00\r\n"
        finally:
            bridge.close()

    def test_ubx_frames_reach_the_pty(self):
        from gisnav_tpu.io.serial_bridge import SerialBridge
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.mock_gps import TOPIC_NAV_PVT

        bus = LocalBus()
        bridge = SerialBridge(bus, protocol="ubx")
        try:
            pvt = TestUbxFraming()._pvt()
            bus.publish(TOPIC_NAV_PVT, pvt)
            # binary frame must arrive whole with no newline needed (raw mode)
            data = _read_pty(bridge._slave, 100)
            assert data[:2] == b"\xb5\x62" and len(data) == 100
        finally:
            bridge.close()

    def test_tcp_bytes_reach_the_listener(self):
        """Cross-container mode: bytes arrive whole on a TCP listener (the
        socat tcp-listen side of the reference's px4 entrypoint)."""
        import socket
        import threading

        from gisnav_tpu.io.serial_bridge import SerialBridge
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.mock_gps import TOPIC_NMEA_SENTENCE

        srv = socket.create_server(("127.0.0.1", 0))
        srv.settimeout(5.0)
        port = srv.getsockname()[1]
        got = []

        def accept():
            conn, _ = srv.accept()
            conn.settimeout(5.0)
            got.append(conn.recv(64))
            conn.close()

        t = threading.Thread(target=accept)
        t.start()
        bus = LocalBus()
        bridge = SerialBridge(bus, protocol="nmea",
                              tcp=f"127.0.0.1:{port}")
        try:
            assert bridge.connected
            bus.publish(TOPIC_NMEA_SENTENCE,
                        {"stamp_us": 1, "sentence": "$GPGGA,test*00"})
            t.join(timeout=5.0)
            assert got == [b"$GPGGA,test*00\r\n"]
        finally:
            bridge.close()
            srv.close()

    def test_tcp_drops_fixes_while_down_then_reconnects(self):
        """GPS is a lossy realtime feed: fixes published while the sim is
        down are dropped (never queued), and the next fix reconnects."""
        import socket
        import threading
        import time

        from gisnav_tpu.io.serial_bridge import SerialBridge
        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.mock_gps import TOPIC_NMEA_SENTENCE

        # reserve a port, but nobody is listening yet
        probe = socket.create_server(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()

        bus = LocalBus()
        bridge = SerialBridge(bus, protocol="nmea",
                              tcp=f"127.0.0.1:{port}",
                              connect_timeout_s=0.1)
        try:
            assert not bridge.connected
            bus.publish(TOPIC_NMEA_SENTENCE,
                        {"stamp_us": 1, "sentence": "$GPGGA,lost*00"})
            assert bridge.bytes_written == 0

            srv = socket.create_server(("127.0.0.1", port))
            srv.settimeout(5.0)
            got = []

            def accept():
                conn, _ = srv.accept()
                conn.settimeout(5.0)
                got.append(conn.recv(64))
                conn.close()

            t = threading.Thread(target=accept)
            t.start()
            # back-off floor: wait past connect_timeout_s then republish
            time.sleep(0.15)
            bus.publish(TOPIC_NMEA_SENTENCE,
                        {"stamp_us": 2, "sentence": "$GPGGA,back*00"})
            if not bridge.connected:  # first fix may only re-arm the dial
                time.sleep(0.15)
                bus.publish(TOPIC_NMEA_SENTENCE,
                            {"stamp_us": 3, "sentence": "$GPGGA,back*00"})
            t.join(timeout=5.0)
            assert got and got[0].endswith(b"$GPGGA,back*00\r\n")
            srv.close()
        finally:
            bridge.close()

    def test_symlink_lifecycle(self, tmp_path):
        import os

        from gisnav_tpu.io.serial_bridge import SerialBridge
        from gisnav_tpu.nodes.bus import LocalBus

        link = str(tmp_path / "gps")
        bridge = SerialBridge(LocalBus(), protocol="nmea", link=link)
        assert os.path.islink(link)
        assert os.readlink(link) == bridge.slave_path
        bridge.close()
        assert not os.path.exists(link)


class TestNonFiniteFixGating:
    def test_geoid_height_nan_safe(self):
        import math

        from gisnav_tpu.geometry.geoid import geoid_height

        assert math.isnan(geoid_height(float("nan"), 60.0))
        assert math.isnan(geoid_height(24.0, float("nan")))

    def test_mock_gps_drops_non_finite_pose(self):
        """A transient NaN transform must drop the fix, not crash
        (int(nan) in the scaled-integer lat/lon fields; regression from
        the round-4 slow-suite run)."""
        import numpy as np

        from gisnav_tpu.nodes.bus import LocalBus
        from gisnav_tpu.nodes.mock_gps import UORBNode, _WARMUP_MESSAGES

        class NanTf:
            def can_transform(self, a, b):
                return True

            def lookup(self, a, b, stamp):
                m = np.eye(4)
                m[0, 3] = float("nan")
                return m

        node = UORBNode(LocalBus(), tf=NanTf())
        odom = {
            "frame_id": "gisnav_odom", "stamp_us": 1,
            "position": np.zeros(3),
            "quat_xyzw": np.array([0.0, 0, 0, 1.0]),
            "velocity_body": np.zeros(3),
            "pose_covariance": np.eye(6),
            "twist_covariance": np.eye(6),
        }
        node._counter = _WARMUP_MESSAGES  # past warmup
        assert node.odom_to_fix(odom) is None  # dropped, no crash
