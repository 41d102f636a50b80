"""Property-based tests for the mock-GPS wire encoders (hypothesis).

The NMEA/UBX byte streams feed a real autopilot's GPS parser
(PX4 ``nmea.cpp`` / the u-blox driver), so malformed output at ANY input
is a field failure, not a test nicety. These properties assert the
invariants the parsers rely on: checksum validity, field syntax, frame
length/Fletcher integrity, and struct-roundtrip of every NavPVT field —
over the whole input space, not just the fixture values of
``test_io.py``.
"""
import re
import struct

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from gisnav_tpu.io.nmea import (  # noqa: E402
    decimal_to_nmea,
    nmea_checksum,
    sentences_for_fix,
)
from gisnav_tpu.io.ubx import (  # noqa: E402
    frame_nav_pvt,
    make_nav_pvt,
    unix_to_gps_time,
)

MAX_EXAMPLES = 60
finite = dict(allow_nan=False, allow_infinity=False)

# plausible mock-GPS fix inputs (reference MockGPSDict ranges)
lat_e7 = st.integers(int(-89.9e7), int(89.9e7))
lon_e7 = st.integers(int(-179.9e7), int(179.9e7))
alt_m = st.floats(-400, 40000, **finite)
ts_us = st.integers(0, 4_000_000_000_000_000)  # POSIX us through ~2096
vel = st.floats(-200, 200, **finite)
yaw = st.floats(0, 360, **finite)
cog_rad = st.floats(0, 6.283, **finite)
acc = st.floats(0, 100, **finite)


class TestNMEAProperties:
    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(lat_e7, lon_e7, alt_m, ts_us, vel, vel, yaw, cog_rad, acc, acc)
    def test_every_sentence_well_formed(self, lat, lon, alt, ts, vn, ve,
                                        y, cog, eph, epv):
        block = sentences_for_fix(
            lat=lat, lon=lon, altitude_amsl=alt, timestamp=ts,
            vel_n_m_s=vn, vel_e_m_s=ve, yaw_degrees=y, cog=cog,
            eph=eph, epv=epv,
        )
        assert block, "a fix must render at least one sentence"
        for s in block:
            # $TTFFF,...*CS — printable ASCII, no embedded $ or *
            m = re.fullmatch(r"\$([A-Z]{2}[A-Z]{3},[\x20-\x7E]*)\*"
                             r"([0-9A-F]{2})", s)
            assert m, s
            payload, cs = m.groups()
            assert "$" not in payload and "*" not in payload
            assert nmea_checksum(payload) == cs
            assert len(s) <= 82, s  # NMEA 0183 maximum sentence length

    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(st.floats(-180, 180, **finite))
    def test_decimal_to_nmea_roundtrip(self, deg):
        enc = decimal_to_nmea(deg)
        m = re.fullmatch(r"(\d{2,3})(\d{2}\.\d{4})", enc)
        assert m, enc
        back = int(m.group(1)) + float(m.group(2)) / 60.0
        # sign is carried out-of-band (N/S/E/W field)
        assert abs(back - abs(deg)) < 1e-4 / 60 + 1e-9

    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(lat_e7, lon_e7, alt_m, ts_us, vel, vel, yaw, cog_rad, acc, acc)
    def test_gga_fields_parse(self, lat, lon, alt, ts, vn, ve, y, cog,
                              eph, epv):
        gga = sentences_for_fix(
            lat=lat, lon=lon, altitude_amsl=alt, timestamp=ts,
            vel_n_m_s=vn, vel_e_m_s=ve, yaw_degrees=y, cog=cog,
            eph=eph, epv=epv,
        )[0]
        fields = gga.split("*")[0].split(",")
        assert fields[0] == "$GPGGA"
        assert fields[3] in ("N", "S") and fields[5] in ("E", "W")
        assert fields[3] == ("S" if lat < 0 else "N")
        assert fields[5] == ("W" if lon < 0 else "E")
        assert abs(float(fields[9]) - alt) < 0.05  # altitude field


def _pvt(lat, lon, h_ell, h_msl, y, vn, ve, vd, eph, epv, t_us):
    return make_nav_pvt(
        lat=lat, lon=lon, altitude_ellipsoid=h_ell, altitude_amsl=h_msl,
        yaw_degrees=y, h_variance_rad=0.01, vel_n_m_s=vn, vel_e_m_s=ve,
        vel_d_m_s=vd, cog=0.5, s_variance_m_s=0.1, timestamp=t_us,
        eph=eph, epv=epv, satellites_visible=255,
    )


class TestUBXProperties:
    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(lat_e7, lon_e7, alt_m, alt_m, yaw, vel, vel, vel, acc, acc,
           ts_us)
    def test_frame_integrity(self, lat, lon, h_ell, h_msl, y, vn, ve, vd,
                             eph, epv, t):
        pvt = _pvt(lat, lon, h_ell, h_msl, y, vn, ve, vd, eph, epv, t)
        frame = frame_nav_pvt(pvt)
        assert frame[:2] == b"\xb5\x62"
        assert frame[2:4] == b"\x01\x07"  # NAV-PVT class/id
        (length,) = struct.unpack_from("<H", frame, 4)
        assert length == 92 and len(frame) == 6 + 92 + 2
        ck_a = ck_b = 0
        for byte in frame[2:-2]:
            ck_a = (ck_a + byte) & 0xFF
            ck_b = (ck_b + ck_a) & 0xFF
        assert frame[-2:] == bytes((ck_a, ck_b))

    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(lat_e7, lon_e7, alt_m, alt_m, yaw, vel, vel, vel, acc, acc,
           ts_us)
    def test_payload_roundtrips_position(self, lat, lon, h_ell, h_msl, y,
                                         vn, ve, vd, eph, epv, t):
        pvt = _pvt(lat, lon, h_ell, h_msl, y, vn, ve, vd, eph, epv, t)
        frame = frame_nav_pvt(pvt)
        payload = frame[6:-2]
        got_lon, got_lat = struct.unpack_from("<ll", payload, 24)
        got_h, got_msl = struct.unpack_from("<ll", payload, 32)
        assert got_lat == lat and got_lon == lon
        assert abs(got_h - h_ell * 1e3) <= 1  # mm, rounded
        assert abs(got_msl - h_msl * 1e3) <= 1
        vel_n, vel_e, vel_d = struct.unpack_from("<lll", payload, 48)
        assert abs(vel_n - vn * 1e3) <= 1 and abs(vel_e - ve * 1e3) <= 1
        assert abs(vel_d - vd * 1e3) <= 1

    @settings(max_examples=MAX_EXAMPLES, deadline=None)
    @given(st.floats(315964800, 4e9, **finite))
    def test_gps_time_inverse(self, unix_s):
        week, tow = unix_to_gps_time(unix_s)
        assert 0 <= tow < 604800 and week >= 0
        assert abs((week * 604800 + tow) + 315964800 - unix_s) < 1e-5
