"""u-blox NavPVT message construction (as a plain dict).

Field-for-field parity with the reference's UBXNode
(``extensions/ubx_node.py:53-161`` in hmakelin/gisnav), including the GPS
time-of-week conversion.
"""
from __future__ import annotations

import time as _time
from typing import Dict, Tuple

import numpy as np

__all__ = ["unix_to_gps_time", "make_nav_pvt"]

_GPS_EPOCH_UNIX = 315964800  # 1980-01-06 00:00:00 UTC
_SECONDS_PER_WEEK = 604800


def unix_to_gps_time(unix_time_s: float) -> Tuple[int, float]:
    """POSIX seconds -> (GPS week number, time of week seconds).

    Reference semantics (``ubx_node.py:145-150``): no leap-second offset
    applied (mock GPS only).
    """
    gps_time = unix_time_s - _GPS_EPOCH_UNIX
    return int(gps_time / _SECONDS_PER_WEEK), gps_time % _SECONDS_PER_WEEK


def make_nav_pvt(
    lat: int,
    lon: int,
    altitude_ellipsoid: float,
    altitude_amsl: float,
    yaw_degrees: float,
    h_variance_rad: float,
    vel_n_m_s: float,
    vel_e_m_s: float,
    vel_d_m_s: float,
    cog: float,
    s_variance_m_s: float,
    timestamp: int,
    eph: float,
    epv: float,
    satellites_visible: int,
    **_ignored,
) -> Dict:
    """Build a NavPVT message dict from a mock-GPS fix.

    :param lat, lon: degrees * 1e7 (int)
    :param timestamp: microseconds
    :param cog: course over ground, radians
    """
    _, time_of_week = unix_to_gps_time(timestamp / 1e6)
    utc = _time.gmtime(timestamp / 1e6)
    return {
        "i_tow": int(time_of_week * 1000),
        "year": utc.tm_year,
        "month": utc.tm_mon,
        "day": utc.tm_mday,
        "hour": utc.tm_hour,
        "min": utc.tm_min,
        "sec": utc.tm_sec,
        "valid": 0x01 | 0x02 | 0x04,  # date + time + fully resolved
        "t_acc": 50000000,  # ns
        "nano": 0,
        "fix_type": 3,
        "flags": 0x01,  # gnssFixOK
        "flags2": 0,
        "num_sv": int(satellites_visible),
        "lon": int(lon),
        "lat": int(lat),
        "height": int(altitude_ellipsoid * 1e3),  # mm above ellipsoid
        "h_msl": int(altitude_amsl * 1e3),  # mm above MSL
        "h_acc": int(eph * 1e3),  # mm
        "v_acc": int(epv * 1e3),  # mm
        "vel_n": int(vel_n_m_s * 1e3),  # mm/s
        "vel_e": int(vel_e_m_s * 1e3),
        "vel_d": int(vel_d_m_s * 1e3),
        "g_speed": int(float(np.hypot(vel_n_m_s, vel_e_m_s)) * 1e3),
        "heading": int(float(np.degrees(cog)) * 1e5),  # deg * 1e-5
        "s_acc": int(s_variance_m_s * 1e3),  # mm/s
        "head_acc": int(float(np.degrees(h_variance_rad)) * 1e5),
        "p_dop": 0,
        "head_veh": int(yaw_degrees * 1e5),
    }
