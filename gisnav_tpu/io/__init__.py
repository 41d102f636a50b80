"""Mock-GPS output encoders: NMEA sentences, u-blox NavPVT, PX4 uORB SensorGps.

Pure functions (no ROS, no serial) so every encoder is unit-testable; the
node layer attaches transports.
"""
from gisnav_tpu.io.nmea import (  # noqa: F401
    decimal_to_nmea,
    make_gga,
    make_gsa,
    make_gst,
    make_gsv,
    make_hdt,
    make_rmc,
    make_vtg,
    make_zda,
    nmea_checksum,
    render_sentence,
    sentences_for_fix,
)
from gisnav_tpu.io.ubx import make_nav_pvt, unix_to_gps_time  # noqa: F401
from gisnav_tpu.io.uorb import SENSOR_GPS_DEVICE_ID, make_sensor_gps  # noqa: F401
