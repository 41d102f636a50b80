#!/bin/bash
# PX4 SITL entrypoint for the gisnav_tpu constellation.
#
# Responsibilities (the simulation-side half of the reference's
# docker/px4/entrypoint.sh, re-plumbed for this framework):
#   1. a TCP->pty GPS bridge: `gisnav_tpu serial --tcp px4:${GPS_BRIDGE_PORT}`
#      connects here and its NMEA bytes appear on /tmp/gisnav-gps, where the
#      PX4 GPS driver (px4-rc.simulator) reads them
#   2. point the uXRCE-DDS client at the micro-ros-agent container
#   3. route MAVLink to QGC / MAVROS on the companion
set -e

GPS_BRIDGE_PORT="${GPS_BRIDGE_PORT:-15000}"
UXRCE_DDS_HOST="${UXRCE_DDS_HOST:-micro-ros-agent}"
UXRCE_DDS_PORT="${UXRCE_DDS_PORT:-8888}"

# raw pty: byte transparency end to end (NMEA needs its CRLF, UBX is binary)
socat "tcp-listen:${GPS_BRIDGE_PORT},reuseaddr,fork" \
      "pty,raw,echo=0,link=/tmp/gisnav-gps" &
echo "GPS bridge listening on :${GPS_BRIDGE_PORT} -> /tmp/gisnav-gps"

# PX4 reads the agent address from env at rcS time (UXRCE_DDS_AG_IP wants a
# little-endian int; resolve the container name first)
AGENT_IP=$(getent hosts "${UXRCE_DDS_HOST}" | awk '{print $1}')
if [ -n "${AGENT_IP}" ]; then
    export UXRCE_DDS_AG_IP=$(python3 - "$AGENT_IP" <<'EOF'
import ipaddress, sys
print(int.from_bytes(ipaddress.ip_address(sys.argv[1]).packed, "big"))
EOF
)
    export UXRCE_DDS_PRT="${UXRCE_DDS_PORT}"
    echo "uXRCE-DDS agent: ${AGENT_IP}:${UXRCE_DDS_PORT} (int ${UXRCE_DDS_AG_IP})"
fi

# headless gazebo unless a display was passed through
if [ -z "${DISPLAY:-}" ]; then
    export HEADLESS=1
fi

exec "$@"
