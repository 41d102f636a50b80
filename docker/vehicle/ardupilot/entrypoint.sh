#!/bin/bash
# ArduPilot SITL entrypoint: same TCP->pty GPS bridge as the px4 service,
# plus the SITL parameters that point the second GPS at it.
#   GPS_TYPE2=5 (NMEA), SERIAL4 is SITL's uartE mapped to the pty.
set -e

GPS_BRIDGE_PORT="${GPS_BRIDGE_PORT:-15000}"

socat "tcp-listen:${GPS_BRIDGE_PORT},reuseaddr,fork" \
      "pty,raw,echo=0,link=/tmp/gisnav-gps" &
echo "GPS bridge listening on :${GPS_BRIDGE_PORT} -> /tmp/gisnav-gps"

cat > /tmp/gisnav.parm <<'EOF'
GPS_TYPE2 5
SERIAL4_PROTOCOL 5
SERIAL4_BAUD 9
EOF

exec "$@" --add-param-file /tmp/gisnav.parm \
    -A "--serial4=uart:/tmp/gisnav-gps"
