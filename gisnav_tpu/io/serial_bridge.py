"""Serial (pty) bridge: mock-GPS bus messages -> autopilot GPS port bytes.

The reference feeds its NMEA/UBX mock-GPS output to the autopilot through
an external socat bridge (``docker/docker-compose*.yaml`` socat services in
hmakelin/gisnav). This module replaces that hop: it opens a pseudo-terminal,
optionally symlinks it to a stable path, and writes each published fix as
wire bytes — point the autopilot's serial GPS driver (``GPS_1_CONFIG`` /
``SERIALx_PROTOCOL`` / ``GPS_TYPE``) at the link.

Usage (CLI)::

    python -m gisnav_tpu serial --protocol nmea --link /tmp/gisnav-gps
"""
from __future__ import annotations

import os
import tty
from typing import Optional

from gisnav_tpu.io.ubx import frame_nav_pvt

__all__ = ["SerialBridge"]


class SerialBridge:
    """Subscribe a mock-GPS topic and write wire bytes to a pty.

    :param bus: the bus the node graph publishes on (LocalBus or ShmBus)
    :param protocol: "nmea" (sentences + CRLF) or "ubx" (framed NAV-PVT)
    :param link: optional stable symlink path for the pty slave
    """

    def __init__(self, bus, protocol: str = "nmea",
                 link: Optional[str] = None):
        if protocol not in ("nmea", "ubx"):
            raise ValueError(f"unsupported serial protocol {protocol!r}")
        from gisnav_tpu.nodes.mock_gps import (
            TOPIC_NAV_PVT,
            TOPIC_NMEA_SENTENCE,
        )

        self.protocol = protocol
        self._master, self._slave = os.openpty()
        # The bridge must be byte-transparent like the socat hop it replaces
        # (reference docker/nmea/entrypoint.sh): raw mode on BOTH ends, or the
        # slave's canonical line discipline mangles NMEA CRLF (ICRNL) and
        # buffers binary UBX frames until a stray newline arrives.
        tty.setraw(self._master)
        tty.setraw(self._slave)
        self.slave_path = os.ttyname(self._slave)
        self.link = link
        if link:
            if os.path.islink(link) or os.path.exists(link):
                os.unlink(link)
            os.symlink(self.slave_path, link)
        self.bytes_written = 0
        topic = TOPIC_NMEA_SENTENCE if protocol == "nmea" else TOPIC_NAV_PVT
        bus.subscribe(topic, self._on_message)

    def _on_message(self, msg) -> None:
        if self.protocol == "nmea":
            data = (msg["sentence"] + "\r\n").encode("ascii")
        else:
            data = frame_nav_pvt(msg)
        try:
            os.write(self._master, data)
            self.bytes_written += len(data)
        except OSError:  # reader gone; keep running (fail-soft)
            pass

    def close(self) -> None:
        if self.link and os.path.islink(self.link):
            os.unlink(self.link)
        os.close(self._master)
        os.close(self._slave)
