"""Cross-process deployment: the real CLI `serial` process consuming the
graph's mock-GPS output over the shared-memory bus.

This is the production split topology (perception process owning the TPU +
a separate serial-bridge process owning the autopilot port; docs/deploy.md):
process A publishes on ShmBus, process B is an actual
``python -m gisnav_tpu serial`` subprocess, and the bytes are read back off
the pty it creates. The reference achieves the same split with one container
per ROS node + socat (SURVEY.md L1).
"""
import os
import select
import subprocess
import sys
import time

import pytest

from gisnav_tpu.nodes.bus import ShmBus
from gisnav_tpu.nodes.mock_gps import TOPIC_NMEA_SENTENCE

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


class TestSerialProcessOverShmBus:
    def test_nmea_bytes_cross_process_boundary(self, tmp_path):
        ns = f"t{os.getpid()}"
        link = str(tmp_path / "gps")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, "-m", "gisnav_tpu", "serial",
             "--protocol", "nmea", "--link", link, "--namespace", ns],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=REPO, env=env)
        bus = None
        try:
            # wait for the bridge to come up (prints one status line)
            line = proc.stdout.readline()
            assert "serial bridge up" in line, line
            assert os.path.islink(link)

            bus = ShmBus(namespace=ns)
            fd = os.open(os.path.realpath(link),
                         os.O_RDONLY | os.O_NONBLOCK)
            try:
                # the subscriber thread in the other process polls the ring;
                # publish until the first byte lands, then read the payload
                deadline = time.monotonic() + 20.0
                sentence = "$GPGGA,xproc*00"
                data = b""
                while time.monotonic() < deadline and b"\r\n" not in data:
                    bus.publish(TOPIC_NMEA_SENTENCE,
                                {"stamp_us": 1, "sentence": sentence})
                    r, _, _ = select.select([fd], [], [], 0.25)
                    if r:
                        data += os.read(fd, 4096)
                assert b"$GPGGA,xproc*00\r\n" in data, data
            finally:
                os.close(fd)
        finally:
            proc.terminate()
            proc.wait(timeout=10)
            if bus is not None:
                bus.close()


class TestHealthProbeOverShmBus:
    def test_health_cli_sees_heartbeat(self, tmp_path):
        """`gisnav_tpu health` (a separate process) must observe heartbeats
        published on the shm bus and exit 0 — the compose healthcheck path."""
        ns = f"h{os.getpid()}"
        bus = ShmBus(namespace=ns)
        try:
            stop = False

            def beat():
                while not stop:
                    bus.publish("/gisnav/health",
                                {"pose_node": {"idle_s": 0.1,
                                               "healthy": True}})
                    time.sleep(0.5)

            import threading

            t = threading.Thread(target=beat, daemon=True)
            t.start()
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            proc = subprocess.run(
                [sys.executable, "-m", "gisnav_tpu", "health",
                 "--namespace", ns, "--timeout", "10", "--strict"],
                capture_output=True, text=True, cwd=REPO, env=env,
                timeout=60)
            stop = True
            assert proc.returncode == 0, (proc.stdout, proc.stderr)
            assert "healthy" in proc.stdout
        finally:
            bus.close()

    def test_health_cli_fails_without_heartbeat(self):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, "-m", "gisnav_tpu", "health",
             "--namespace", f"none{os.getpid()}", "--timeout", "2"],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=60)
        assert proc.returncode == 1
        assert "UNHEALTHY" in proc.stdout
