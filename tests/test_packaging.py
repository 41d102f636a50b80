"""Debian packaging build check (reference role: debian/gisnav .deb)."""
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("dpkg-deb") is None,
                    reason="dpkg-deb not available")
def test_build_deb(tmp_path):
    out = subprocess.run(
        [os.path.join(ROOT, "tools", "build_deb.sh"), str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    debs = list(tmp_path.glob("gisnav-tpu_*_all.deb"))
    assert len(debs) == 1
    contents = subprocess.run(
        ["dpkg-deb", "--contents", str(debs[0])],
        capture_output=True, text=True,
    ).stdout
    for needle in (
        "/usr/bin/gisnav-tpu",
        "/usr/lib/python3/dist-packages/gisnav_tpu/cli.py",
        "/usr/share/gisnav-tpu/weights/",
        "/etc/systemd/system/",
        "/usr/share/doc/gisnav-tpu/docs/",
    ):
        assert needle in contents, needle
