"""Tests for the transform graph and both bus transports."""
import time

import numpy as np
import pytest

from gisnav_tpu.geometry.quaternion import euler_to_quat, quat_to_matrix
from gisnav_tpu.geometry.se3 import compose, invert, make_transform
from gisnav_tpu.nodes.bus import LocalBus, ShmBus
from gisnav_tpu.nodes.tf import TransformGraph, TransformLookupError


def _h(yaw=0.0, t=(0, 0, 0)):
    return make_transform(quat_to_matrix(euler_to_quat(0, 0, yaw)), np.array(t))


class TestTransformGraph:
    def test_single_edge_both_directions(self):
        g = TransformGraph()
        h = _h(yaw=0.5, t=(1, 2, 3))
        g.add("map", "base", h, static=True)
        # child point at origin lands at the translation in parent frame
        got = g.lookup("map", "base")
        assert np.allclose(got, h)
        back = g.lookup("base", "map")
        assert np.allclose(back, invert(h))

    def test_chain_composition(self):
        g = TransformGraph()
        h1 = _h(yaw=0.3, t=(1, 0, 0))  # odom -> map... (map<-odom)
        h2 = _h(yaw=-0.1, t=(0, 2, 0))  # base -> odom
        g.add("map", "odom", h1, static=True)
        g.add("odom", "base", h2, static=True)
        got = g.lookup("map", "base")
        assert np.allclose(got, compose(h1, h2))
        got = g.lookup("base", "map")
        assert np.allclose(got, invert(compose(h1, h2)))

    def test_time_interpolation(self):
        g = TransformGraph()
        g.add("map", "base", _h(t=(0, 0, 0)), stamp_us=1_000_000)
        g.add("map", "base", _h(t=(10, 0, 0)), stamp_us=2_000_000)
        mid = g.lookup("map", "base", stamp_us=1_500_000)
        assert np.allclose(mid[:3, 3], [5, 0, 0])
        q1 = g.lookup("map", "base", stamp_us=1_250_000)
        assert np.allclose(q1[:3, 3], [2.5, 0, 0])

    def test_extrapolation_clamps_to_latest(self):
        g = TransformGraph()
        g.add("map", "base", _h(t=(1, 0, 0)), stamp_us=1_000_000)
        g.add("map", "base", _h(t=(2, 0, 0)), stamp_us=2_000_000)
        # far future -> latest (reference fallback semantics)
        late = g.lookup("map", "base", stamp_us=99_000_000)
        assert np.allclose(late[:3, 3], [2, 0, 0])
        early = g.lookup("map", "base", stamp_us=0)
        assert np.allclose(early[:3, 3], [1, 0, 0])

    def test_missing_path_raises(self):
        g = TransformGraph()
        g.add("map", "odom", np.eye(4), static=True)
        with pytest.raises(TransformLookupError):
            g.lookup("map", "unknown")
        assert not g.can_transform("map", "unknown")
        assert g.can_transform("odom", "map")

    def test_branching_tree(self):
        # map -> odom -> base; base -> camera; base -> gimbal
        g = TransformGraph()
        g.add("map", "odom", _h(t=(5, 0, 0)), static=True)
        g.add("odom", "base", _h(t=(0, 5, 0)), static=True)
        g.add("base", "camera", _h(t=(0, 0, 1)), static=True)
        g.add("base", "gimbal", _h(t=(0, 0, -1)), static=True)
        got = g.lookup("map", "camera")
        assert np.allclose(got[:3, 3], [5, 5, 1])
        got = g.lookup("gimbal", "camera")
        assert np.allclose(got[:3, 3], [0, 0, 2])


class TestLocalBus:
    def test_sync_dispatch(self):
        bus = LocalBus()
        got = []
        bus.subscribe("/t", got.append)
        bus.publish("/t", {"x": 1})
        assert got == [{"x": 1}]

    def test_async_dispatch_drops_when_full(self):
        bus = LocalBus(async_dispatch=True)
        seen = []

        def slow(msg):
            time.sleep(0.02)
            seen.append(msg)

        bus.subscribe("/t", slow)
        for i in range(50):
            bus.publish("/t", i)
        time.sleep(0.5)
        assert 0 < len(seen) < 50  # consumed some, dropped the burst


class TestShmBus:
    def test_roundtrip_numpy_payload(self):
        bus = ShmBus(namespace=f"t{time.time_ns()}", slot_size=1 << 20)
        got = []
        bus.subscribe("/gisnav/x", got.append)
        time.sleep(0.05)
        arr = np.arange(1000, dtype=np.float32)
        for i in range(3):
            bus.publish("/gisnav/x", {"i": i, "arr": arr * i})
        deadline = time.time() + 2
        while len(got) < 3 and time.time() < deadline:
            time.sleep(0.01)
        bus.close(unlink=True)
        assert len(got) == 3
        assert np.allclose(got[2]["arr"], arr * 2)

    def test_cross_handle_delivery(self):
        # writer and reader on separate bus objects (same shm segments)
        ns = f"t{time.time_ns()}"
        writer = ShmBus(namespace=ns, slot_size=1 << 16)
        reader = ShmBus(namespace=ns, slot_size=1 << 16)
        got = []
        reader.subscribe("/y", got.append)
        time.sleep(0.05)
        writer.publish("/y", "hello")
        deadline = time.time() + 2
        while not got and time.time() < deadline:
            time.sleep(0.01)
        writer.close()
        reader.close(unlink=True)
        assert got == ["hello"]

    def test_oversize_message_raises(self):
        bus = ShmBus(namespace=f"t{time.time_ns()}", slot_size=128)
        with pytest.raises(ValueError):
            bus.publish("/z", np.zeros(1000))
        bus.close(unlink=True)
