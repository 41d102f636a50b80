"""Node-graph transport: in-process bus + C++ shared-memory bus bindings.

Two interchangeable transports behind one ``publish/subscribe`` interface:

- :class:`LocalBus` — in-process dispatch (function calls), used when the
  whole graph runs in one process (the common TPU deployment: one process
  owns the device).
- :class:`ShmBus` — multi-process transport over the C++ seqlock ring bus
  (``native/shmbus.cpp``), the framework's replacement for the reference's
  Fast-DDS-over-/dev/shm transport (``docker-compose.ros.yaml:14-21`` in
  hmakelin/gisnav). The library is compiled on demand with the system g++.

Payloads are pickled Python objects (dicts of numpy arrays on the wire, like
the reference's ROS messages); topics follow ``gisnav_tpu.constants``.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pickle
import subprocess
import threading
import time
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

__all__ = ["LocalBus", "ShmBus", "build_native_lib"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def build_native_lib(name: str = "libshmbus.so") -> str:
    """Compile (once) and return the path of the native bus library."""
    lib = os.path.abspath(os.path.join(_NATIVE_DIR, name))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "shmbus.cpp"))
    if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        subprocess.run(
            ["make", "-C", os.path.dirname(lib)],
            check=True,
            capture_output=True,
        )
    return lib


class LocalBus:
    """In-process topic dispatch (synchronous by default).

    ``publish`` invokes subscribers inline; with ``async_dispatch=True`` each
    subscriber gets its own worker thread + queue (a MultiThreadedExecutor
    equivalent for slow consumers; the reference needs one so heavy matching
    does not starve its tf listener, ``__init__.py:140-158``).
    """

    def __init__(self, async_dispatch: bool = False):
        self._subs: Dict[str, List[Callable[[Any], None]]] = defaultdict(list)
        self._async = async_dispatch
        self._queues: Dict[int, List] = {}
        self._lock = threading.Lock()
        self._workers: List = []  # (queue, thread) pairs, async mode

    def subscribe(self, topic: str, callback: Callable[[Any], None]) -> None:
        with self._lock:
            if self._async:
                import queue

                q: "queue.Queue" = queue.Queue(maxsize=4)
                started = [False]

                def worker():
                    while True:
                        item = q.get()
                        if item is _STOP:
                            return
                        try:
                            callback(item)
                        except Exception:  # noqa: BLE001 — fail soft per node
                            import traceback

                            traceback.print_exc()

                def enqueue(msg, q=q):
                    # lazy worker start: a graph that is built but never
                    # driven (construction tests, dry runs) spawns no
                    # threads — unclosed built-only apps used to leak one
                    # idle worker per subscription
                    if not started[0]:
                        with self._lock:
                            if not started[0]:
                                t = threading.Thread(target=worker,
                                                     daemon=True)
                                t.start()
                                self._workers.append((q, t))
                                started[0] = True
                    try:
                        q.put_nowait(msg)
                    except Exception:
                        pass  # drop when consumer is behind (sensor QoS)

                self._subs[topic].append(enqueue)
            else:
                self._subs[topic].append(callback)

    def publish(self, topic: str, message: Any) -> None:
        for cb in list(self._subs.get(topic, ())):
            cb(message)

    def close(self, timeout_s: float = 2.0) -> None:
        """Stop async worker threads (must not be mid-handler at
        interpreter teardown: a daemon thread inside a jitted call while
        the runtime unloads aborts the process)."""
        with self._lock:
            workers, self._workers = self._workers, []
            self._subs.clear()
        for q, _ in workers:
            try:
                q.put(_STOP, timeout=timeout_s)
            except Exception:  # noqa: BLE001 — full queue + stuck worker
                pass
        for _, t in workers:
            t.join(timeout=timeout_s)


_STOP = object()


class _NativeLib:
    _instance: Optional[ctypes.CDLL] = None

    @classmethod
    def get(cls) -> ctypes.CDLL:
        if cls._instance is None:
            lib = ctypes.CDLL(build_native_lib())
            lib.shmbus_create.restype = ctypes.c_void_p
            lib.shmbus_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                          ctypes.c_uint64]
            lib.shmbus_open.restype = ctypes.c_void_p
            lib.shmbus_open.argtypes = [ctypes.c_char_p]
            lib.shmbus_publish.restype = ctypes.c_uint64
            lib.shmbus_publish.argtypes = [ctypes.c_void_p,
                                           ctypes.c_char_p, ctypes.c_uint64]
            lib.shmbus_head.restype = ctypes.c_uint64
            lib.shmbus_head.argtypes = [ctypes.c_void_p]
            lib.shmbus_read.restype = ctypes.c_uint64
            lib.shmbus_read.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.shmbus_slot_size.restype = ctypes.c_uint64
            lib.shmbus_slot_size.argtypes = [ctypes.c_void_p]
            lib.shmbus_writer_acquire.restype = ctypes.c_int
            lib.shmbus_writer_acquire.argtypes = [ctypes.c_void_p]
            lib.shmbus_writer_release.argtypes = [ctypes.c_void_p]
            lib.shmbus_close.argtypes = [ctypes.c_void_p]
            lib.shmbus_unlink.argtypes = [ctypes.c_char_p]
            lib.shmbus_unlink.restype = ctypes.c_int
            cls._instance = lib
        return cls._instance


def _segment_name(namespace: str, topic: str) -> bytes:
    digest = hashlib.sha1(f"{namespace}{topic}".encode()).hexdigest()[:16]
    return f"/gisnav_{digest}".encode()


class ShmBus:
    """Multi-process pub/sub over the native shared-memory ring bus.

    :param namespace: isolates topic segments between graphs/tests
    :param slots: ring depth per topic (latest-wins beyond this)
    :param slot_size: max serialized message size per topic
    """

    def __init__(self, namespace: str = "gisnav", slots: int = 8,
                 slot_size: int = 32 * 1024 * 1024,
                 poll_interval_s: float = 0.0005):
        self._lib = _NativeLib.get()
        self._namespace = namespace
        self._slots = slots
        self._slot_size = slot_size
        self._poll = poll_interval_s
        self._handles: Dict[str, int] = {}
        self._created: List[bytes] = []
        self._readers: List[threading.Thread] = []
        self._stop = threading.Event()

    def _handle(self, topic: str) -> int:
        if topic not in self._handles:
            name = _segment_name(self._namespace, topic)
            h = self._lib.shmbus_create(name, self._slots, self._slot_size)
            if not h:
                raise OSError(f"shmbus_create failed for {topic}")
            self._handles[topic] = h
            self._created.append(name)
        return self._handles[topic]

    def publish(self, topic: str, message: Any) -> None:
        payload = pickle.dumps(message, protocol=pickle.HIGHEST_PROTOCOL)
        if len(payload) > self._slot_size:
            raise ValueError(
                f"message of {len(payload)} bytes exceeds slot size "
                f"{self._slot_size} on {topic}"
            )
        seq = self._lib.shmbus_publish(self._handle(topic), payload,
                                       len(payload))
        if seq == 0:
            raise OSError(f"shmbus_publish failed on {topic}")

    def subscribe(self, topic: str, callback: Callable[[Any], None]) -> None:
        handle = self._handle(topic)
        buf = (ctypes.c_uint8 * self._slot_size)()
        stamp = ctypes.c_uint64()

        def reader():
            seq = self._lib.shmbus_head(handle)  # start from now
            backoff = self._poll
            while not self._stop.is_set():
                n = self._lib.shmbus_read(handle, seq, buf, self._slot_size,
                                          ctypes.byref(stamp))
                if n == 0:
                    time.sleep(backoff)
                    backoff = min(backoff * 2, 0.01)
                    continue
                backoff = self._poll
                if n == ctypes.c_uint64(-1).value:  # fell behind: skip ahead
                    seq = self._lib.shmbus_head(handle)
                    continue
                try:
                    callback(pickle.loads(bytes(buf[:n])))
                except Exception:  # noqa: BLE001 — fail soft per node
                    import traceback

                    traceback.print_exc()
                seq += 1

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        self._readers.append(t)

    def close(self, unlink: bool = False) -> None:
        self._stop.set()
        for t in self._readers:
            t.join(timeout=1.0)
        for topic, h in self._handles.items():
            self._lib.shmbus_close(h)
        if unlink:
            for name in self._created:
                self._lib.shmbus_unlink(name)
        self._handles.clear()
