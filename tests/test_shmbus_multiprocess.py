"""Multi-process stress tests for the native shm ring bus.

Round-1 hardening (VERDICT weak item 8): concurrent ``shmbus_create`` on a
fresh segment must initialize exactly once (O_CREAT|O_EXCL + magic
publication), and the single-writer-per-topic contract is enforced by a pid
CAS lock with dead-writer takeover.
"""
import ctypes
import multiprocessing as mp
import os
import time

import numpy as np

from gisnav_tpu.nodes.bus import ShmBus, _NativeLib, _segment_name


def _lib():
    return _NativeLib.get()


def _racer(ns, results, idx, n_msgs, barrier):
    """Create the segment and try to publish a burst; report successes.

    All racers stay alive until everyone has finished publishing (the
    dead-writer takeover is legitimate and tested separately)."""
    lib = _lib()
    name = _segment_name(ns, "/race")
    h = lib.shmbus_create(name, 8, 4096)
    assert h
    barrier.wait(timeout=20)  # everyone mapped before anyone publishes
    ok = 0
    for i in range(n_msgs):
        payload = bytes([idx]) * 100
        if lib.shmbus_publish(h, payload, len(payload)) != 0:
            ok += 1
    barrier.wait(timeout=20)  # stay alive until all racers finished
    lib.shmbus_close(h)
    results.put((idx, ok))


class TestShmBusMultiProcess:
    def test_concurrent_create_single_writer(self):
        """4 processes race to create + publish: init happens exactly once
        and only ONE process wins the writer lock."""
        ns = f"race{time.time_ns()}"
        results = mp.Queue()
        barrier = mp.Barrier(4)
        procs = [
            mp.Process(target=_racer, args=(ns, results, i, 50, barrier))
            for i in range(4)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=20)
            assert p.exitcode == 0
        counts = dict(results.get(timeout=5) for _ in range(4))
        winners = [i for i, ok in counts.items() if ok > 0]
        assert len(winners) == 1, counts
        assert counts[winners[0]] == 50

        # the parent (another process) can read every surviving message and
        # each payload is uncorrupted (single value pattern of the winner)
        lib = _lib()
        name = _segment_name(ns, "/race")
        h = lib.shmbus_open(name)
        assert h
        head = lib.shmbus_head(h)
        assert head == 50
        buf = (ctypes.c_uint8 * 4096)()
        stamp = ctypes.c_uint64()
        for seq in range(head - 8, head):  # ring keeps the last 8
            n = lib.shmbus_read(h, seq, buf, 4096, ctypes.byref(stamp))
            assert n == 100
            data = bytes(buf[:100])
            assert data == bytes([winners[0]]) * 100
        lib.shmbus_close(h)
        lib.shmbus_unlink(name)

    def test_dead_writer_takeover(self):
        """A new process may claim the writer lock after the holder dies."""
        ns = f"dead{time.time_ns()}"
        name = _segment_name(ns, "/t")

        def hold_and_exit():
            lib = _lib()
            h = lib.shmbus_create(name, 8, 1024)
            assert lib.shmbus_publish(h, b"x" * 8, 8) != 0
            os._exit(0)  # die without releasing

        p = mp.Process(target=hold_and_exit)
        p.start()
        p.join(timeout=10)
        assert p.exitcode == 0

        lib = _lib()
        h = lib.shmbus_create(name, 8, 1024)
        assert lib.shmbus_publish(h, b"y" * 8, 8) != 0  # takeover
        lib.shmbus_close(h)
        lib.shmbus_unlink(name)

    def test_cross_process_stream_integrity(self):
        """A child streams checksummed messages; the parent subscriber
        receives an in-order, uncorrupted suffix (latest-wins QoS)."""
        ns = f"stream{time.time_ns()}"

        def writer():
            bus = ShmBus(namespace=ns, slot_size=1 << 16)
            for i in range(300):
                arr = np.full(512, i, np.int64)
                bus.publish("/s", {"i": i, "arr": arr})
                time.sleep(0.001)
            bus.close()

        got = []
        reader = ShmBus(namespace=ns, slot_size=1 << 16)
        reader.subscribe("/s", got.append)
        time.sleep(0.05)
        p = mp.Process(target=writer)
        p.start()
        p.join(timeout=30)
        assert p.exitcode == 0
        deadline = time.time() + 3
        while time.time() < deadline and (
            not got or got[-1]["i"] != 299
        ):
            time.sleep(0.01)
        reader.close(unlink=True)
        assert got, "no messages received"
        seqs = [m["i"] for m in got]
        assert seqs == sorted(seqs)  # in order (drops allowed)
        assert seqs[-1] == 299
        for m in got:
            assert (m["arr"] == m["i"]).all()  # payload integrity
