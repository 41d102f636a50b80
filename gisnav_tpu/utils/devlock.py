"""Process-wide JAX dispatch lock for the multi-threaded node graph.

JAX's tracing/lowering caches are not safe under concurrent FIRST-TOUCH
from multiple Python threads: with the twist worker eagerly lowering its
RANSAC ``lax.scan`` while the pose worker compiled the deep pipeline in the
same process, ``mlir._lower_jaxpr_to_fun_cached`` raised
``KeyError('closed_call', ...)`` (a torn read of ``cached_primitive_
lowerings``), and the matching in-suite failure mode produced non-finite
geoposes on every frame — both reproduced in the CLI e2e test on a 1-core
host (round 5).

Every node handler that dispatches JAX work acquires :data:`device_lock`.
Executions of already-compiled programs are thread-safe, but serializing
them here costs nothing in practice: a single accelerator serializes device
programs anyway, and the host stages that benefit from thread parallelism
(SIFT extraction, rendering, IO) stay outside the lock.

The reference runs each node in its own PROCESS (ROS 2 executors), so it
never shares a CUDA context across threads; this lock is the equivalent
boundary for the single-process TPU graph.
"""
from __future__ import annotations

import threading

__all__ = ["device_lock"]

#: Reentrant: a locked handler may call helpers that also take the lock.
device_lock = threading.RLock()
