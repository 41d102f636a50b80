"""Profiling: per-stage wall timers + jax device profiler hooks.

The reference wraps every node's spin in cProfile and dumps the top-20
cumulative stats at shutdown (``ros/gisnav/gisnav/__init__.py:126-170`` in
hmakelin/gisnav). Here the same habit is split into:

- :class:`StageTimer` — cheap named wall-clock sections with summary stats
  (the node base class uses the same pattern for bus handlers);
- :func:`device_profile` — a context manager around ``jax.profiler.trace``
  producing a TensorBoard-loadable device trace for kernel-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

__all__ = ["StageTimer", "device_profile"]


class StageTimer:
    """Accumulates wall time per named stage.

    Usage::

        timer = StageTimer()
        with timer("extract"):
            ...
        print(timer.summary())

    For device work, wrap the ``block_until_ready`` call — async dispatch
    makes un-synchronized timings meaningless.
    """

    def __init__(self):
        self._acc: Dict[str, list] = defaultdict(lambda: [0, 0.0, 0.0])

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = self._acc[stage]
            rec[0] += 1
            rec[1] += dt
            rec[2] = max(rec[2], dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "calls": calls,
                "total_s": round(total, 4),
                "mean_ms": round(total / calls * 1e3, 3) if calls else 0.0,
                "max_ms": round(mx * 1e3, 3),
            }
            for name, (calls, total, mx) in sorted(
                self._acc.items(), key=lambda kv: -kv[1][1]
            )
        }

    def report(self, top: int = 20) -> str:
        lines = [f"{'stage':<28}{'calls':>8}{'total s':>10}{'mean ms':>10}"
                 f"{'max ms':>10}"]
        for name, s in list(self.summary().items())[:top]:
            lines.append(
                f"{name:<28}{s['calls']:>8}{s['total_s']:>10.3f}"
                f"{s['mean_ms']:>10.2f}{s['max_ms']:>10.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_profile(logdir: str) -> Iterator[None]:
    """Capture a jax device trace (open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
