"""Persistent-compilation-cache location, keyed by host CPU identity.

XLA:CPU persists AOT-compiled executables; loading one that was compiled on
a host with different CPU features aborts the process (observed as
``cpu_aot_loader.cc`` feature-mismatch errors followed by SIGILL-class
crashes after a VM migration). Keying the cache directory by the host's
feature set makes a migration start a fresh cache instead of crashing
every jitted program.
"""
from __future__ import annotations

import hashlib
import os

__all__ = ["cache_dir", "enable_persistent_cache"]


def _host_key() -> str:
    # Hash the flags line AND the model identity: XLA:CPU bakes
    # model-dependent LLVM *tuning* flags (e.g. +prefer-no-scatter /
    # +prefer-no-gather on AVX512 parts with slow gathers) into its AOT
    # target, so two hosts with IDENTICAL cpuinfo flags but different
    # models produce mutually unloadable cache entries (observed: the
    # loader rejects "+prefer-no-scatter is not supported on the host
    # machine", then crashes at teardown).
    try:
        ident = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name", "model\t",
                                    "cpu family", "stepping")):
                    ident.append(line)
                if line.startswith("power management"):
                    break  # one processor block is enough
        if ident:
            return hashlib.sha256(
                "".join(sorted(set(ident))).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(
        (platform.machine() + platform.processor()).encode()
    ).hexdigest()[:12]


def cache_dir() -> str:
    return f"/tmp/gisnav_tpu_jit_cache_{_host_key()}"


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point jax at the per-host cache; returns the directory used.

    Returns ``None`` — cache left DISABLED — on the CPU backend: XLA:CPU AOT
    cache entries are not reliably reloadable on this host class. Two
    distinct failure modes were isolated from nondeterministic cold-suite
    SIGSEGV/SIGABRT crashes (round 5):

    1. XLA bakes model-tuning pseudo-features into the AOT target
       (``+prefer-no-scatter``/``+prefer-no-gather`` on AVX512 parts with
       slow gathers) that the loader's host probe never reports, so entries
       written BY THE SAME HOST are rejected on every reload (minimal
       two-process repro: ``cpu_aot_loader.cc`` errors on a cached matmul).
       Capping codegen at ``--xla_cpu_max_isa=AVX2`` removes those features
       and silences the loader — per-host cache keying alone cannot.
    2. Even with the cap (zero loader errors), a cold full-suite run
       aborted inside executable deserialization
       (``compilation_cache.get_executable_and_time``) when a later test
       reloaded a pipeline-sized entry persisted minutes earlier in the
       same run.

    The in-memory jit cache still dedups within a process; TPU executables
    reload cleanly and keep the multi-minute 1080p compile skip."""
    import jax

    if jax.default_backend() == "cpu":
        return None

    path = cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
