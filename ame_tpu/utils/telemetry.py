"""Tracing / profiling / memory telemetry (SURVEY.md §5.1).

The reference's observability is timestamped function-scoped logging plus
psutil RSS samples at pipeline milestones (audio_mastering_engine.py:30,
247-249). Equivalents here:

  * ``log_memory_usage(stage)`` — host RSS (same contract/format intent as
    the reference's helper) PLUS per-device HBM stats when available;
  * ``stage_timer`` — wall-clock spans around pipeline milestones;
  * ``profile_trace`` — jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("ame_tpu.telemetry")


def host_rss_mb() -> float | None:
    try:
        with open(f"/proc/{os.getpid()}/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1024 ** 2
    except Exception:
        return None


def device_memory_stats() -> list[dict]:
    try:
        import jax
        out = []
        for d in jax.local_devices():
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats:
                out.append({"device": str(d),
                            "bytes_in_use": stats.get("bytes_in_use"),
                            "peak_bytes_in_use":
                                stats.get("peak_bytes_in_use")})
        return out
    except Exception:
        return []


def log_memory_usage(stage: str = "") -> None:
    """Milestone memory log (reference log_memory_usage parity, engine:
    247-249, extended with device HBM)."""
    rss = host_rss_mb()
    if rss is not None:
        log.info("MEMORY USAGE at '%s': %.2f MB RSS", stage, rss)
    for s in device_memory_stats():
        if s["bytes_in_use"] is not None:
            log.info("  %s: %.1f MB HBM in use (peak %.1f MB)",
                     s["device"], s["bytes_in_use"] / 1024 ** 2,
                     (s["peak_bytes_in_use"] or 0) / 1024 ** 2)


@contextlib.contextmanager
def stage_timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.info("stage '%s' took %.1f ms", name,
                 (time.perf_counter() - t0) * 1000)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/ame_tpu_trace"):
    """jax.profiler trace span (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
