"""Tracing / timing subsystem.

The reference's observability is wall-clock prints (SURVEY §5). Here:
  * `timed` spans collected into a process-global registry with a summary
    table (the per-phase minutes of run.py:199,500 and the per-stage seconds
    of run_hunyuan21.py, generalized);
  * `trace` wraps `jax.profiler` for device traces (viewable in TensorBoard
    / xprof) — the TPU answer to nvprof-style profiling;
  * `device_memory_stats` snapshots live HBM usage where the backend
    exposes it.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Tuple

import jax

log = logging.getLogger(__name__)

_SPANS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def timed(name: str, log_it: bool = True) -> Iterator[None]:
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _SPANS[name].append(dt)
        if log_it:
            log.info("[timing] %s: %.3fs", name, dt)


@contextlib.contextmanager
def trace(trace_dir: str) -> Iterator[None]:
    """Device trace via jax.profiler (TensorBoard-compatible)."""
    with jax.profiler.trace(trace_dir):
        yield


def span_summary() -> List[Tuple[str, int, float, float]]:
    """(name, count, total_s, mean_s) sorted by total time."""
    rows = [(k, len(v), sum(v), sum(v) / len(v)) for k, v in _SPANS.items()]
    return sorted(rows, key=lambda r: -r[2])


def log_summary() -> None:
    for name, n, total, mean in span_summary():
        log.info("[timing] %-40s n=%-4d total=%8.2fs mean=%7.3fs",
                 name, n, total, mean)


def reset() -> None:
    _SPANS.clear()


def device_memory_stats() -> Optional[dict]:
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
