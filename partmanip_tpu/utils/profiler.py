"""Lightweight profiling utilities (≙ ``utils/time_counter.py``).

``@TimeCounter`` decorates host-side functions and accumulates call counts /
wall time, reported at exit (``time_counter.py:57-69``); ``TimeCounterSession``
is the context-manager form.  For device-side profiling use
:func:`trace` — a thin wrapper over ``jax.profiler`` producing xprof traces
(the TPU replacement for the reference's ad-hoc CUDA wall-clocks,
``ppo.py:223-262``).
"""

from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from contextlib import contextmanager

_STATS = defaultdict(lambda: [0, 0.0])  # name -> [calls, total_s]
_REPORT_REGISTERED = False


def _register_report():
    global _REPORT_REGISTERED
    if not _REPORT_REGISTERED:
        atexit.register(report)
        _REPORT_REGISTERED = True


def TimeCounter(fn):
    """Decorator accumulating wall time per call; atexit report."""
    _register_report()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            st = _STATS[fn.__qualname__]
            st[0] += 1
            st[1] += time.perf_counter() - t0

    return wrapper


@contextmanager
def TimeCounterSession(name: str):
    """``with TimeCounterSession('phase'):`` accumulator."""
    _register_report()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        st = _STATS[name]
        st[0] += 1
        st[1] += time.perf_counter() - t0


def report():
    if not _STATS:
        return
    print("\n===== TimeCounter report =====")
    for name, (calls, total) in sorted(_STATS.items(),
                                       key=lambda kv: -kv[1][1]):
        print(f"{name:<40} calls={calls:<8} total={total:8.3f}s "
              f"avg={total / max(calls, 1) * 1000:8.2f}ms")


def reset():
    _STATS.clear()


@contextmanager
def trace(log_dir: str = "/tmp/partmanip_trace"):
    """Capture a device profile viewable with xprof/tensorboard-profile."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
