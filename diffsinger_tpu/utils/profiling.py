"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference only has a cumulative wall-clock Timer (utils/__init__.py:235-250);
here that plus `jax.profiler` trace annotation contexts and an xprof dump
helper for TPU performance work.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Cumulative wall-clock timer context manager."""

    timer_map = {}

    def __init__(self, name: str, enable: bool = True, print_time: bool = False):
        self.name = name
        self.enable = enable
        self.print_time = print_time
        Timer.timer_map.setdefault(name, 0.0)

    def __enter__(self):
        if self.enable:
            self.t = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.enable:
            Timer.timer_map[self.name] += time.time() - self.t
            if self.print_time:
                print(self.name, Timer.timer_map[self.name])


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler.TraceAnnotation wrapper (shows up in xprof timelines)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax profiler trace (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
