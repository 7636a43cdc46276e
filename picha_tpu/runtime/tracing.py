"""Profiling hooks (SURVEY.md §5.1: "jax.profiler traces + named
kernels; per-stage timers feeding the Mpix/s metric").

Usage:
    with trace("/tmp/picha-trace"):
        pipeline(bufs)
then load the trace directory in TensorBoard / Perfetto. Ops in this
framework are named jit functions, so device timelines attribute work
to the pipeline stages directly.
"""
from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap host-side stages in a named TraceAnnotation so
    they appear on the profiler timeline."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)
        return wrapped

    return deco
