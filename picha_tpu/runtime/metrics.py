"""Optional structured counters (SURVEY.md §5.5: "optional structured
counters (images/s, bytes in/out, kernel ms) behind a flag").

Zero overhead when disabled (the default). Enable with
``picha_tpu.runtime.metrics.enable()`` or PICHA_METRICS=1.
"""
from __future__ import annotations

import collections
import os
import threading
import time
from contextlib import contextmanager

_lock = threading.Lock()
_enabled = os.environ.get("PICHA_METRICS", "0").strip().lower() in (
    "1", "true", "on", "yes")
counters: dict = collections.defaultdict(float)


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


def count(name: str, value: float = 1.0) -> None:
    if _enabled:
        with _lock:
            counters[name] += value


@contextmanager
def timer(name: str):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        with _lock:
            counters[f"{name}_ms"] += (time.perf_counter() - t0) * 1e3
            counters[f"{name}_calls"] += 1


def snapshot() -> dict:
    with _lock:
        return dict(counters)


def reset() -> None:
    with _lock:
        counters.clear()
