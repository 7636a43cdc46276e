"""Double-buffered host->device prefetch.

The TPU-era replacement for the reference's libuv overlap (SURVEY.md
§5.8): while the device crunches batch N, host threads entropy-decode
batch N+1 and its transfer is already in flight. JAX dispatch is
asynchronous, so the recipe is simply to keep `depth` batches in
flight and only block on the oldest.
"""
from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


def prefetch(producer: Iterable, depth: int = 2) -> Iterator:
    """Run `producer` (host work -> device arrays) ahead of the consumer
    by `depth` items on a background thread."""
    pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="picha-prefetch")
    it = iter(producer)
    queue: deque = deque()

    def pull():
        return next(it)

    try:
        for _ in range(depth):
            queue.append(pool.submit(pull))
        while True:
            fut = queue.popleft()
            try:
                item = fut.result()
            except StopIteration:
                return
            queue.append(pool.submit(pull))
            yield item
    finally:
        for f in queue:
            f.cancel()
        pool.shutdown(wait=False)


def map_prefetch(fn: Callable, items, depth: int = 2) -> Iterator:
    """prefetch(map(fn, items)) with a clean generator."""
    return prefetch((fn(x) for x in items), depth)
