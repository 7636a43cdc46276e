"""Host runtime: thread-pool async substrate and native library loader."""

from .executor import run_async, get_executor  # noqa: F401
