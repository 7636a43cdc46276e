"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4 "multi-chip tests runnable on
CPU via fake-device meshes").

The environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (the real TPU), so plain env vars are too late
here — we go through jax.config and reset any initialised backends.
"""
import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU-only processes skip the persistent compile cache by default
# (spurious cpu_aot_loader errors on reload — compile_cache.enable);
# tests opt back in for ~3x faster re-runs, accepting the log noise.
os.environ.setdefault(
    "PICHA_COMPILE_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parents[1]
        / ".jax_cache" / "tests"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:  # noqa: BLE001 — best-effort; fresh interpreters don't need it
    pass

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures():
    return FIXTURES


def fixture_bytes(name: str) -> bytes:
    return (FIXTURES / name).read_bytes()
