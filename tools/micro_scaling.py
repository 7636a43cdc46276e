"""Does per-step cost scale with lane count, or is it launch-bound?

Times a gather-and-update fori loop (the decoder's per-symbol shape)
at several lane widths on the real chip. If ns/lane falls with L, the
decoder should batch more segments per grid; if flat, per-lane work is
real and the lever is fewer steps per symbol.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_scaling.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    T = 256
    tab = jax.device_put(rng.integers(0, 256, (2048,), np.int32))
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm link

    for L in (4096, 16384, 65536, 262144):
        idx0 = jax.device_put(
            rng.integers(0, 2048, (L,), np.int32))

        @jax.jit
        def g_run(x):
            return jax.lax.fori_loop(
                0, T,
                lambda k, x: (x + tab[(x + k) & 2047]) & 0x7FFFFFFF, x)

        r = g_run(idx0)
        np.asarray(r)
        t0 = time.perf_counter()
        np.asarray(g_run(idx0))
        dt = (time.perf_counter() - t0) / T
        log(f"gather      L={L:>7}: {dt * 1e6:8.1f} us/step "
            f"({dt / L * 1e9:6.2f} ns/lane)")

        # a ~10-op elementwise body (state-update-like)
        @jax.jit
        def e_run(x):
            def body(k, x):
                y = (x * 5 + k) ^ (x >> 3)
                z = jnp.where(y & 1 == 0, y + 7, y - 3)
                return (z + (z << 2)) & 0x7FFFFFFF
            return jax.lax.fori_loop(0, T, body, x)

        r = e_run(idx0)
        np.asarray(r)
        t0 = time.perf_counter()
        np.asarray(e_run(idx0))
        dt = (time.perf_counter() - t0) / T
        log(f"elementwise L={L:>7}: {dt * 1e6:8.1f} us/step "
            f"({dt / L * 1e9:6.2f} ns/lane)")


if __name__ == "__main__":
    main()
