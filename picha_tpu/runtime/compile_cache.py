"""Persistent XLA compilation cache bootstrap.

This environment compiles TPU graphs through a remote compile service
whose cold compiles of large graphs (the on-chip JPEG Huffman encoder's
scatter/scan program in particular) have taken anywhere from 90 s to
30+ minutes. JAX's persistent compilation cache works against this
backend (verified: serialized executables round-trip; a fresh process
reloads a cached graph in milliseconds), which turns those into
one-time costs shared across processes.

The reference has no analog — its "compilation" is node-gyp at install
time (binding.gyp); this is the TPU-native equivalent of shipping a
prebuilt binary.

Call :func:`enable` before the first jit compile (safe to call any
time; the cache dir config is consulted per-compile). The pipelines and
``bench.py`` call it on import. Opt out with PICHA_NO_COMPILE_CACHE=1,
redirect with PICHA_COMPILE_CACHE_DIR.

Ordering caveats (the gate reads the platform config at call time and
latches): force the platform BEFORE importing anything that calls
``enable`` — switching to CPU after an enabling import keeps the cache
active; conversely a failed CPU force (config updated after a backend
initialised, which this platform does not support) makes the gate skip
the cache even though execution stays on the TPU. Both orderings are
outside CLAUDE.md's documented recipe (config update first, then
``_clear_backends``), which every in-repo caller follows.
"""
from __future__ import annotations

import hashlib
import os
import pathlib


def _machine_sig() -> str:
    """Short hash of the host CPU's identity + feature flags.

    XLA:CPU AOT-compiles executables against the build host's machine
    features; replaying them on a CPU with different features is a
    latent SIGILL (seen as ``cpu_aot_loader`` "+prefer-no-gather is not
    supported" errors when a cache written on one box was read on
    another). Keying the cache directory by this signature confines
    every entry to hosts where it is safe to execute."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 2:
                        break
    except OSError:
        pass
    if not parts:  # non-Linux fallback: coarse but better than nothing
        import platform
        parts = [platform.machine(), platform.processor()]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _default_dir() -> pathlib.Path:
    """Source checkouts keep the cache at the repo root; installed
    wheels — where parents[2] is site-packages, often read-only — use
    the user cache directory instead. Either way the cache lives in a
    per-machine-signature subdirectory (see _machine_sig)."""
    root = pathlib.Path(__file__).resolve().parents[2]
    if (root / ".jax_cache").exists() or (root / "pyproject.toml").exists():
        base = root / ".jax_cache"
    else:
        xdg = pathlib.Path(os.environ.get("XDG_CACHE_HOME",
                                          pathlib.Path.home() / ".cache"))
        base = xdg / "picha_tpu" / "jax_cache"
    return base / _machine_sig()


_DEFAULT_DIR = _default_dir()
_enabled = False


def enable(path: os.PathLike | str | None = None) -> bool:
    """Idempotently point JAX's persistent compilation cache at
    ``path`` (default: <repo>/.jax_cache, override via
    PICHA_COMPILE_CACHE_DIR). Returns True if the cache is active."""
    global _enabled
    if os.environ.get("PICHA_NO_COMPILE_CACHE") == "1":
        return False
    if _enabled and path is None:
        return True
    import jax

    # CPU-only processes (tests, the driver's multichip dryrun) skip the
    # persistent cache: XLA:CPU AOT entries replay with spurious
    # cpu_aot_loader "+prefer-no-gather is not supported" ERROR logs
    # even when written and reloaded on the SAME machine and config (a
    # jaxlib loader quirk — verified with a fresh write+reload pair),
    # and CPU compiles are fast anyway. The cache exists for the remote
    # TPU compile service, whose cold compiles take minutes. An
    # explicit dir (argument or PICHA_COMPILE_CACHE_DIR, e.g. from
    # tests/conftest.py) opts back in, accepting the log noise for
    # faster re-runs.
    # Prefer the CONFIG value over the env var: this environment's
    # sitecustomize pins JAX_PLATFORMS=axon in the env for every
    # process, and the only working way to force CPU here is
    # jax.config.update("jax_platforms", "cpu") (CLAUDE.md) — so when
    # the two disagree, the config reflects the platform actually in
    # use. (Config reads "axon,cpu" in TPU processes, "cpu" after a
    # forced update — verified.)
    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS") or "")
    if (path is None and plats.strip().lower() == "cpu"
            and not os.environ.get("PICHA_COMPILE_CACHE_DIR")):
        return False

    try:
        if path is None and (jax.config.jax_compilation_cache_dir
                             or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            # the application already configured its own JAX cache —
            # don't clobber it (this runs as an import side effect of
            # picha_tpu.pipeline); keep its thresholds too
            _enabled = True
            return True
        explicit = (path is not None
                    or bool(os.environ.get("PICHA_COMPILE_CACHE_DIR")))
        target = pathlib.Path(
            path or os.environ.get("PICHA_COMPILE_CACHE_DIR", _DEFAULT_DIR))
        target.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(target))
        # Threshold choice: an explicit dir (tests) caches EVERYTHING —
        # fast re-runs trump log noise. The default (TPU-process) path
        # keeps a small floor instead: every axon compile goes through
        # the remote compile service (≥ seconds even for tiny graphs)
        # so all TPU entries still cache, while the sub-second XLA:CPU
        # compiles that mixed processes dispatch to jax.devices("cpu")
        # (single-image ops) stay out of the cache — their AOT entries
        # replay with spurious cpu_aot_loader ERROR lines even
        # same-machine (jaxlib loader quirk).
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0 if explicit else 0.75)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimisation only
        return False
    _enabled = True
    return True
