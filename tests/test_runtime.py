"""Runtime substrate tests: persistent compile-cache gating.

The cache bootstrap (picha_tpu.runtime.compile_cache) must skip
CPU-only processes — XLA:CPU AOT entries replay with spurious
``cpu_aot_loader`` ERROR lines even same-machine — while still
engaging for TPU processes. The subtlety this pins: the environment's
sitecustomize leaves ``JAX_PLATFORMS=axon`` in the env of EVERY
process, and the only working way to force CPU here is
``jax.config.update("jax_platforms", "cpu")``, so the skip decision
must trust the config value over the env var (regression: the
driver's dryrun emitted 148 cpu_aot_loader errors because enable()
read the env first).
"""
import jax

from picha_tpu.runtime import compile_cache


def _fresh(monkeypatch):
    """Reset the module's idempotency latch and strip the opt-ins the
    test conftest installs, without touching live jax config."""
    monkeypatch.setattr(compile_cache, "_enabled", False)
    monkeypatch.delenv("PICHA_COMPILE_CACHE_DIR", raising=False)
    monkeypatch.delenv("PICHA_NO_COMPILE_CACHE", raising=False)


def test_cpu_config_skips_cache_despite_axon_env(monkeypatch):
    # the hostile combination: env says axon (sitecustomize), config
    # says cpu (the forced platform actually in use in this process)
    _fresh(monkeypatch)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert jax.config.jax_platforms.strip().lower() == "cpu"  # conftest
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable() is False
    assert jax.config.jax_compilation_cache_dir == before  # no clobber


def test_explicit_dir_opts_back_in(monkeypatch, tmp_path):
    _fresh(monkeypatch)
    before = (jax.config.jax_compilation_cache_dir,
              jax.config.jax_persistent_cache_min_compile_time_secs,
              jax.config.jax_persistent_cache_min_entry_size_bytes)
    try:
        assert compile_cache.enable(tmp_path / "cc") is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        # explicit dirs cache everything (no compile-time floor)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert (tmp_path / "cc").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", before[0])
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", before[1])
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", before[2])
        compile_cache._enabled = False


def test_no_cache_env_wins(monkeypatch, tmp_path):
    _fresh(monkeypatch)
    monkeypatch.setenv("PICHA_NO_COMPILE_CACHE", "1")
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable(tmp_path / "cc") is False
    assert jax.config.jax_compilation_cache_dir == before


def test_machine_sig_stable_and_short():
    a, b = compile_cache._machine_sig(), compile_cache._machine_sig()
    assert a == b and len(a) == 12
    int(a, 16)  # hex
