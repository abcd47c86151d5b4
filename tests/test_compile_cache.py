"""Persistent compile cache default (utils/compile_cache.py)."""

import jax

from dfu_multimodal_tpu.utils import compile_cache


def test_existing_config_wins(monkeypatch):
    """conftest pins the repo .jax_cache; enable_persistent_cache must
    leave an explicit configuration untouched (and be idempotent)."""
    before = jax.config.jax_compilation_cache_dir
    assert before                      # conftest configured it
    monkeypatch.setattr(compile_cache, "_DONE", False)
    compile_cache.enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir == before
    compile_cache.enable_persistent_cache()      # second call: no-op
    assert jax.config.jax_compilation_cache_dir == before


def test_default_path_selection(monkeypatch, tmp_path):
    """With no prior config, DFU_JAX_CACHE_DIR selects the directory;
    empty string disables. Exercised against a stubbed jax config so the
    process-wide setting is not disturbed."""
    calls = {}

    class FakeConfig:
        jax_compilation_cache_dir = None

        @staticmethod
        def update(key, value):
            calls[key] = value

    class FakeJax:
        config = FakeConfig()

    import sys
    monkeypatch.setattr(compile_cache, "_DONE", False)
    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    monkeypatch.setenv("DFU_JAX_CACHE_DIR", str(tmp_path / "cc"))
    compile_cache.enable_persistent_cache()
    assert calls["jax_compilation_cache_dir"] == str(tmp_path / "cc")
    assert (tmp_path / "cc").is_dir()
    assert calls["jax_persistent_cache_min_compile_time_secs"] == 0.5

    # empty string disables the default entirely
    calls.clear()
    monkeypatch.setattr(compile_cache, "_DONE", False)
    monkeypatch.setenv("DFU_JAX_CACHE_DIR", "")
    compile_cache.enable_persistent_cache()
    assert not calls

    # the test harness's DFU_NO_CACHE=1 escape hatch must really mean
    # no cache — not fall through to the home-dir default
    monkeypatch.delenv("DFU_JAX_CACHE_DIR")
    monkeypatch.setenv("DFU_NO_CACHE", "1")
    monkeypatch.setattr(compile_cache, "_DONE", False)
    compile_cache.enable_persistent_cache()
    assert not calls
