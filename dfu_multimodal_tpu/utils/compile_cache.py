"""Persistent XLA compilation cache, on by default for every entry point.

A cold ResNet50/ViT-B/16 compile costs 20-40 s on TPU (and minutes on a
small CPU host); every CLI in this framework is a separate process, so
without a persistent cache each invocation of train -> extended-metrics ->
predict -> serve pays the identical compiles again.  JAX's disk cache
makes the second process load the compiled executable in milliseconds.

:func:`enable_persistent_cache` is called once from ``Trainer.__init__``
(the chokepoint every CLI passes through).  Precedence:

1. an already-configured ``jax_compilation_cache_dir`` wins (tests pin
   the repo-local ``.jax_cache``; users may configure their own);
2. ``DFU_JAX_CACHE_DIR=<dir>`` selects the directory; the empty string
   disables the default entirely;
3. otherwise ``~/.cache/dfu_multimodal_tpu/jax_cache``.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def enable_persistent_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:                       # pragma: no cover
        return
    if current:
        return                                   # explicit config wins
    if os.environ.get("DFU_NO_CACHE") == "1":
        return          # the test harness's no-cache escape hatch
                        # (tests/conftest.py) must really mean no cache
    env = os.environ.get("DFU_JAX_CACHE_DIR")
    if env == "":
        return                                   # explicitly disabled
    path = Path(env) if env else (Path.home() / ".cache"
                                  / "dfu_multimodal_tpu" / "jax_cache")
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError:                              # unwritable HOME etc.
        return
    jax.config.update("jax_compilation_cache_dir", str(path))
    # default threshold (1 s) skips small programs; the tiny test models
    # and bucket ladders benefit from caching anything non-trivial
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
