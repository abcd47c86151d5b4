"""Tracing, profiling and throughput observability.

The reference has no tracing/profiling at all (SURVEY.md §5: tqdm bars only,
wandb/tensorboard listed but never imported).  TPU-native replacements:

- :class:`ThroughputMeter` — steps/sec and images/sec/chip counters (the
  BASELINE.json headline unit), maintained by the training engine;
- :func:`profile_trace` — ``jax.profiler`` trace context writing a
  TensorBoard-loadable trace for a chosen step window;
- :func:`enable_nan_debugging` — ``jax_debug_nans`` as the TPU analog of
  host-side sanitizers (SURVEY.md §5 race-detection row).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, Optional


@dataclass
class ThroughputMeter:
    """Windowed steps/sec + images/sec/chip counter."""

    n_chips: int = 1
    start_time: float = field(default_factory=time.perf_counter)
    steps: int = 0
    images: int = 0

    def update(self, batch_size: int) -> None:
        self.steps += 1
        self.images += batch_size

    def reset(self) -> None:
        self.start_time = time.perf_counter()
        self.steps = 0
        self.images = 0

    @property
    def elapsed(self) -> float:
        return max(time.perf_counter() - self.start_time, 1e-9)

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed

    @property
    def images_per_sec(self) -> float:
        return self.images / self.elapsed

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / max(self.n_chips, 1)

    def summary(self) -> str:
        return (f"{self.steps_per_sec:.2f} steps/s, "
                f"{self.images_per_sec:.1f} img/s "
                f"({self.images_per_sec_per_chip:.1f} img/s/chip)")


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[Path]) -> Iterator[None]:
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax

    trace_dir = Path(trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield


def enable_nan_debugging(enable: bool = True) -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises at the
    originating op — the framework's sanitizer analog."""
    import jax

    jax.config.update("jax_debug_nans", enable)
