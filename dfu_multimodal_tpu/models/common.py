"""Shared model utilities: Grad-CAM tap points and dtype plumbing.

The reference implements Grad-CAM with PyTorch forward/backward hooks and a
second forward pass (reference notebooks/grad_cam_visualization.py:327-428).
The JAX-native design needs no hooks: every model here exposes *tap points* —
named activations that are (a) recorded via ``Module.sow`` into the
``intermediates`` collection and (b) optionally perturbed by an additive term
from a ``taps`` dict.  ``d score / d taps[name]`` computed by ``jax.grad``
equals the gradient w.r.t. the activation itself, so one forward+vjp yields
both the activation and its gradient — no double forward, no mutation.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

Taps = Optional[Dict[str, jnp.ndarray]]

# Trace-time override for :func:`mosaic_kernels_ok` (thread-local: jit
# tracing runs on the calling thread, and the serving engine traces from
# its batcher thread while tests may trace from the main thread).
_force_mosaic = threading.local()


@contextlib.contextmanager
def force_mosaic_kernels():
    """Within this context, ``mosaic_kernels_ok()`` returns True.

    Used by the shard_map-wrapped serving/eval step (train/engine.py):
    inside ``jax.shard_map`` every device traces a PER-DEVICE program, so
    Mosaic custom calls never meet the auto-partitioner and the fused
    Pallas kernels are safe on a multi-device mesh.  The flag is consulted
    at TRACE time (every ``"auto"`` impl resolution is Python-level), so
    wrapping the traced body is sufficient; it must only be set when the
    per-device platform really is TPU."""
    prev = getattr(_force_mosaic, "on", False)
    _force_mosaic.on = True
    try:
        yield
    finally:
        _force_mosaic.on = prev


def tap(module: nn.Module, name: str, x: jnp.ndarray, taps: Taps) -> jnp.ndarray:
    """Record ``x`` as intermediate ``name``; add ``taps[name]`` if given."""
    if taps is not None and name in taps:
        x = x + taps[name]
    module.sow("intermediates", name, x)
    return x


def canonical_dtype(dtype: Any) -> jnp.dtype:
    if isinstance(dtype, str):
        return jnp.dtype(dtype)
    return dtype


def mosaic_kernels_ok() -> bool:
    """True when the Pallas (Mosaic) TPU kernels can run in this trace.

    Mosaic custom calls cannot be partitioned by XLA's automatic SPMD
    pass: any multi-device ``jit`` raises ``NotImplementedError: Mosaic
    kernels cannot be automatically partitioned. Please wrap the call in
    a shard_map`` (jax/_src/tpu_custom_call.py).  Every ``"auto"`` kernel
    resolution therefore picks the fused Pallas paths when either

    - the process is a single-device TPU process (any jit is per-device), or
    - the caller declared a per-device tracing region with
      :func:`force_mosaic_kernels` — the shard_map-wrapped serving/eval
      step does this, which is how multi-device DP serving keeps the
      fused kernels (docs/DESIGN.md, "Kernels under SPMD").

    Outside those, multi-device meshes run the XLA paths, which the SPMD
    partitioner shards freely.  Explicit ``block_impl``/``attention_impl``
    requests still force the kernels (e.g. a 1-device mesh on a
    multi-chip host).
    """
    if getattr(_force_mosaic, "on", False):
        return True
    import jax
    return jax.devices()[0].platform == "tpu" and jax.device_count() == 1
