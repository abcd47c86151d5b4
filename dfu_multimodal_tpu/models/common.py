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

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

Taps = Optional[Dict[str, jnp.ndarray]]


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
    """True when the Pallas (Mosaic) TPU kernels can run in this process.

    Mosaic custom calls cannot be partitioned by XLA's automatic SPMD
    pass: any multi-device ``jit`` raises ``NotImplementedError: Mosaic
    kernels cannot be automatically partitioned. Please wrap the call in
    a shard_map`` (jax/_src/tpu_custom_call.py).  Every ``"auto"`` kernel
    resolution therefore picks the fused Pallas paths only in a
    single-device TPU process; multi-device meshes run the XLA paths,
    which the SPMD partitioner shards freely (docs/DESIGN.md, "Kernels
    under SPMD").  Explicit ``block_impl``/``attention_impl`` requests
    still force the kernels (e.g. a 1-device mesh on a multi-chip host).
    """
    import jax
    return jax.devices()[0].platform == "tpu" and jax.device_count() == 1
