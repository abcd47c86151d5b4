"""Fused 3-layer fusion-MLP kernel (Pallas, TPU).

The late-fusion head is concat(2048+768) -> 512 -> 256 -> 2 with ReLU
(reference notebooks/train_multimodal_fusion.py:305-313).  All three weight
matrices total < 3 MB in bf16, so the whole MLP fits in VMEM: one grid step
per batch tile computes all three matmuls + ReLUs without writing the
intermediate activations to HBM.  XLA already fuses the elementwise ops into
the matmuls; this kernel additionally removes the two inter-layer HBM
round-trips, which matters at small serving batches (the BASELINE.json
north star calls for the fusion MLP as a single fused kernel).

Inference path only (dropout is identity at eval); training uses the plain
Flax modules where XLA's fusion is already near-optimal for the backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                      o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...].astype(jnp.float32), 0.0)
    h = h.astype(x.dtype)
    h = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[...].astype(jnp.float32), 0.0)
    h = h.astype(x.dtype)
    out = jnp.dot(h, w3_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (out + b3_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_mlp_ref(x, w1, b1, w2, b2, w3, b3):
    """Plain-jnp oracle with the kernel's numerics — the custom VJP
    backward (Grad-CAM differentiates the eval forward, so the serving
    kernel must be differentiable)."""
    h = jnp.einsum("bi,io->bo", x, w1, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    h = jnp.einsum("bi,io->bo", h, w2, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2.astype(jnp.float32), 0.0).astype(x.dtype)
    out = jnp.einsum("bi,io->bo", h, w3, preferred_element_type=jnp.float32)
    return out + b3.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp(x, w1, b1, w2, b2, w3, b3, block_rows, interpret):
    return _fused_mlp_call(x, w1, b1, w2, b2, w3, b3, block_rows, interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, w3, b3, block_rows, interpret):
    out = _fused_mlp_call(x, w1, b1, w2, b2, w3, b3, block_rows, interpret)
    return out, (x, w1, b1, w2, b2, w3, b3)


def _fused_mlp_bwd(block_rows, interpret, res, g):
    _, vjp = jax.vjp(_fused_mlp_ref, *res)
    return vjp(g)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_mlp(x: jnp.ndarray,
              w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              w3: jnp.ndarray, b3: jnp.ndarray,
              block_rows: int = 128, interpret: bool = False) -> jnp.ndarray:
    """relu(relu(x@w1+b1)@w2+b2)@w3+b3 in one kernel, differentiable
    (rematerializing custom VJP).

    x: (B, D_in); returns (B, D_out) float32.
    """
    return _fused_mlp(x, w1, b1, w2, b2, w3, b3, block_rows, interpret)


def _fused_mlp_call(x: jnp.ndarray,
                    w1: jnp.ndarray, b1: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray,
                    w3: jnp.ndarray, b3: jnp.ndarray,
                    block_rows: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    batch, d_in = x.shape
    d_out = w3.shape[1]
    rows = min(block_rows, batch)
    grid = (pl.cdiv(batch, rows),)

    def rowblock(i):
        return (i, 0)

    from dfu_multimodal_tpu.ops.pallas_common import const_spec, vmem
    weight_spec = lambda shape: const_spec(shape, interpret)  # noqa: E731

    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d_in), rowblock,
                         memory_space=vmem(interpret)),
            weight_spec(w1.shape), weight_spec(b1.shape),
            weight_spec(w2.shape), weight_spec(b2.shape),
            weight_spec(w3.shape), weight_spec(b3.shape),
        ],
        out_specs=pl.BlockSpec((rows, d_out), rowblock,
                               memory_space=vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((batch, d_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * (d_in * w1.shape[1]
                               + w1.shape[1] * w2.shape[1]
                               + w2.shape[1] * d_out),
            bytes_accessed=(x.size + w1.size + w2.size + w3.size
                            + batch * d_out) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
    return out


def fusion_mlp_params(fusion_params) -> Tuple[jnp.ndarray, ...]:
    """Extract (w1,b1,w2,b2,w3,b3) from a FusionMLP param subtree."""
    return (fusion_params["fc1"]["kernel"], fusion_params["fc1"]["bias"],
            fusion_params["fc2"]["kernel"], fusion_params["fc2"]["bias"],
            fusion_params["fc3"]["kernel"], fusion_params["fc3"]["bias"])
