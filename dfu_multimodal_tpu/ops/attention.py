"""Fused attention kernel for the ViT encoder (Pallas, TPU).

For ViT-B/16 at 224² the attention shape is (B, 12 heads, 197 tokens, 64).
A 197-token sequence fits entirely in VMEM (Q, K, V and the 197×197 score
matrix together are < 1 MB per head), so the TPU-optimal design is not a
streamed online-softmax loop but a *single-block* fused kernel: one grid step
per (batch, head) computes QKᵀ -> softmax -> PV with all intermediates kept
on-chip.  That is exactly the memory-traffic win flash attention exists for
(HBM sees one read per operand and one write for the output, never the N×N
score matrix), with none of the streaming bookkeeping that only pays off at
long sequence lengths.

The reference has no analogue — its ViT runs stock timm attention
(reference notebooks/train_thermal_only.py:188-205 builds
``vit_base_patch16_224``); this kernel is part of the TPU-native redesign
(SURVEY.md §5 "long-context" row: fused attention for the 197-token case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)                   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),    # q @ k.T
        preferred_element_type=jnp.float32)            # (N, N)

    # Numerically stable softmax, all in VMEM.
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused softmax attention. q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    scale = d ** -0.5

    grid = (b * h,)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
