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


def _softmax_probs(q, k, scale):
    """Stable softmax(q·kᵀ·scale) in fp32, all in VMEM."""
    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),    # q @ k.T
        preferred_element_type=jnp.float32)            # (N, N)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attention_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)                   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    p = _softmax_probs(q, k, scale)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                          dv_ref, *, scale: float):
    """Recompute-based backward: p is cheap to rebuild at N=197, so no
    residuals ever touch HBM. Standard softmax-attention gradients:
    dv = pᵀ·do; ds = p ∘ (do·vᵀ - rowsum(do·vᵀ ∘ p)); dq = ds·k·scale;
    dk = dsᵀ·q·scale."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    p = _softmax_probs(q, k, scale)                    # (N, N)
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),   # pᵀ @ do
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),   # do @ vᵀ
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),   # dsᵀ @ q
        preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flat_spec(n, d, interpret):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)


def _attention_fwd_call(q, k, v, interpret):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _flat_spec(n, d, interpret)
    out = pl.pallas_call(
        functools.partial(_attention_fwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n),
        interpret=interpret,
    )(q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d))
    return out.reshape(b, h, n, d)


def _attention_bwd_call(q, k, v, do, interpret):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _flat_spec(n, d, interpret)
    shape = jax.ShapeDtypeStruct((b * h, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n),
        interpret=interpret,
    )(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
      v.reshape(b * h, n, d), do.reshape(b * h, n, d))
    r = lambda x: x.reshape(b, h, n, d)
    return r(dq), r(dk), r(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, interpret):
    return _attention_fwd_call(q, k, v, interpret)


def _flash_fwd(q, k, v, interpret):
    return _attention_fwd_call(q, k, v, interpret), (q, k, v)


def _flash_bwd(interpret, residuals, g):
    q, k, v = residuals
    return _attention_bwd_call(q, k, v, g, interpret)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused softmax attention with custom VJP (trainable).
    q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    return _flash_attention(q, k, v, interpret)
