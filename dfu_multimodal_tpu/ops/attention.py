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


def _is_pow2(x: float) -> bool:
    import math
    return math.frexp(x)[0] == 0.5


def _softmax_probs_c(q_c, k_c, scale):
    """softmax(q·kᵀ·scale) with COMPUTE-DTYPE score-matmul operands and
    fp32 accumulation + statistics — standard flash-attention precision.
    fp32 operands run the MXU at half rate; with bf16 operands the only
    extra rounding is of q/k themselves (already compute dtype).

    ``scale = d^-0.5`` is an exact power of two for every power-of-4 head
    dim (d=64 -> 1/8), so scaling q in the compute dtype is LOSSLESS (an
    exponent shift) and costs N·D VPU multiplies.  Scaling the fp32
    scores after the matmul instead costs N² multiplies — measured as a
    ~1.5% serving regression on the VPU-heavier int8 path.  Non-pow2
    scales (non-power-of-4 head dims) fall back to scale-after-matmul to
    avoid bf16-rounding the operand."""
    if _is_pow2(scale):
        scores = jax.lax.dot_general(
            q_c * jnp.asarray(scale, q_c.dtype), k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),  # q @ k.T
            preferred_element_type=jnp.float32)          # (N, N)
    else:
        scores = jax.lax.dot_general(
            q_c, k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attention_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One grid step per batch element, all heads unrolled inside: removes
    per-(batch,head) grid/DMA overhead that dominated the tiny-matmul
    variant (23ms -> per-head grid; see docs/DESIGN.md)."""
    n_heads = q_ref.shape[1]
    for h in range(n_heads):
        q = q_ref[0, h]                                # (N, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        p = _softmax_probs_c(q, k, scale)
        o_ref[0, h] = jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                          dv_ref, *, scale: float):
    """Recompute-based backward: p is cheap to rebuild at N=197, so no
    residuals ever touch HBM. Standard softmax-attention gradients:
    dv = pᵀ·do; ds = p ∘ (do·vᵀ - rowsum(do·vᵀ ∘ p)); dq = ds·k·scale;
    dk = dsᵀ·q·scale.  Heads unrolled per batch element like the forward.

    Precision: the q·kᵀ score matmul and all softmax statistics run in
    fp32 (score precision bounds the whole gradient); the five gradient
    matmuls take compute-dtype operands with fp32 MXU accumulation —
    fp32 operands run the MXU at half rate, and the operand rounding is
    exactly the forward kernel's own p·v precision.  With fp32 inputs
    (CPU tests) every cast is a no-op, so the kernel stays exact against
    the jnp oracle there."""
    n_heads = q_ref.shape[1]
    for h in range(n_heads):
        q_c = q_ref[0, h]
        k_c = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]

        p = _softmax_probs_c(q_c, k_c, scale)            # (N, N)
        p_c = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),  # pᵀ @ do
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),   # do @ vᵀ
            preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              ).astype(v.dtype)
        dq = jnp.dot(ds, k_c, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q_c, dimension_numbers=(((0,), (0,)), ((), ())),  # dsᵀ @ q
            preferred_element_type=jnp.float32) * scale

        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _batch_spec(h, n, d, interpret):
    return pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)


def _attention_fwd_call(q, k, v, interpret):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _batch_spec(h, n, d, interpret)
    return pl.pallas_call(
        functools.partial(_attention_fwd_kernel, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n),
        interpret=interpret,
    )(q, k, v)


def _attention_bwd_call(q, k, v, do, interpret):
    b, h, n, d = q.shape
    scale = d ** -0.5
    spec = _batch_spec(h, n, d, interpret)
    shape = jax.ShapeDtypeStruct((b, h, n, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n),
        interpret=interpret,
    )(q, k, v, do)


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


# --------------------------------------------------------------------------
# Layout-free variant: consumes the packed qkv projection directly.
#
# The (B, N, 3C) -> (B, H, N, D) head split is a minor-dim transpose XLA
# must materialize in HBM around any (B, H, N, D) attention op — measured at
# ~1.5 ms/block at b128, HALF the MHA cost. This kernel slices heads from
# the packed qkv inside VMEM instead (lane slices are free of HBM traffic),
# taking (B, N, 3C) straight from the qkv Dense and emitting (B, N, C)
# straight into the output projection. No XLA-level transposes remain.
# --------------------------------------------------------------------------


def _qkv_attention_fwd_kernel(qkv_ref, o_ref, *, num_heads: int,
                              scale: float):
    c = o_ref.shape[-1]
    d = c // num_heads
    for h in range(num_heads):
        q = qkv_ref[0, :, h * d:(h + 1) * d]
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d]
        p = _softmax_probs_c(q, k, scale)
        o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qkv_attention_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int,
                              scale: float):
    """Compute-dtype gradient-matmul operands with fp32 accumulation; the
    score matmul and softmax statistics stay fp32 (see
    :func:`_attention_bwd_kernel`)."""
    c = do_ref.shape[-1]
    d = c // num_heads
    for h in range(num_heads):
        q_c = qkv_ref[0, :, h * d:(h + 1) * d]
        k_c = qkv_ref[0, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d]
        do = do_ref[0, :, h * d:(h + 1) * d]

        p = _softmax_probs_c(q_c, k_c, scale)
        p_c = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              ).astype(v.dtype)
        dq = jnp.dot(ds, k_c, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        dqkv_ref[0, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + h * d:c + (h + 1) * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d] = dv.astype(
            dqkv_ref.dtype)


def _qkv_spec(n, width, interpret):
    return pl.BlockSpec((1, n, width), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)


def _qkv_attention_fwd_call(qkv, num_heads, interpret):
    b, n, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    return pl.pallas_call(
        functools.partial(_qkv_attention_fwd_kernel, num_heads=num_heads,
                          scale=scale),
        grid=(b,),
        in_specs=[_qkv_spec(n, c3, interpret)],
        out_specs=_qkv_spec(n, c, interpret),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * c,
            bytes_accessed=(qkv.size + b * n * c) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(qkv)


def _qkv_attention_bwd_call(qkv, do, num_heads, interpret):
    b, n, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    return pl.pallas_call(
        functools.partial(_qkv_attention_bwd_kernel, num_heads=num_heads,
                          scale=scale),
        grid=(b,),
        in_specs=[_qkv_spec(n, c3, interpret), _qkv_spec(n, c, interpret)],
        out_specs=_qkv_spec(n, c3, interpret),
        out_shape=jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * c,
            bytes_accessed=2 * (qkv.size + b * n * c) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv_attention(qkv, num_heads, interpret):
    return _qkv_attention_fwd_call(qkv, num_heads, interpret)


def _qkv_fwd(qkv, num_heads, interpret):
    return _qkv_attention_fwd_call(qkv, num_heads, interpret), qkv


def _qkv_bwd(num_heads, interpret, qkv, g):
    return (_qkv_attention_bwd_call(qkv, g, num_heads, interpret),)


_qkv_attention.defvjp(_qkv_fwd, _qkv_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def qkv_attention(qkv: jnp.ndarray, num_heads: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Packed-qkv fused attention: (B, N, 3C) -> (B, N, C), heads sliced
    in VMEM (no XLA-level layout changes). Trainable (custom VJP)."""
    return _qkv_attention(qkv, num_heads, interpret)


# --------------------------------------------------------------------------
# Combined forward+backward kernel for rematerialized block backwards.
#
# A remat backward needs BOTH the attention output (for the projection
# weight gradient attnᵀ·do) and dqkv.  Running the fwd and bwd kernels
# separately computes softmax(QKᵀ) twice; this kernel computes p once per
# head and emits (attn, dqkv) together — one QKᵀ matmul and one softmax
# fewer per block backward, and one less kernel launch.
# --------------------------------------------------------------------------


def _qkv_attention_fwdbwd_kernel(qkv_ref, do_ref, o_ref, dqkv_ref, *,
                                 num_heads: int, scale: float):
    ipp = qkv_ref.shape[0]
    c = do_ref.shape[-1]
    d = c // num_heads
    for i in range(ipp):
        for h in range(num_heads):
            q_c = qkv_ref[i, :, h * d:(h + 1) * d]
            k_c = qkv_ref[i, :, c + h * d:c + (h + 1) * d]
            v = qkv_ref[i, :, 2 * c + h * d:2 * c + (h + 1) * d]
            do = do_ref[i, :, h * d:(h + 1) * d]

            p = _softmax_probs_c(q_c, k_c, scale)        # once per head
            p_c = p.astype(v.dtype)
            o_ref[i, :, h * d:(h + 1) * d] = jnp.dot(
                p_c, v,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
            dv = jax.lax.dot_general(
                p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ).astype(v.dtype)
            dq = jnp.dot(ds, k_c,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q_c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dqkv_ref[i, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[i, :, c + h * d:c + (h + 1) * d] = dk.astype(
                dqkv_ref.dtype)
            dqkv_ref[i, :, 2 * c + h * d:2 * c + (h + 1) * d] = dv.astype(
                dqkv_ref.dtype)


def _qkv_spec_ipp(ipp, n, width, interpret):
    return pl.BlockSpec((ipp, n, width), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)


def qkv_attention_fwdbwd(qkv: jnp.ndarray, do: jnp.ndarray, num_heads: int,
                         interpret: bool = False):
    """(qkv (B,N,3C), do (B,N,C)) -> (attn (B,N,C), dqkv (B,N,3C)) in one
    kernel, softmax probabilities computed once per head.  Score matmul +
    softmax statistics fp32; the five gradient matmuls take compute-dtype
    operands with fp32 accumulation (fp32 operands would halve MXU rate —
    see :func:`_attention_bwd_kernel`).  One image per grid step: ipp=2
    was measured SLOWER on the 12-block grad chain (11.79 vs 11.44 ms at
    b32) — the fatter blocks rob double-buffering VMEM, the same
    end-to-end lesson as the forward tile sweep (docs/DESIGN.md)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    ipp = 1
    return pl.pallas_call(
        functools.partial(_qkv_attention_fwdbwd_kernel, num_heads=num_heads,
                          scale=scale),
        grid=(b // ipp,),
        in_specs=[_qkv_spec_ipp(ipp, n, c3, interpret),
                  _qkv_spec_ipp(ipp, n, c, interpret)],
        out_specs=(_qkv_spec_ipp(ipp, n, c, interpret),
                   _qkv_spec_ipp(ipp, n, c3, interpret)),
        out_shape=(jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n, c3), qkv.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * n * n * c,
            bytes_accessed=3 * (qkv.size + b * n * c) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(qkv, do)
