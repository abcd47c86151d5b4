"""Int8 fused ViT encoder-block kernels (Pallas, TPU) — serving path.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), and the fused
bf16 block kernels (ops/vit_block.py) already sit at 63-87% of the bf16
roofline — the remaining 2x for serving is precision, not scheduling.

Scheme (standard dynamic-activation / static-weight int8):
- weights are quantized ONCE at model-load time, per OUTPUT channel:
  w_q8[k, m] = round(w[k, m] / s[m]),  s[m] = absmax(w[:, m]) / 127
  (``quantize_weight``) — never inside the jitted step, where the
  requantization traffic would eat the MXU savings.
- activations are quantized per ROW inside the kernel right after the
  (fp32) LayerNorm: a[r] = absmax(y[r, :]) / 127; the int32 matmul result
  is dequantized by the rank-1 outer product a[r]·s[m] — exact w.r.t. the
  quantized operands.
- attention itself stays bf16/fp32 (it is ~5% of the FLOPs; accuracy is
  softmax-sensitive).

Quality contract: dynamic per-row + per-channel int8 on these classifier
models costs well under a point of accuracy; the path is OPT-IN
(``block_impl="fused_q8"``) and serving-only (no VJP — training uses the
bf16 kernels). Reference has no analogue (stock fp32 torch, SURVEY.md §0);
this is SURVEY.md §7 step 8 territory.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfu_multimodal_tpu.ops.vit_block import (_attention_head, _gelu_fast,
                                              _layernorm_f32)


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: w (K, M) -> (int8 (K, M), f32 (M,)).
    Run once at model load, outside the serving step."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def _row_quant(y):
    """Per-row symmetric int8 of fp32 y: returns (int8 y_q, f32 (rows,1) a).
    Quantizes via reciprocal-multiply — one divide per ROW instead of one
    per element (VPU divides are multi-cycle)."""
    a = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(y * (1.0 / a)), -127, 127).astype(jnp.int8)
    return q, a


def _q8_matmul(y_q, a, w_ref, s_ref, b_ref):
    """int8 x int8 -> int32 matmul + rank-1 dequant + bias; fp32 out."""
    acc = jax.lax.dot_general(
        y_q, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * a * s_ref[0]
            + b_ref[0].astype(jnp.float32))


def _attn_block_q8_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, sqkv_ref,
                          bqkv_ref, wproj_ref, sproj_ref, bproj_ref, *rest,
                          num_heads: int):
    # Optional trailing bias operand (ToMe proportional attention), as in
    # ops/vit_block.py::_attn_block_kernel.
    if len(rest) == 2:
        bias_ref, o_ref = rest
    else:
        (o_ref,), bias_ref = rest, None
    ipp, n, c = x_ref.shape
    d = c // num_heads
    scale = d ** -0.5

    x = x_ref[...].reshape(ipp * n, c)
    y = _layernorm_f32(x, g1_ref[0], b1_ref[0])
    y_q, a = _row_quant(y)
    qkv = _q8_matmul(y_q, a, wqkv_ref, sqkv_ref, bqkv_ref).astype(x.dtype)

    outs = []
    for i in range(ipp):
        qkv_i = qkv[i * n:(i + 1) * n]
        bias_i = (None if bias_ref is None
                  else bias_ref[i, :, :].astype(jnp.float32))
        heads = []
        for h in range(num_heads):
            q = qkv_i[:, h * d:(h + 1) * d]
            k = qkv_i[:, c + h * d:c + (h + 1) * d]
            v = qkv_i[:, 2 * c + h * d:2 * c + (h + 1) * d]
            heads.append(_attention_head(q, k, v, scale, bias_i))
        outs.append(jnp.concatenate(heads, axis=-1))
    attn = jnp.concatenate(outs, axis=0)                 # (ipp·N, C) f32

    attn_q, a2 = _row_quant(attn)
    o = _q8_matmul(attn_q, a2, wproj_ref, sproj_ref, bproj_ref)
    o_ref[...] = (x + o.astype(x.dtype)).reshape(ipp, n, c)


def _mlp_block_q8_kernel(x_ref, g2_ref, b2_ref, w1_ref, s1_ref, b1_ref,
                         w2_ref, s2_ref, b2b_ref, o_ref, *,
                         hidden_chunks: int):
    x = x_ref[...]                                       # (rows, C)
    c = x.shape[-1]
    hidden = w1_ref.shape[-1]
    chunk = hidden // hidden_chunks

    y = _layernorm_f32(x, g2_ref[0], b2_ref[0])
    y_q, a = _row_quant(y)

    acc = jnp.zeros((x.shape[0], c), jnp.float32)
    for i in range(hidden_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        h = jax.lax.dot_general(
            y_q, w1_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = (h.astype(jnp.float32) * a * s1_ref[0, sl]
             + b1_ref[0, sl].astype(jnp.float32))
        h = _gelu_fast(h)
        h_q, ah = _row_quant(h)
        o = jax.lax.dot_general(
            h_q, w2_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # per-chunk dequant (each chunk has its own row scales) — the fp32
        # accumulation across chunks is exact
        acc = acc + o.astype(jnp.float32) * ah * s2_ref[0]
    o = acc + b2b_ref[0].astype(jnp.float32)
    o_ref[...] = x + o.astype(x.dtype)


# -------------------------------------------------- static-scale variants
#
# Same int8 math with CALIBRATED per-tensor activation scales instead of
# per-row dynamic absmax: the absmax reductions and per-row rank-1 dequant
# disappear from the kernels (the act scale folds into the per-channel
# weight scales OUTSIDE the kernel — see models/vit.py's static converter),
# leaving only the quantize multiply+round+clip on the VPU.  Scales come
# from a calibration pass over representative inputs
# (``ViT(calibrate=True)`` sows absmaxes, like the int8 ResNet's
# ``calibrate_resnet``).


def _static_quant(y, inv_scale):
    """Symmetric int8 with a precomputed reciprocal scale (scalar)."""
    return jnp.clip(jnp.round(y * inv_scale), -127, 127).astype(jnp.int8)


def _attn_block_q8s_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, sqkv_ref,
                           bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
                           inv_ref, *rest, num_heads: int):
    """Static-scale attn block: inv_ref (1, 2) holds [1/s_ln1, 1/s_attn];
    sqkv/sproj are the weight scales PRE-MULTIPLIED by the act scales."""
    if len(rest) == 2:
        bias_ref, o_ref = rest
    else:
        (o_ref,), bias_ref = rest, None
    ipp, n, c = x_ref.shape
    d = c // num_heads
    scale = d ** -0.5

    x = x_ref[...].reshape(ipp * n, c)
    y = _layernorm_f32(x, g1_ref[0], b1_ref[0])
    y_q = _static_quant(y, inv_ref[0, 0])
    qkv = jax.lax.dot_general(
        y_q, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = (qkv.astype(jnp.float32) * sqkv_ref[0]
           + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    outs = []
    for i in range(ipp):
        qkv_i = qkv[i * n:(i + 1) * n]
        bias_i = (None if bias_ref is None
                  else bias_ref[i, :, :].astype(jnp.float32))
        heads = []
        for h in range(num_heads):
            q = qkv_i[:, h * d:(h + 1) * d]
            k = qkv_i[:, c + h * d:c + (h + 1) * d]
            v = qkv_i[:, 2 * c + h * d:2 * c + (h + 1) * d]
            heads.append(_attention_head(q, k, v, scale, bias_i))
        outs.append(jnp.concatenate(heads, axis=-1))
    attn = jnp.concatenate(outs, axis=0)                 # (ipp·N, C) f32

    attn_q = _static_quant(attn, inv_ref[0, 1])
    o = jax.lax.dot_general(
        attn_q, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o = (o.astype(jnp.float32) * sproj_ref[0]
         + bproj_ref[0].astype(jnp.float32))
    o_ref[...] = (x + o.astype(x.dtype)).reshape(ipp, n, c)


def _mlp_block_q8s_kernel(x_ref, g2_ref, b2_ref, w1_ref, s1_ref, b1_ref,
                          w2_ref, s2_ref, b2b_ref, inv_ref, o_ref, *,
                          hidden_chunks: int):
    """Static-scale MLP block: inv_ref (1, 2) holds [1/s_ln2, 1/s_gelu];
    s1/s2 are weight scales pre-multiplied by the act scales."""
    x = x_ref[...]
    c = x.shape[-1]
    hidden = w1_ref.shape[-1]
    chunk = hidden // hidden_chunks

    y = _layernorm_f32(x, g2_ref[0], b2_ref[0])
    y_q = _static_quant(y, inv_ref[0, 0])

    acc = jnp.zeros((x.shape[0], c), jnp.float32)
    for i in range(hidden_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        h = jax.lax.dot_general(
            y_q, w1_ref[:, sl], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = (h.astype(jnp.float32) * s1_ref[0, sl]
             + b1_ref[0, sl].astype(jnp.float32))
        h = _gelu_fast(h)
        h_q = _static_quant(h, inv_ref[0, 1])
        o = jax.lax.dot_general(
            h_q, w2_ref[sl, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + o.astype(jnp.float32) * s2_ref[0]
    o = acc + b2b_ref[0].astype(jnp.float32)
    o_ref[...] = x + o.astype(x.dtype)


from dfu_multimodal_tpu.ops.pallas_common import (const_spec as
                                                   _const_spec,
                                                   vmem as _vmem)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def attn_block_q8(x, g1, b1, wqkv_q8, sqkv, bqkv, wproj_q8, sproj, bproj,
                  num_heads: int, interpret: bool = False,
                  bias=None) -> jnp.ndarray:
    """Serving-only int8 variant of ops/vit_block.py::attn_block.
    Weights pre-quantized via :func:`quantize_weight`.  ``bias``: optional
    fp32 (B, N) per-key attention-score bias (ToMe proportional
    attention)."""
    b, n, c = x.shape
    ipp = 2 if b % 2 == 0 else 1
    args = [x, g1.reshape(1, c), b1.reshape(1, c),
            wqkv_q8, sqkv.reshape(1, 3 * c), bqkv.reshape(1, 3 * c),
            wproj_q8, sproj.reshape(1, c), bproj.reshape(1, c)]

    def img_block(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((ipp, n, c), img_block, memory_space=_vmem(interpret)),
        _const_spec((1, c), interpret), _const_spec((1, c), interpret),
        _const_spec((c, 3 * c), interpret),
        _const_spec((1, 3 * c), interpret),
        _const_spec((1, 3 * c), interpret),
        _const_spec((c, c), interpret),
        _const_spec((1, c), interpret), _const_spec((1, c), interpret),
    ]
    if bias is not None:
        # (B, 1, N): see ops/vit_block.py — trailing block dims must
        # equal the array dims for Mosaic's block-shape rule
        in_specs.append(pl.BlockSpec((ipp, 1, n), lambda i: (i, 0, 0),
                                     memory_space=_vmem(interpret)))
        args.append(bias.astype(jnp.float32).reshape(b, 1, n))
    return pl.pallas_call(
        functools.partial(_attn_block_q8_kernel, num_heads=num_heads),
        grid=(b // ipp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ipp, n, c), img_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * 4 * c + 4 * b * n * n * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + wqkv_q8.size + wproj_q8.size,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("hidden_chunks", "interpret"))
def mlp_block_q8(x, g2, b2, w1_q8, s1, b1, w2_q8, s2, b2b,
                 hidden_chunks: int = 4,
                 interpret: bool = False) -> jnp.ndarray:
    """Serving-only int8 variant of ops/vit_block.py::mlp_block."""
    b, n, c = x.shape
    hidden = w1_q8.shape[-1]
    rows_total = b * n
    rows = min(384, rows_total)
    xf = x.reshape(rows_total, c)
    args = (xf, g2.reshape(1, c), b2.reshape(1, c),
            w1_q8, s1.reshape(1, hidden), b1.reshape(1, hidden),
            w2_q8, s2.reshape(1, c), b2b.reshape(1, c))

    def row_block(i):
        return (i, 0)

    out = pl.pallas_call(
        functools.partial(_mlp_block_q8_kernel, hidden_chunks=hidden_chunks),
        grid=(pl.cdiv(rows_total, rows),),
        in_specs=[
            pl.BlockSpec((rows, c), row_block, memory_space=_vmem(interpret)),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((c, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((hidden, c), interpret),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
        ],
        out_specs=pl.BlockSpec((rows, c), row_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((rows_total, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * hidden,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + w1_q8.size + w2_q8.size,
            transcendentals=b * n * hidden),
        interpret=interpret,
    )(*args)
    return out.reshape(b, n, c)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def attn_block_q8s(x, g1, b1, wqkv_q8, sqkv_eff, bqkv, wproj_q8, sproj_eff,
                   bproj, inv_scales, num_heads: int,
                   interpret: bool = False, bias=None) -> jnp.ndarray:
    """Static-scale int8 attn block.  ``sqkv_eff``/``sproj_eff`` are
    per-channel weight scales pre-multiplied by the calibrated input act
    scales; ``inv_scales`` (2,) = [1/s_ln1_out, 1/s_attn_out].  ``bias``:
    optional fp32 (B, N) per-key attention-score bias (ToMe proportional
    attention)."""
    b, n, c = x.shape
    ipp = 2 if b % 2 == 0 else 1
    args = [x, g1.reshape(1, c), b1.reshape(1, c),
            wqkv_q8, sqkv_eff.reshape(1, 3 * c), bqkv.reshape(1, 3 * c),
            wproj_q8, sproj_eff.reshape(1, c), bproj.reshape(1, c),
            inv_scales.reshape(1, 2).astype(jnp.float32)]

    def img_block(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((ipp, n, c), img_block, memory_space=_vmem(interpret)),
        _const_spec((1, c), interpret), _const_spec((1, c), interpret),
        _const_spec((c, 3 * c), interpret),
        _const_spec((1, 3 * c), interpret),
        _const_spec((1, 3 * c), interpret),
        _const_spec((c, c), interpret),
        _const_spec((1, c), interpret), _const_spec((1, c), interpret),
        _const_spec((1, 2), interpret),
    ]
    if bias is not None:
        # (B, 1, N): see ops/vit_block.py — trailing block dims must
        # equal the array dims for Mosaic's block-shape rule
        in_specs.append(pl.BlockSpec((ipp, 1, n), lambda i: (i, 0, 0),
                                     memory_space=_vmem(interpret)))
        args.append(bias.astype(jnp.float32).reshape(b, 1, n))
    return pl.pallas_call(
        functools.partial(_attn_block_q8s_kernel, num_heads=num_heads),
        grid=(b // ipp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ipp, n, c), img_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * 4 * c + 4 * b * n * n * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + wqkv_q8.size + wproj_q8.size,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("hidden_chunks", "interpret"))
def mlp_block_q8s(x, g2, b2, w1_q8, s1_eff, b1, w2_q8, s2_eff, b2b,
                  inv_scales, hidden_chunks: int = 4,
                  interpret: bool = False) -> jnp.ndarray:
    """Static-scale int8 MLP block; ``inv_scales`` (2,) =
    [1/s_ln2_out, 1/s_gelu_out]."""
    b, n, c = x.shape
    hidden = w1_q8.shape[-1]
    rows_total = b * n
    rows = min(384, rows_total)
    xf = x.reshape(rows_total, c)
    args = (xf, g2.reshape(1, c), b2.reshape(1, c),
            w1_q8, s1_eff.reshape(1, hidden), b1.reshape(1, hidden),
            w2_q8, s2_eff.reshape(1, c), b2b.reshape(1, c),
            inv_scales.reshape(1, 2).astype(jnp.float32))

    def row_block(i):
        return (i, 0)

    out = pl.pallas_call(
        functools.partial(_mlp_block_q8s_kernel,
                          hidden_chunks=hidden_chunks),
        grid=(pl.cdiv(rows_total, rows),),
        in_specs=[
            pl.BlockSpec((rows, c), row_block, memory_space=_vmem(interpret)),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((c, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((hidden, c), interpret),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((1, 2), interpret),
        ],
        out_specs=pl.BlockSpec((rows, c), row_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((rows_total, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * hidden,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + w1_q8.size + w2_q8.size,
            transcendentals=b * n * hidden),
        interpret=interpret,
    )(*args)
    return out.reshape(b, n, c)
