"""Fused ViT encoder-block kernels (Pallas, TPU).

The scanned flax encoder block lowers to clean MXU matmuls, but XLA still
materializes every LayerNorm / residual / GELU intermediate in HBM between
them: at batch 128 that is ~60% of the block's wall time on v5e (the
forward measured 42.8 ms vs a ~22 ms matmul roofline, docs/DESIGN.md).
These kernels keep one image's entire block computation VMEM-resident:

  ``attn_block``:  x + proj(attention(qkv(LN1(x))))   — one kernel
  ``mlp_block``:   x + fc2(gelu(fc1(LN2(x))))          — one kernel

HBM sees exactly one read of x, one read of the (bf16-cast) weights per
launch — weights use constant index maps, so Pallas keeps them resident in
VMEM across the whole batch grid — and one write of the residual output.
No (B, N, 3C) qkv tensor, no (B, N, 4C) MLP hidden, no normalized copies
ever leave the chip.

The reference has no analogue (its ViT is stock timm,
reference notebooks/train_thermal_only.py:188-205); this is part of the
TPU-native redesign (SURVEY.md §7 step 8).

Both ops are trainable: the custom VJP recomputes the block from its inputs
with a plain-jnp reference implementation and differentiates that
(rematerialization — no residuals besides the inputs ever reach HBM).  The
reference implementations double as the CPU/interpret numerical oracle in
tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


# ---------------------------------------------------------------- helpers


def _layernorm_f32(x, scale, bias, eps=LN_EPS):
    """LayerNorm over the last axis in fp32. x: (N, C); scale/bias: (C,)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _gelu_fast(x):
    """GELU via the logistic approximation of the normal CDF:
    gelu(x) = x·Φ(x) ≈ x·σ(1.5976·x + 0.07056·x³).

    Mosaic has no erf lowering, so some polynomial is required anyway; this
    form is the cheapest that stays exact at bf16: max abs error vs exact
    erf-GELU is 3.8e-4 (at x≈2.8) — 15× below the bf16 quantization step of
    the output there (5.7e-3) — and it MEASURES FREE inside the fused MLP
    kernel (the few VPU ops hide entirely under the MXU matmuls, whereas an
    Abramowitz–Stegun erf polynomial cost ~0.2 ms/block at b128, 12% of the
    block).  fp32 in/out.  Used by both the kernel and the jnp oracle the
    custom VJP differentiates, so forward and backward see the same
    function."""
    z = x * (1.5976 + 0.07056 * x * x)
    return x * jax.nn.sigmoid(z)


def _attention_head(q_c, k_c, v, scale, bias_row=None):
    """One head of softmax attention with DEFERRED normalization: the
    softmax division is applied to the (N, D) output of e·V rather than the
    (N, N) exp matrix — 3× fewer VPU normalization ops.  Identical math in
    exact arithmetic; at bf16 the deferred form rounds differently than
    normalize-then-cast (the un-normalized exp matrix is cast before e·V
    while the fp32 normalizer is summed from the uncast exp), a one-ulp
    divergence from the jnp oracle that gradient tests budget for — see
    :func:`_attn_block_ref`.

    Precision: q, k, v stay in the COMPUTE dtype as score-matmul operands
    with fp32 accumulation — fp32 operands would run the MXU at half rate
    (measured 12.30 -> 11.44 ms on the 12-block grad chain at b32,
    scripts_dev/bench_attn_bwd_ab.py).  ``scale`` is applied to q in the
    compute dtype: it is an exact power of two for power-of-4 head dims
    (1/8 at d=64), so the multiply is a lossless exponent shift on N·D
    elements (scaling the fp32 scores instead costs N² VPU multiplies —
    a measured ~1.5% int8-serving regression); non-pow2 scales fall back
    to scaling the fp32 scores.  Softmax statistics fp32.  With fp32
    inputs (CPU tests) every cast is a no-op and the kernel matches the
    jnp oracle exactly.  Returns fp32 (N, D).

    ``bias_row``: optional fp32 (1, N) additive score bias per KEY token,
    applied before the softmax — ToMe proportional attention feeds
    log(token sizes) here (Bolya et al. ICLR'23 §3; ops/token_merge.py)."""
    from dfu_multimodal_tpu.ops.attention import _is_pow2
    if _is_pow2(scale):
        scores = jax.lax.dot_general(
            q_c * jnp.asarray(scale, q_c.dtype), k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        scores = jax.lax.dot_general(
            q_c, k_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if bias_row is not None:
        scores = scores + bias_row                    # (1, N) over rows
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)                           # rows in (0, 1]
    s = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (N, D)
    return o / s


# ------------------------------------------------------- attention block


def _attn_block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref,
                       bproj_ref, *rest, num_heads: int):
    # Optional trailing bias operand (ToMe proportional attention): the
    # refs between bproj and the output are (bias_ref, o_ref) or (o_ref,).
    if len(rest) == 2:
        bias_ref, o_ref = rest
    else:
        (o_ref,), bias_ref = rest, None
    ipp, n, c = x_ref.shape                          # images per grid step
    d = c // num_heads
    scale = d ** -0.5

    # LN + qkv + proj are per-token: batch them over all ipp images (one
    # (ipp·N, C) matmul instead of ipp small ones).
    x = x_ref[...].reshape(ipp * n, c)
    y = _layernorm_f32(x, g1_ref[0], b1_ref[0]).astype(x.dtype)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # Heads sliced in VMEM from the packed qkv — lane slices, no transposes
    # (same layout trick as ops/attention.py::qkv_attention).
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
    attn = jnp.concatenate(outs, axis=0).astype(x.dtype)     # (ipp·N, C)

    o = jax.lax.dot_general(
        attn, wproj_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = (o + bproj_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = (x + o).reshape(ipp, n, c)


def _attn_block_ref(x, g1, b1, wqkv, bqkv, wproj, bproj, *,
                    num_heads: int, bias=None):
    """Plain-jnp oracle matching the kernel numerics (fp32 LN/softmax,
    compute-dtype matmul operands, fp32 accumulation) up to one bf16-level
    difference: the kernel defers the softmax division past e·V (casting the
    un-normalized exp matrix to bf16), while this oracle normalizes first
    and casts p — the two round differently at the compute dtype's epsilon.
    Gradient tests budget for this (rtol 5e-3 in bf16 paths)."""
    b, n, c = x.shape
    d = c // num_heads
    scale = d ** -0.5
    y = _layernorm_f32(x, g1, b1).astype(x.dtype)
    qkv = jnp.einsum("bnc,cm->bnm", y, wqkv,
                     preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).astype(jnp.float32)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).astype(jnp.float32)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:                  # (B, N) per-key additive bias
        logits = logits + bias.astype(jnp.float32)[:, None, None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)
    o = jnp.einsum("bnc,cm->bnm", attn, wproj,
                   preferred_element_type=jnp.float32)
    o = (o + bproj.astype(jnp.float32)).astype(x.dtype)
    return x + o


from dfu_multimodal_tpu.ops.pallas_common import (const_spec as
                                                   _const_spec,
                                                   vmem as _vmem)


def _attn_block_call(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads,
                     interpret, bias=None):
    b, n, c = x.shape
    ipp = 2 if b % 2 == 0 else 1    # images per grid step (VMEM-bounded)
    g1r, b1r = g1.reshape(1, c), b1.reshape(1, c)
    bqkvr, bprojr = bqkv.reshape(1, 3 * c), bproj.reshape(1, c)

    def img_block(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((ipp, n, c), img_block,
                     memory_space=_vmem(interpret)),
        _const_spec((1, c), interpret), _const_spec((1, c), interpret),
        _const_spec((c, 3 * c), interpret),
        _const_spec((1, 3 * c), interpret),
        _const_spec((c, c), interpret), _const_spec((1, c), interpret),
    ]
    operands = [x, g1r, b1r, wqkv, bqkvr, wproj, bprojr]
    if bias is not None:            # (B, N) fp32 per-key score bias
        # (B, 1, N): Mosaic requires the last two block dims divisible
        # by (8, 128) or equal to the array dims — (1, N) satisfies the
        # latter for any N, where a 2-D (ipp, N) block would not.
        in_specs.append(pl.BlockSpec((ipp, 1, n), lambda i: (i, 0, 0),
                                     memory_space=_vmem(interpret)))
        operands.append(bias.astype(jnp.float32).reshape(b, 1, n))
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, num_heads=num_heads),
        grid=(b // ipp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ipp, n, c), img_block,
            memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (3 * c + c) + 4 * b * n * n * c,
            bytes_accessed=(2 * x.size + wqkv.size + wproj.size)
            * x.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _attn_block(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    return _attn_block_call(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads,
                            interpret)


def _attn_block_fwd(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads,
                    interpret):
    out = _attn_block_call(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads,
                           interpret)
    return out, (x, g1, b1, wqkv, bqkv, wproj, bproj)


def _attn_block_bwd_kernel(x_ref, g_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                           wproj_ref, dx_ref, dwqkv_ref, dbqkv_ref,
                           dwproj_ref, dbproj_ref, dg1_ref, db1_ref, *,
                           num_heads: int):
    """WHOLE attention-block backward in one kernel, one/two images per
    grid step.  The round-2 v1 backward (the default,
    :func:`_attn_block_bwd`) runs the chain rule as XLA matmuls around
    a Pallas attention fwd+bwd kernel, which bounces qkv (B,N,3C), dattn,
    attn and dqkv through HBM between every stage — ~0.7 GB per block at
    b128.  Here the full chain (recompute LN → recompute qkv → attention
    fwd-for-weight-grads + bwd per head → projection grads → qkv grads →
    LN backward) stays VMEM-resident; HBM sees reads of x and g, the
    weight operands (constant index maps — loaded once per launch), one
    dx write, and the weight-gradient ACCUMULATORS, which live in
    constant-index fp32 output blocks revisited across the whole grid
    (the dg2/db2 pattern of :func:`_mlp_block_bwd_kernel`, scaled up to
    the (C, 3C) qkv weight).

    Precision: LN forward/backward and softmax statistics in fp32; the
    q·kᵀ score matmul takes fp32 operands (score precision bounds the
    whole gradient); all other matmuls take compute-dtype operands with
    fp32 accumulation.  With fp32 inputs (CPU tests) every cast is a
    no-op, so the kernel is exact against the jnp oracle there."""
    ipp, n, c = x_ref.shape
    d = c // num_heads
    scale = d ** -0.5

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    x = x_ref[...].reshape(ipp * n, c)
    g = g_ref[...].reshape(ipp * n, c)

    # --- recompute LN forward, keeping the normalization residuals
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    g1f = g1_ref[0].astype(jnp.float32)
    y_c = (xhat * g1f + b1_ref[0].astype(jnp.float32)).astype(x.dtype)

    # --- recompute qkv projection (token-parallel over all ipp images)
    qkv = jax.lax.dot_general(
        y_c, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # --- output-projection data gradient (o = attn @ wproj)
    dattn = jax.lax.dot_general(
        g, wproj_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # --- attention fwd (for the wproj grad) + bwd, heads sliced in VMEM
    attn_rows, dqkv_rows = [], []
    for i in range(ipp):
        qkv_i = qkv[i * n:(i + 1) * n]
        do_i = dattn[i * n:(i + 1) * n]
        attn_h, dq_h, dk_h, dv_h = [], [], [], []
        for h in range(num_heads):
            q = qkv_i[:, h * d:(h + 1) * d]
            k = qkv_i[:, c + h * d:c + (h + 1) * d]
            v = qkv_i[:, 2 * c + h * d:2 * c + (h + 1) * d]
            do = do_i[:, h * d:(h + 1) * d]

            scores = jax.lax.dot_general(
                q * jnp.asarray(scale, q.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # scale=1/8: exact
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            p_c = p.astype(x.dtype)
            attn_h.append(jax.lax.dot_general(
                p_c, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            dv = jax.lax.dot_general(
                p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ).astype(x.dtype)
            dq = jax.lax.dot_general(
                ds, k.astype(x.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q.astype(x.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_h.append(dq.astype(x.dtype))
            dk_h.append(dk.astype(x.dtype))
            dv_h.append(dv.astype(x.dtype))
        attn_rows.append(jnp.concatenate(attn_h, axis=-1))
        dqkv_rows.append(jnp.concatenate(
            [jnp.concatenate(dq_h, axis=-1),
             jnp.concatenate(dk_h, axis=-1),
             jnp.concatenate(dv_h, axis=-1)], axis=-1))
    attn = jnp.concatenate(attn_rows, axis=0)           # (ipp·N, C)
    dqkv = jnp.concatenate(dqkv_rows, axis=0)           # (ipp·N, 3C)

    # --- weight/bias gradient accumulation (fp32, across the whole grid)
    gf = g.astype(jnp.float32)
    dwproj_ref[...] += jax.lax.dot_general(
        attn, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(gf, axis=0, keepdims=True)
    dwqkv_ref[...] += jax.lax.dot_general(
        y_c, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)

    # --- qkv-projection data gradient + LayerNorm backward
    dy = jax.lax.dot_general(
        dqkv, wqkv_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg1_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db1_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * g1f
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (gf + rstd * (dxhat - m1 - xhat * m2)).astype(
        x.dtype).reshape(ipp, n, c)


def _attn_block_bwd_call(x, g, g1, b1, wqkv, bqkv, wproj, num_heads,
                         interpret):
    b, n, c = x.shape
    ipp = 2 if b % 2 == 0 else 1
    g1r, b1r = g1.reshape(1, c), b1.reshape(1, c)
    bqkvr = bqkv.reshape(1, 3 * c)

    def img_block(i):
        return (i, 0, 0)

    io_spec = pl.BlockSpec((ipp, n, c), img_block,
                           memory_space=_vmem(interpret))
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, db1 = pl.pallas_call(
        functools.partial(_attn_block_bwd_kernel, num_heads=num_heads),
        grid=(b // ipp,),
        in_specs=[
            io_spec, io_spec,
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((c, 3 * c), interpret),
            _const_spec((1, 3 * c), interpret),
            _const_spec((c, c), interpret),
        ],
        out_specs=(io_spec,
                   _const_spec((c, 3 * c), interpret),
                   _const_spec((1, 3 * c), interpret),
                   _const_spec((c, c), interpret),
                   _const_spec((1, c), interpret),
                   _const_spec((1, c), interpret),
                   _const_spec((1, c), interpret)),
        out_shape=(jax.ShapeDtypeStruct((b, n, c), x.dtype),
                   jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (3 * 3 * c + 3 * c) + 12 * b * n * n * c,
            bytes_accessed=(3 * x.size + wqkv.size + wproj.size)
            * x.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, g, g1r, b1r, wqkv, bqkvr, wproj)
    return dx, dwqkv, dbqkv.reshape(3 * c), dwproj, dbproj.reshape(c), \
        dg1.reshape(c), db1.reshape(c)


def _attn_block_bwd_fused(num_heads, interpret, res, g):
    """Fully-fused backward (round 2 v2): one Pallas kernel produces dx
    AND every weight/bias gradient — see :func:`_attn_block_bwd_kernel`.

    MEASURED NEGATIVE RESULT (kept, not default — docs/DESIGN.md):
    grad of the 12-block production chain is SLOWER than
    :func:`_attn_block_bwd` at both training and serving batch:
    b32 15.93 vs 12.91 ms, b128 65.88 vs 54.07 ms
    (scripts_dev/bench_attn_bwd_ab.py).  The one-kernel form trades the
    v1 chain's batched (B·N)-row projection matmuls for per-head
    197×64·197 matmuls serialized inside one grid step, takes the score
    matmul at fp32 operand rate (half MXU throughput on the largest
    matmul of the chain), and its 9.5 MB of fp32 weight-grad accumulator
    blocks (constant index maps revisited every grid step) eat the VMEM
    that would otherwise double-buffer x/g block prefetch.  The HBM
    round-trips it saves (~0.7 GB/block at b128) were already hidden
    under the v1 chain's MXU work, so fusing bought bandwidth that was
    not the bottleneck and paid compute for it."""
    x, g1, b1, wqkv, bqkv, wproj, bproj = res
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, db1 = _attn_block_bwd_call(
        x, g, g1, b1, wqkv, bqkv, wproj, num_heads, interpret)
    return (dx, dg1.astype(g1.dtype), db1.astype(b1.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype))


def _attn_block_bwd(num_heads, interpret, res, g):
    """Explicit chain-rule backward (rematerializing — only the block
    inputs were saved).  Structure = :func:`_attn_block_ref` differentiated
    by hand, with one improvement over ``jax.vjp`` of it: the attention
    forward (needed for the projection weight grad) and attention backward
    run as ONE Pallas kernel (``qkv_attention_fwdbwd``) that computes
    softmax(QKᵀ) once per head instead of twice.  All matmuls accumulate
    fp32; LN backward stays fp32 end-to-end.  This is the DEFAULT
    backward: the fully-fused one-kernel variant
    (:func:`_attn_block_bwd_fused`) was built and measured slower —
    see its docstring for the analysis."""
    from dfu_multimodal_tpu.ops.attention import qkv_attention_fwdbwd

    x, g1, b1, wqkv, bqkv, wproj, bproj = res

    # --- recompute LN forward, keeping the normalization residuals
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    g1f, b1f = g1.astype(jnp.float32), b1.astype(jnp.float32)
    y_c = (xhat * g1f + b1f).astype(x.dtype)

    # --- recompute qkv projection
    qkv = (jnp.einsum("bnc,cm->bnm", y_c, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)

    # --- output projection backward (o = attn @ wproj + bproj; out = x + o)
    gf = g.astype(jnp.float32)
    dattn = jnp.einsum("bnm,cm->bnc", g, wproj,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    dbproj = jnp.sum(gf, axis=(0, 1)).astype(bproj.dtype)

    # --- fused attention forward-for-weight-grad + backward
    attn, dqkv = qkv_attention_fwdbwd(qkv, dattn, num_heads, interpret)
    dwproj = jnp.einsum("bnc,bnm->cm", attn, g,
                        preferred_element_type=jnp.float32).astype(
        wproj.dtype)

    # --- qkv projection backward
    dy = jnp.einsum("bnm,cm->bnc", dqkv, wqkv,
                    preferred_element_type=jnp.float32)
    dwqkv = jnp.einsum("bnc,bnm->cm", y_c, dqkv,
                       preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)).astype(
        bqkv.dtype)

    # --- LayerNorm backward
    dg1 = jnp.sum(dy * xhat, axis=(0, 1)).astype(g1.dtype)
    db1 = jnp.sum(dy, axis=(0, 1)).astype(b1.dtype)
    dxhat = dy * g1f
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (gf + rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dg1, db1, dwqkv, dbqkv, dwproj, dbproj


_attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def attn_block(x: jnp.ndarray, g1: jnp.ndarray, b1: jnp.ndarray,
               wqkv: jnp.ndarray, bqkv: jnp.ndarray,
               wproj: jnp.ndarray, bproj: jnp.ndarray,
               num_heads: int, interpret: bool = False,
               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """x + proj(attention(qkv(LN1(x)))) in one VMEM-resident kernel.

    x: (B, N, C) in compute dtype; wqkv (C, 3C) / wproj (C, C) already cast
    to the compute dtype; LN params and biases fp32. Trainable (custom VJP).

    ``bias``: optional fp32 (B, N) additive attention-score bias per KEY
    token (ToMe proportional attention — log token sizes).  The biased
    path is INFERENCE-ONLY (no custom VJP; ToMe itself is serving-only,
    models/vit.py ``token_merge``)."""
    if bias is not None:
        return _attn_block_call(x, g1, b1, wqkv, bqkv, wproj, bproj,
                                num_heads, interpret, bias=bias)
    return _attn_block(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads,
                       interpret)


# ------------------------------------------------------------- MLP block


def _mlp_block_kernel(x_ref, g2_ref, b2_ref, w1_ref, b1_ref, w2_ref, b2b_ref,
                      o_ref, *, hidden_chunks: int):
    x = x_ref[...]                                   # (rows, C) — flattened
    c = x.shape[-1]                                  # tokens, NOT per-image
    hidden = w1_ref.shape[-1]
    chunk = hidden // hidden_chunks

    y = _layernorm_f32(x, g2_ref[0], b2_ref[0]).astype(x.dtype)

    # Chunk the 4C hidden dim so the fp32 GELU intermediate stays small:
    # o += gelu(y @ w1[:, c0:c1] + b1[c0:c1]) @ w2[c0:c1, :], fp32 accum.
    acc = jnp.zeros((x.shape[0], c), jnp.float32)
    for i in range(hidden_chunks):
        h = jax.lax.dot_general(
            y, w1_ref[:, i * chunk:(i + 1) * chunk],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + b1_ref[0, i * chunk:(i + 1) * chunk].astype(jnp.float32)
        h = _gelu_fast(h).astype(x.dtype)
        acc = acc + jax.lax.dot_general(
            h, w2_ref[i * chunk:(i + 1) * chunk, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o = (acc + b2b_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = x + o


def _mlp_block_ref(x, g2, b2, w1, b1, w2, b2b):
    """Plain-jnp oracle matching the kernel numerics."""
    y = _layernorm_f32(x, g2, b2).astype(x.dtype)
    h = jnp.einsum("bnc,cm->bnm", y, w1, preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = _gelu_fast(h).astype(x.dtype)
    o = jnp.einsum("bnm,mc->bnc", h, w2, preferred_element_type=jnp.float32)
    o = (o + b2b.astype(jnp.float32)).astype(x.dtype)
    return x + o


def _mlp_block_call(x, g2, b2, w1, b1, w2, b2b, hidden_chunks, interpret):
    b, n, c = x.shape
    hidden = w1.shape[-1]
    g2r, b2r = g2.reshape(1, c), b2.reshape(1, c)
    b1r, b2br = b1.reshape(1, hidden), b2b.reshape(1, c)

    # The MLP is per-token: flatten (B, N, C) -> (B·N, C) (free reshape)
    # and grid over large aligned row blocks instead of per-image — fewer,
    # fatter grid steps keep the MXU busy.
    rows_total = b * n
    rows = min(384, rows_total)    # 512 rows overflows the 16M VMEM budget
    xf = x.reshape(rows_total, c)

    def row_block(i):
        return (i, 0)

    out = pl.pallas_call(
        functools.partial(_mlp_block_kernel, hidden_chunks=hidden_chunks),
        grid=(pl.cdiv(rows_total, rows),),
        in_specs=[
            pl.BlockSpec((rows, c), row_block,
                         memory_space=_vmem(interpret)),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((c, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((hidden, c), interpret),
            _const_spec((1, c), interpret),
        ],
        out_specs=pl.BlockSpec(
            (rows, c), row_block,
            memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((rows_total, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * hidden,
            bytes_accessed=(2 * x.size + w1.size + w2.size)
            * x.dtype.itemsize,
            transcendentals=b * n * hidden),
        interpret=interpret,
    )(xf, g2r, b2r, w1, b1r, w2, b2br)
    return out.reshape(b, n, c)


def _gelu_fast_grad(x):
    """d/dx of :func:`_gelu_fast` (analytic), fp32 in/out."""
    z = x * (1.5976 + 0.07056 * x * x)
    s = jax.nn.sigmoid(z)
    dz = 1.5976 + 3 * 0.07056 * x * x
    return s + x * s * (1.0 - s) * dz


def _mlp_block_bwd_kernel(x_ref, g_ref, g2_ref, b2_ref, w1_ref, b1_ref,
                          w2_ref, dx_ref, y_ref, h_ref, dhpre_ref,
                          dg2_ref, db2_ref, *, hidden_chunks: int):
    """Fused MLP-block backward, one row-block per grid step.

    Emits the data gradient dx (LN backward included) plus the three
    VMEM-recomputed tensors the weight-gradient matmuls need — y = LN(x),
    h = gelu(fc1), dh_pre — in the compute dtype, so XLA's big-K matmuls
    (dw1 = yᵀ·dh_pre, dw2 = hᵀ·g) read clean bf16 operands and no fp32
    GELU/LN intermediate ever reaches HBM.  dg2/db2 accumulate across the
    whole grid in constant-index fp32 output blocks."""
    rows, c = x_ref.shape
    hidden = w1_ref.shape[-1]
    chunk = hidden // hidden_chunks

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    g = g_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    g2f = g2_ref[0].astype(jnp.float32)
    y_c = (xhat * g2f + b2_ref[0].astype(jnp.float32)).astype(x.dtype)
    y_ref[...] = y_c

    dy = jnp.zeros((rows, c), jnp.float32)
    for j in range(hidden_chunks):
        sl = slice(j * chunk, (j + 1) * chunk)
        hpre = jax.lax.dot_general(
            y_c, w1_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hpre = hpre + b1_ref[0, sl].astype(jnp.float32)
        h_ref[:, sl] = _gelu_fast(hpre).astype(x.dtype)
        dh = jax.lax.dot_general(
            g, w2_ref[sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (rows, chunk)
        dhpre = (dh * _gelu_fast_grad(hpre)).astype(x.dtype)
        dhpre_ref[:, sl] = dhpre
        dy = dy + jax.lax.dot_general(
            dhpre, w1_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (rows, c)

    dg2_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * g2f
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (g.astype(jnp.float32)
                   + rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)


def _mlp_block_bwd_call(x, g, g2, b2, w1, b1, w2, hidden_chunks, interpret):
    b, n, c = x.shape
    hidden = w1.shape[-1]
    rows_total = b * n
    # Row blocks must tile the grid evenly (a partial tail block would feed
    # padding garbage into the dg2/db2 accumulators), so zero-pad to a
    # multiple of the block size.  Zero x/g rows are gradient-neutral:
    # g=0 ⇒ dh_pre=0 ⇒ they contribute nothing to any weight/bias grad,
    # and the padded dx rows are sliced off below.
    rows = min(128, rows_total)   # 256/384 swept at b32: equal (±0.1 ms)
    padded = -(-rows_total // rows) * rows
    xf_ = x.reshape(rows_total, c)
    gf_ = g.reshape(rows_total, c)
    if padded != rows_total:
        pad = ((0, padded - rows_total), (0, 0))
        xf_ = jnp.pad(xf_, pad)
        gf_ = jnp.pad(gf_, pad)
    padded_total = padded
    g2r, b2r = g2.reshape(1, c), b2.reshape(1, c)
    b1r = b1.reshape(1, hidden)

    def row_block(i):
        return (i, 0)

    def rows_spec(width):
        return pl.BlockSpec((rows, width), row_block,
                            memory_space=_vmem(interpret))

    dx, y, h, dhpre, dg2, db2 = pl.pallas_call(
        functools.partial(_mlp_block_bwd_kernel,
                          hidden_chunks=hidden_chunks),
        grid=(padded_total // rows,),
        in_specs=[
            rows_spec(c), rows_spec(c),
            _const_spec((1, c), interpret), _const_spec((1, c), interpret),
            _const_spec((c, hidden), interpret),
            _const_spec((1, hidden), interpret),
            _const_spec((hidden, c), interpret),
        ],
        out_specs=(rows_spec(c), rows_spec(c), rows_spec(hidden),
                   rows_spec(hidden),
                   _const_spec((1, c), interpret),
                   _const_spec((1, c), interpret)),
        out_shape=(jax.ShapeDtypeStruct((padded_total, c), x.dtype),
                   jax.ShapeDtypeStruct((padded_total, c), x.dtype),
                   jax.ShapeDtypeStruct((padded_total, hidden), x.dtype),
                   jax.ShapeDtypeStruct((padded_total, hidden), x.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * c * hidden,
            bytes_accessed=(4 * x.size + 2 * rows_total * hidden
                            + w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=2 * b * n * hidden),
        interpret=interpret,
    )(xf_, gf_, g2r, b2r, w1, b1r, w2)
    # y/h/dhpre keep their padded rows — the zero-padded g rows make them
    # weight-grad-neutral, so the downstream einsums can consume them as-is.
    return (dx[:rows_total].reshape(b, n, c), y, h, dhpre, dg2.reshape(c),
            db2.reshape(c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp_block(x, g2, b2, w1, b1, w2, b2b, hidden_chunks, interpret):
    return _mlp_block_call(x, g2, b2, w1, b1, w2, b2b, hidden_chunks,
                           interpret)


def _mlp_block_fwd(x, g2, b2, w1, b1, w2, b2b, hidden_chunks, interpret):
    out = _mlp_block_call(x, g2, b2, w1, b1, w2, b2b, hidden_chunks,
                          interpret)
    return out, (x, g2, b2, w1, b1, w2, b2b)


def _mlp_block_bwd(hidden_chunks, interpret, res, g):
    """Fused backward: the Pallas kernel produces dx + the bf16 operands
    (y, h, dh_pre) for the weight-grad matmuls, which run as two big-K XLA
    einsums.  5 matmul-equivalents total — same flops as ``jax.vjp`` of the
    remat oracle, but zero fp32 LN/GELU intermediates in HBM."""
    x, g2, b2, w1, b1, w2, b2b = res
    b, n, c = x.shape
    dx, y, h, dhpre, dg2, db2 = _mlp_block_bwd_call(
        x, g, g2, b2, w1, b1, w2, hidden_chunks, interpret)
    rows = b * n
    g2d = g.reshape(rows, c)
    if y.shape[0] != rows:       # kernel zero-padded the rows; match it
        g2d = jnp.pad(g2d, ((0, y.shape[0] - rows), (0, 0)))
    dw1 = jnp.einsum("rc,rh->ch", y, dhpre,
                     preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dhpre.astype(jnp.float32), axis=0).astype(b1.dtype)
    dw2 = jnp.einsum("rh,rc->hc", h, g2d,
                     preferred_element_type=jnp.float32).astype(w2.dtype)
    db2b = jnp.sum(g2d.astype(jnp.float32), axis=0).astype(b2b.dtype)
    return (dx, dg2.astype(g2.dtype), db2.astype(b2.dtype), dw1, db1, dw2,
            db2b)


_mlp_block.defvjp(_mlp_block_fwd, _mlp_block_bwd)


def mlp_block(x: jnp.ndarray, g2: jnp.ndarray, b2: jnp.ndarray,
              w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2b: jnp.ndarray,
              hidden_chunks: int = 4, interpret: bool = False) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN2(x)))) in one VMEM-resident kernel.

    x: (B, N, C); w1 (C, H) / w2 (H, C) already cast to the compute dtype;
    LN params and biases fp32. Trainable (custom VJP).
    """
    return _mlp_block(x, g2, b2, w1, b1, w2, b2b, hidden_chunks, interpret)
