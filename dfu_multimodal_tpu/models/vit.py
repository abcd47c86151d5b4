"""ViT-B/16 in Flax, TPU-first.

Behavioral counterpart of the reference thermal backbone (timm
``vit_base_patch16_224``, reference notebooks/train_thermal_only.py:188-205):
224x224 -> 14x14 patches + CLS token = 197 tokens, 12 pre-LN encoder blocks,
12 heads, MLP ratio 4, GELU, CLS-token classification.

TPU-first choices:
- patch embedding is a single reshaped matmul (B*196, 768) @ (768, 768) —
  one big MXU op instead of a conv;
- attention is pluggable: ``attention_impl='pallas'`` uses the fused
  flash-attention kernel in :mod:`dfu_multimodal_tpu.ops.attention`
  (single-block over the full 197-token sequence — the kernel runs the
  RAW token count, no padding or masking; Mosaic handles the unaligned
  row dimension), ``'xla'``
  uses a plain einsum-softmax that XLA fuses well at this size;
- qkv is computed as one fused (B, N, 3*768) projection;
- compute dtype configurable (bfloat16 default for training), params fp32.

Grad-CAM: the reference hooks ``blocks`` whose (B, N, C) output is not 4-D,
so it falls back to input-gradient saliency (grad_cam_visualization.py:401-413).
We tap both ``blocks`` (final encoder output) and rely on the same
input-saliency fallback in eval/gradcam.py for behavioral parity.
"""

from __future__ import annotations

import os
from dataclasses import field
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps, canonical_dtype, tap


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain softmax attention. q,k,v: (B, H, N, D) -> (B, H, N, D).
    ``bias``: optional (B, N) additive score bias per KEY token (ToMe
    proportional attention — log token sizes, Bolya et al. ICLR'23 §3)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[:, None, None, :]
    probs = nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def resolve_attention_impl(impl: str) -> str:
    """'auto' -> 'pallas'/'xla' by the Mosaic-under-SPMD rule
    (models/common.py::mosaic_kernels_ok) — the ONE place that policy
    lives; explicit impls pass through."""
    if impl == "auto":
        from dfu_multimodal_tpu.models.common import mosaic_kernels_ok
        return "pallas" if mosaic_kernels_ok() else "xla"
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown attention impl: {impl!r}")
    return impl


class MultiHeadAttention(nn.Module):
    num_heads: int = 12
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)

        impl = resolve_attention_impl(self.attention_impl)

        if impl == "pallas" and bias is None:
            # Packed-qkv kernel: heads are sliced inside VMEM, so no
            # (B,N,3C)->(B,H,N,D) transposes ever hit HBM (measured at
            # ~half the MHA block cost, docs/DESIGN.md).  The biased
            # (ToMe proportional) case runs the XLA path below — the
            # production ToMe trunks use the FUSED blocks, whose kernels
            # take the bias natively (ops/vit_block.py).
            from dfu_multimodal_tpu.ops.attention import qkv_attention
            out = qkv_attention(qkv, self.num_heads)
        else:
            # reaches here with impl == "xla", or "pallas" + bias
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            out = xla_attention(q, k, v, bias)           # (B, H, N, D)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        if self.calibrate:
            self.sow("calibration", "proj_in",
                     jnp.max(jnp.abs(out.astype(jnp.float32))))
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class _LNParams(nn.Module):
    """Parameter holder producing the exact tree of ``nn.LayerNorm``."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder producing the exact tree of ``nn.Dense``."""

    features: int

    @nn.compact
    def __call__(self, c: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _AttnParams(nn.Module):
    """Mirrors MultiHeadAttention's param tree (attn/{qkv,proj})."""

    @nn.compact
    def __call__(self, c: int):
        return (_DenseParams(3 * c, name="qkv")(c),
                _DenseParams(c, name="proj")(c))


class FusedEncoderBlock(nn.Module):
    """EncoderBlock computed by the fused Pallas block kernels
    (ops/vit_block.py): LN1+qkv+attention+proj+residual in one kernel,
    LN2+MLP+residual in another — no LayerNorm/GELU/residual intermediate
    ever reaches HBM.  Declares the SAME param tree as :class:`EncoderBlock`
    (checkpoints, converters and TP sharding rules apply unchanged).
    Trainable: both kernels carry a rematerializing custom VJP."""

    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        from dfu_multimodal_tpu.ops.vit_block import attn_block, mlp_block

        # A (tokens, attn_bias) tuple carry threads the ToMe proportional-
        # attention bias through the scanned stack (models/vit.py
        # token_merge with tome_prop_attn); a bare array is the default.
        x, attn_bias = x if isinstance(x, tuple) else (x, None)
        c = x.shape[-1]
        g1, be1 = _LNParams(name="norm1")(c)
        (wqkv, bqkv), (wproj, bproj) = _AttnParams(name="attn")(c)
        g2, be2 = _LNParams(name="norm2")(c)
        w1, b1 = _DenseParams(self.mlp_ratio * c, name="mlp_fc1")(c)
        w2, b2 = _DenseParams(c, name="mlp_fc2")(self.mlp_ratio * c)

        dt = canonical_dtype(self.dtype)
        x = attn_block(x, g1, be1, wqkv.astype(dt), bqkv, wproj.astype(dt),
                       bproj, num_heads=self.num_heads,
                       interpret=self.interpret, bias=attn_bias)
        x = mlp_block(x, g2, be2, w1.astype(dt), b1, w2.astype(dt), b2,
                      interpret=self.interpret)
        return ((x, attn_bias) if attn_bias is not None else x), None


class _QDenseParams(nn.Module):
    """Int8 dense params: per-output-channel quantized kernel + scales.
    Tree: {kernel_q8 int8, scale f32, bias f32} — produced from a trained
    fp32 tree by :func:`quantize_encoder_params` at model-load time."""

    features: int

    @nn.compact
    def __call__(self, c: int):
        kernel = self.param("kernel_q8", nn.initializers.zeros,
                            (c, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, scale, bias


class _QAttnParams(nn.Module):
    @nn.compact
    def __call__(self, c: int):
        return (_QDenseParams(3 * c, name="qkv")(c),
                _QDenseParams(c, name="proj")(c))


class QuantizedEncoderBlock(nn.Module):
    """Serving-only int8 encoder block (ops/vit_block_q8.py): int8 MXU
    matmuls at 2x the bf16 rate on v5e; attention stays bf16/fp32.
    Parameters are the int8 tree of :class:`_QDenseParams` — convert a
    trained fp32 tree with :func:`quantize_encoder_params`."""

    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        from dfu_multimodal_tpu.ops.vit_block_q8 import (attn_block_q8,
                                                         mlp_block_q8)

        x, attn_bias = x if isinstance(x, tuple) else (x, None)
        c = x.shape[-1]
        g1, be1 = _LNParams(name="norm1")(c)
        (qkv_q, qkv_s, qkv_b), (pr_q, pr_s, pr_b) = _QAttnParams(
            name="attn")(c)
        g2, be2 = _LNParams(name="norm2")(c)
        w1_q, s1, b1 = _QDenseParams(self.mlp_ratio * c, name="mlp_fc1")(c)
        w2_q, s2, b2 = _QDenseParams(c, name="mlp_fc2")(self.mlp_ratio * c)

        x = attn_block_q8(x, g1, be1, qkv_q, qkv_s, qkv_b, pr_q, pr_s, pr_b,
                          num_heads=self.num_heads, interpret=self.interpret,
                          bias=attn_bias)
        x = mlp_block_q8(x, g2, be2, w1_q, s1, b1, w2_q, s2, b2,
                         interpret=self.interpret)
        return ((x, attn_bias) if attn_bias is not None else x), None


class StaticQuantizedEncoderBlock(nn.Module):
    """Int8 encoder block with CALIBRATED static activation scales
    (ops/vit_block_q8.py q8s kernels): no per-row absmax reductions or
    rank-1 dequants inside the kernels — the act scales are folded into
    the per-channel weight scales at conversion time, and a (4,)
    ``act_scales`` param = [s_ln1, s_attn, s_ln2, s_gelu] provides the
    quantization reciprocals.  Parameters from
    :func:`quantize_encoder_params` with ``act_absmax`` calibration."""

    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        from dfu_multimodal_tpu.ops.vit_block_q8 import (attn_block_q8s,
                                                         mlp_block_q8s)

        x, attn_bias = x if isinstance(x, tuple) else (x, None)
        c = x.shape[-1]
        g1, be1 = _LNParams(name="norm1")(c)
        (qkv_q, qkv_s, qkv_b), (pr_q, pr_s, pr_b) = _QAttnParams(
            name="attn")(c)
        g2, be2 = _LNParams(name="norm2")(c)
        w1_q, s1, b1 = _QDenseParams(self.mlp_ratio * c, name="mlp_fc1")(c)
        w2_q, s2, b2 = _QDenseParams(c, name="mlp_fc2")(self.mlp_ratio * c)
        a = self.param("act_scales", nn.initializers.ones, (4,), jnp.float32)

        x = attn_block_q8s(x, g1, be1, qkv_q, qkv_s, qkv_b, pr_q, pr_s,
                           pr_b, 1.0 / a[:2], num_heads=self.num_heads,
                           interpret=self.interpret, bias=attn_bias)
        x = mlp_block_q8s(x, g2, be2, w1_q, s1, b1, w2_q, s2, b2,
                          1.0 / a[2:], interpret=self.interpret)
        return ((x, attn_bias) if attn_bias is not None else x), None


def quantize_encoder_params(trunk_params, act_absmax=None):
    """fp32 ViT-trunk param tree -> the int8 tree QuantizedEncoderBlock
    (or, with ``act_absmax`` calibration, StaticQuantizedEncoderBlock)
    expects. Handles both block layouts: scanned (one ``encoder`` scope,
    kernels stacked (depth, K, M)) and unrolled (``block0..N-1`` scopes).
    Run ONCE at model-load time — requantizing inside the serving step
    would cost as much HBM traffic as the int8 matmuls save.

    ``act_absmax``: the trunk's ``calibration`` collection from a
    ``ViT(calibrate=True)`` pass (absmax per quantization point).  When
    given, activation scales are folded into the per-channel weight
    scales and stored per block as ``act_scales`` = [ln1, attn, ln2,
    gelu] — the static kernels then skip all dynamic absmax work."""
    import jax

    from dfu_multimodal_tpu.ops.vit_block_q8 import quantize_weight

    def q(dense, act=None):
        w = dense["kernel"]
        kq, s = (jax.vmap(quantize_weight)(w) if w.ndim == 3  # scanned stack
                 else quantize_weight(w))
        if act is not None:
            s = s * (act[:, None] if s.ndim == 2 else act)
        return {"kernel_q8": kq, "scale": s, "bias": dense["bias"]}

    def first(x):
        return x[0] if isinstance(x, (tuple, list)) else x

    def q_block(blk, cal=None):
        if cal is None:
            acts = {"qkv": None, "proj": None, "fc1": None, "fc2": None}
            extra = {}
        else:
            a = {
                "qkv": jnp.maximum(
                    jnp.asarray(first(cal["ln1_out"])), 1e-6) / 127.0,
                "proj": jnp.maximum(
                    jnp.asarray(first(cal["attn"]["proj_in"])), 1e-6) / 127.0,
                "fc1": jnp.maximum(
                    jnp.asarray(first(cal["ln2_out"])), 1e-6) / 127.0,
                "fc2": jnp.maximum(
                    jnp.asarray(first(cal["gelu_out"])), 1e-6) / 127.0,
            }
            acts = a
            extra = {"act_scales": jnp.stack(
                [a["qkv"], a["proj"], a["fc1"], a["fc2"]], axis=-1)}
        return {
            **{k: v for k, v in blk.items()
               if k not in ("attn", "mlp_fc1", "mlp_fc2")},
            "attn": {"qkv": q(blk["attn"]["qkv"], acts["qkv"]),
                     "proj": q(blk["attn"]["proj"], acts["proj"])},
            "mlp_fc1": q(blk["mlp_fc1"], acts["fc1"]),
            "mlp_fc2": q(blk["mlp_fc2"], acts["fc2"]),
            **extra,
        }

    block_scopes = [k for k in trunk_params
                    if k == "encoder" or k.startswith("block")]
    if not block_scopes:
        raise ValueError("no encoder/blockN scopes in ViT trunk params")
    return {**{k: v for k, v in trunk_params.items()
               if k not in block_scopes},
            **{k: q_block(trunk_params[k],
                          act_absmax.get(k) if act_absmax else None)
               for k in block_scopes}}


def vit_config_from_params(trunk_params, num_heads: int | None = None):
    """Derive a ViT architecture dict from a trunk param tree so calibration
    and conversion never assume ViT-B/16: ``hidden_dim`` and ``patch_size``
    from the patch-embed kernel, ``depth`` from the scanned stack (or the
    number of blockN scopes), ``mlp_ratio`` from fc1.  ``num_heads`` is not
    recoverable from shapes — defaults to hidden_dim // 64 (the universal
    ViT head size) unless given."""
    pe = trunk_params["patch_embed"]["kernel"]
    in_dim, hidden = int(pe.shape[0]), int(pe.shape[1])
    patch = int(round((in_dim / 3) ** 0.5))
    if patch * patch * 3 != in_dim:
        raise ValueError(f"patch_embed input dim {in_dim} is not p*p*3")
    if "encoder" in trunk_params:                       # scanned stack
        fc1 = trunk_params["encoder"]["mlp_fc1"]["kernel"]
        depth, mlp_hidden = int(fc1.shape[0]), int(fc1.shape[-1])
    else:
        blocks = [k for k in trunk_params if k.startswith("block")]
        depth = len(blocks)
        mlp_hidden = int(trunk_params[blocks[0]]["mlp_fc1"]["kernel"].shape[-1])
    return dict(patch_size=patch, hidden_dim=hidden, depth=depth,
                num_heads=num_heads or max(hidden // 64, 1),
                mlp_ratio=mlp_hidden // hidden)


def calibrate_vit_absmax(trunk_params, batches, dtype=jnp.float32,
                         attention_impl: str = "xla",
                         num_heads: int | None = None):
    """Run NORMALIZED image batches through the fp32/bf16 flax trunk in
    calibration mode; returns the running-max ``calibration`` tree that
    :func:`quantize_encoder_params` consumes as ``act_absmax``.  The ViT
    architecture is derived from ``trunk_params`` (any depth/width/patch
    size), not assumed to be ViT-B/16."""
    import jax

    vit = ViT(dtype=dtype, attention_impl=attention_impl,
              block_impl="flax", calibrate=True,
              scan_blocks="encoder" in trunk_params,
              **vit_config_from_params(trunk_params, num_heads))
    merged = None
    for x in batches:
        _, aux = vit.apply({"params": trunk_params}, x, train=False,
                           mutable=["calibration"])
        cal = aux["calibration"]
        merged = cal if merged is None else jax.tree.map(
            jnp.maximum, merged, cal)
    if merged is None:
        # an empty (or already-exhausted generator) batch iterable would
        # otherwise return None and the caller would silently build the
        # DYNAMIC-quant tree when static calibration was requested —
        # failing much later inside apply with a missing 'act_scales'
        raise ValueError(
            "calibrate_vit_absmax got zero calibration batches "
            "(empty or exhausted iterable)")
    return merged


def quantize_variables(variables, trunk_names=("ViT_0", "thermal_branch"),
                       calib_batches=None, dtype=jnp.float32,
                       attention_impl: str = "xla"):
    """Quantize every ViT trunk in a model's variables for the int8
    serving path. Returns new variables; the fp32 originals are untouched.

    Without ``calib_batches``: dynamic per-row activation quantization
    (``block_impl="fused_q8"``).  With ``calib_batches`` (iterable of
    normalized image batches): static calibrated activation scales
    (``block_impl="fused_q8s"`` — no absmax work in the kernels)."""
    params = variables["params"]
    new = {k: v for k, v in params.items()}
    for name in trunk_names:
        if name in params and any(
                k == "encoder" or k.startswith("block")
                for k in params[name]):
            absmax = None
            if calib_batches is not None:
                absmax = calibrate_vit_absmax(
                    params[name], calib_batches, dtype=dtype,
                    attention_impl=attention_impl)
            new[name] = quantize_encoder_params(params[name], absmax)
    return {**{k: v for k, v in variables.items() if k != "params"},
            "params": new}


def split_encoder_variables(variables, merge_at: int):
    """Load-time transformation for the token-merge serving path: split
    every ViT trunk's stacked ``encoder`` params (depth, ...) into
    ``encoder`` ``[:merge_at]`` + ``encoder2`` ``[merge_at:]`` — the tree
    a ``token_merge=(merge_at, keep)`` model declares. Same pattern as
    :func:`quantize_variables` (restore the plain checkpoint, transform,
    apply with the reconfigured module); composes with the int8 trees
    (the split is purely structural). Returns new variables."""
    import jax

    params = variables["params"]
    new = {}
    for name, sub in params.items():
        if isinstance(sub, dict) and "encoder" in sub:
            enc = sub["encoder"]
            depth = jax.tree.leaves(enc)[0].shape[0]
            if not 0 < merge_at < depth:
                raise ValueError(
                    f"merge_at={merge_at} outside (0, {depth})")
            rest = {k: v for k, v in sub.items() if k != "encoder"}
            rest["encoder"] = jax.tree.map(lambda p: p[:merge_at], enc)
            rest["encoder2"] = jax.tree.map(lambda p: p[merge_at:], enc)
            new[name] = rest
        else:
            new[name] = sub
    return {**{k: v for k, v in variables.items() if k != "params"},
            "params": new}


class EncoderBlock(nn.Module):
    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    # calibrate=True sows each quantization point's absmax into the
    # ``calibration`` collection — the static int8 converter
    # (quantize_encoder_params with act calibration) reads these.
    calibrate: bool = False

    def _cal(self, name, x):
        if self.calibrate:
            self.sow("calibration", name,
                     jnp.max(jnp.abs(x.astype(jnp.float32))))

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        """(carry, None) -> (carry, None): scan-compatible signature so the
        12 blocks compile as ONE scanned program (one Pallas payload instead
        of twelve — essential for compile size/time, and the idiomatic TPU
        layer-stacking pattern).  The carry is either the token array or a
        (tokens, attn_bias) tuple — the latter threads the ToMe
        proportional-attention bias (log token sizes) through the stack."""
        x, attn_bias = x if isinstance(x, tuple) else (x, None)
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        self._cal("ln1_out", y)
        x = x + MultiHeadAttention(self.num_heads, self.dtype,
                                   self.attention_impl,
                                   calibrate=self.calibrate,
                                   name="attn")(y, attn_bias)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        self._cal("ln2_out", y)
        y = nn.Dense(self.mlp_ratio * c, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        self._cal("gelu_out", y)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(y)
        out = x + y
        return ((out, attn_bias) if attn_bias is not None else out), None


class ViT(nn.Module):
    """ViT trunk returning CLS features (B, hidden)."""

    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    # Block implementation: "flax" composes nn.Dense/nn.LayerNorm (+ the
    # pluggable attention kernel); "fused" runs the two fused Pallas block
    # kernels of ops/vit_block.py (whole block VMEM-resident).  "auto" =
    # fused on TPU, flax elsewhere.  "fused_interpret" forces the fused
    # path through the Pallas interpreter (CPU numerics tests).
    block_impl: str = "auto"
    # Scanned blocks are the default EVERYWHERE (O(1) program size and
    # compile time) — the program shape TPU production runs. The
    # DFU_VIT_SCAN_BLOCKS=0 unroll escape hatch remains for debugging;
    # the historical XLA:CPU SIGABRT that used to force it in CI was
    # root-caused to the virtual-device collective rendezvous terminate
    # timeout under host oversubscription, fixed by raising
    # --xla_cpu_collective_call_terminate_timeout_seconds (see
    # tests/conftest.py for the analysis).
    scan_blocks: bool = field(
        default_factory=lambda: os.environ.get(
            "DFU_VIT_SCAN_BLOCKS", "1") != "0")
    # calibration mode (flax blocks only): sow per-block activation
    # absmaxes for the static int8 converter
    calibrate: bool = False
    # Inference-only token merging (ops/token_merge.py, ToMe-style):
    # (merge_at, keep) runs blocks [0, merge_at) on the full 197 tokens,
    # bipartite-merges down to ``keep`` tokens, and runs the remaining
    # blocks at the reduced count — measured 1.33-1.47x on the 12-block
    # fused encoder chain at b128 (scripts_dev/bench_tome.py). The param
    # tree splits into ``encoder``/``encoder2`` stacks; serving code
    # transforms restored checkpoints with :func:`split_encoder_variables`
    # (the quantize_variables pattern). Requires scan_blocks.
    token_merge: Optional[Tuple[int, int]] = None
    # ToMe PROPORTIONAL attention (Bolya et al. ICLR'23 §3, the full
    # recipe): post-merge blocks add log(token size) to each KEY's
    # attention scores, so a token representing s patches draws s× the
    # softmax mass it would as one patch.  Opt-in (default off keeps
    # round-3 ToMe behavior bit-identical); only meaningful with
    # token_merge.  All three block families take the bias natively
    # (ops/vit_block.py, ops/vit_block_q8.py).
    tome_prop_attn: bool = False

    def _resolve_block(self):
        """Returns (block_cls, block_args) for the configured impl."""
        impl = self.block_impl
        if impl == "auto":
            from dfu_multimodal_tpu.models.common import mosaic_kernels_ok
            impl = "fused" if mosaic_kernels_ok() else "flax"
        dtype = canonical_dtype(self.dtype)
        if impl == "flax":
            return EncoderBlock, (self.num_heads, self.mlp_ratio, dtype,
                                  self.attention_impl, self.calibrate)
        if impl in ("fused", "fused_interpret"):
            return FusedEncoderBlock, (self.num_heads, self.mlp_ratio, dtype,
                                       impl == "fused_interpret")
        if impl in ("fused_q8", "fused_q8_interpret"):
            return QuantizedEncoderBlock, (self.num_heads, self.mlp_ratio,
                                           dtype,
                                           impl == "fused_q8_interpret")
        if impl in ("fused_q8s", "fused_q8s_interpret"):
            return StaticQuantizedEncoderBlock, (
                self.num_heads, self.mlp_ratio, dtype,
                impl == "fused_q8s_interpret")
        raise ValueError(f"unknown block impl: {impl!r}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None,
                 keep_ids: Optional[jnp.ndarray] = None,
                 return_tokens: bool = False) -> jnp.ndarray:
        """``keep_ids`` (B, K) int32 patch indices: after positional
        embedding, keep only those patch tokens (CLS always kept) — the
        masked-autoencoder pretraining path (train/ssl.py), where the
        encoder sees the visible 25% of patches.  ``return_tokens``
        returns the full post-norm token sequence (B, 1+K, hidden)
        instead of the CLS feature.  Both default off; the classifier
        forward is unchanged."""
        dtype = canonical_dtype(self.dtype)
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p

        # Patch embedding as one matmul: (B, gh, gw, p*p*c) @ (p*p*c, hidden)
        x = x.astype(dtype)
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        x = nn.Dense(self.hidden_dim, dtype=dtype, param_dtype=jnp.float32,
                     name="patch_embed")(x)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.hidden_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.hidden_dim)).astype(dtype), x],
            axis=1)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, gh * gw + 1, self.hidden_dim), jnp.float32)
        x = x + pos_embed.astype(dtype)

        if keep_ids is not None:
            # Gather the visible patch tokens (pos-embed already added, so
            # each kept token carries its original position).  Static K
            # keeps the program shape fixed under jit.
            cls_tok, patches = x[:, :1], x[:, 1:]
            patches = jnp.take_along_axis(
                patches, keep_ids[:, :, None].astype(jnp.int32), axis=1)
            x = jnp.concatenate([cls_tok, patches], axis=1)

        block_cls, block_args = self._resolve_block()
        if self.token_merge is not None:
            # Inference-only ToMe path: the depth splits into two scanned
            # stacks around one bipartite merge (static shapes: N then
            # ``keep``). Checkpoints store one (depth, ...) stack — load
            # through split_encoder_variables.
            from dfu_multimodal_tpu.ops.token_merge import bipartite_merge
            if not self.scan_blocks:
                raise ValueError("token_merge requires scan_blocks")
            merge_at, keep = self.token_merge
            if not 0 < merge_at < self.depth:
                raise ValueError(f"merge_at must be in (0, {self.depth})")
            r = x.shape[1] - keep
            if r < 0:
                raise ValueError(
                    f"keep={keep} exceeds the {x.shape[1]} tokens")

            def scan_of(length):
                return nn.scan(
                    block_cls,
                    variable_axes={"params": 0, "calibration": 0},
                    split_rngs={"params": True},
                    length=length,
                    metadata_params={nn.PARTITION_NAME: None},
                )
            x, _ = scan_of(merge_at)(*block_args, name="encoder")(x, None)
            sizes = jnp.ones(x.shape[:2], jnp.float32)
            x, sizes = bipartite_merge(x, sizes, r)
            if self.tome_prop_attn:
                # proportional attention: carry (tokens, log sizes)
                # through the post-merge stack
                carry, _ = scan_of(self.depth - merge_at)(
                    *block_args, name="encoder2")((x, jnp.log(sizes)),
                                                  None)
                x, _ = carry
            else:
                x, _ = scan_of(self.depth - merge_at)(
                    *block_args, name="encoder2")(x, None)
        elif self.scan_blocks:
            # One scanned block: params stacked (depth, ...), a single
            # compiled body — compile time and program size are O(1) in
            # depth instead of O(depth).
            ScannedBlocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "calibration": 0},
                split_rngs={"params": True},
                length=self.depth,
                metadata_params={nn.PARTITION_NAME: None},
            )
            x, _ = ScannedBlocks(*block_args, name="encoder")(x, None)
        else:
            for i in range(self.depth):
                x, _ = block_cls(*block_args, name=f"block{i}")(x)
        x = tap(self, "blocks", x, taps)

        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        if return_tokens:
            return x.astype(jnp.float32)     # (B, 1+K, hidden)
        return x[:, 0].astype(jnp.float32)   # CLS token features


def ViTBase16(dtype: Any = jnp.float32, attention_impl: str = "auto",
              block_impl: str = "auto", **kwargs) -> ViT:
    return ViT(dtype=dtype, attention_impl=attention_impl,
               block_impl=block_impl, **kwargs)


class ViTClassifier(nn.Module):
    """ViT-B/16 trunk + Dropout + Linear(768 -> num_classes) head — the
    reference's ``ThermalOnlyModel`` contract (train_thermal_only.py:188-205)."""

    num_classes: int = 2
    drop_rate: float = 0.5
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    block_impl: str = "auto"
    token_merge: Optional[Tuple[int, int]] = None
    tome_prop_attn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        feats = ViTBase16(self.dtype, self.attention_impl, self.block_impl,
                          token_merge=self.token_merge,
                          tome_prop_attn=self.tome_prop_attn)(
            x, train=train, taps=taps)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(feats)
