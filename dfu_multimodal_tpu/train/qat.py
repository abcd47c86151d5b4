"""Quantization-aware training: straight-through fake-quant on the int8
serving grid.

The int8 serving path (models/vit.py::quantize_variables ->
ops/vit_block_q8.py) quantizes every encoder Dense kernel per-output-
channel symmetric int8 at model-load time.  QAT makes that conversion
free: during training the loss is computed through weights SNAPPED to
exactly that grid (round/clip in the forward, identity gradient via the
straight-through estimator), so the trained weights are robust to — and
after convergence essentially ON — the serving grid, and
``quantize_weight`` roundtrips them losslessly (the absmax element maps
to exactly ±127·scale, so requantization reproduces the same scale).

TPU-native mechanics: this is a pure functional param transform applied
inside the jitted train step — no module changes, no Python-level hooks
(the reference framework would wrap layers; here the transform is traced
once and XLA fuses the round/clip into the parameter load).  Scope:

- ViT trunks: every encoder Dense kernel on the
  ops/vit_block_q8.py::quantize_weight grid.
- ResNet trunks (round 3): every stage conv kernel on the
  models/resnet_q8.py::quantize_conv_weight grid.  The serving path
  folds BatchNorm BEFORE quantizing, which a training-time transform
  cannot do while BN statistics are still moving — but it does not have
  to: the fold multiplies each OUTPUT channel by one scalar
  s_c = gamma_c * rsqrt(var_c + eps), and per-output-channel symmetric
  quantization is equivariant under per-channel scaling
  (absmax(w_c * s_c) = |s_c| * absmax(w_c), and round/clip commute with
  the sign — jnp.round is symmetric), so
  quantdequant(w * s) == quantdequant(w) * s  exactly.  Fake-quanting
  the UNFOLDED kernel therefore injects bit-exactly the relative error
  serving's fold-then-quantize produces, whatever BN converges to.
  The stem conv is excluded (serving keeps it bf16,
  models/resnet_q8.py:22-23).  Activation scales remain post-training
  calibration (static per-tensor; their error is input- not
  weight-dependent, so training cannot pre-absorb it the same way).

No reference counterpart (the reference has no quantized serving at all);
this closes the loop on the framework's own "<1% typical accuracy cost"
int8 contract by making the cost trainable to ~0.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def fake_quant_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Snap a Dense kernel to the serving int8 grid with an identity
    (straight-through) gradient.

    Grid = ops/vit_block_q8.py::quantize_weight: per-output-channel
    symmetric, scale = absmax/127 over the reduction axis (axis -2 — for
    scanned stacks (depth, K, M) that is K, matching the vmapped
    quantizer).  ``stop_gradient`` carries the quantization error forward
    only; d(loss)/dw flows as if the transform were identity.
    """
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0,
                    1e-12)
    dq = jnp.clip(jnp.round(wf / s), -127, 127) * s
    return (wf + jax.lax.stop_gradient(dq - wf)).astype(w.dtype)


def _fq_dense(dense: Dict) -> Dict:
    if "kernel" not in dense:      # already-int8 serving tree: pass through
        return dense
    return {**dense, "kernel": fake_quant_weight(dense["kernel"])}


def _fq_block(blk: Dict) -> Dict:
    """Fake-quant the four quantized matmuls of an encoder block scope
    (attn qkv/proj, mlp fc1/fc2 — the exact set quantize_encoder_params
    converts, models/vit.py:283-309); LN/bias stay fp32, as in serving."""
    return {
        **{k: v for k, v in blk.items()
           if k not in ("attn", "mlp_fc1", "mlp_fc2")},
        "attn": {**blk["attn"],
                 "qkv": _fq_dense(blk["attn"]["qkv"]),
                 "proj": _fq_dense(blk["attn"]["proj"])},
        "mlp_fc1": _fq_dense(blk["mlp_fc1"]),
        "mlp_fc2": _fq_dense(blk["mlp_fc2"]),
    }


def fake_quant_vit_trunks(
        params: Dict,
        trunk_names: Tuple[str, ...] = ("ViT_0", "thermal_branch")) -> Dict:
    """Apply serving-grid fake-quant to every ViT trunk's encoder blocks
    (scanned ``encoder`` scope or unrolled ``block0..N-1`` scopes, the same
    discovery rule as quantize_variables, models/vit.py:370-393).  Models
    without a ViT trunk pass through unchanged."""
    new = dict(params)
    for name in trunk_names:
        if name not in params:
            continue
        trunk = params[name]
        scopes = [k for k in trunk
                  if k == "encoder" or k.startswith("block")]
        if not scopes:
            continue
        new[name] = {**{k: v for k, v in trunk.items() if k not in scopes},
                     **{k: _fq_block(trunk[k]) for k in scopes}}
    return new


def fake_quant_conv_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Snap an HWIO conv kernel to the int8 ResNet serving grid with an
    identity (straight-through) gradient.

    Grid = models/resnet_q8.py::quantize_conv_weight: per-OUTPUT-channel
    symmetric, scale = absmax/127 over (H, W, I).  Serving quantizes the
    BN-FOLDED kernel, but the fold is a per-output-channel scalar and
    this grid is equivariant under per-channel scaling (module
    docstring), so snapping the unfolded kernel reproduces serving's
    relative quantization error exactly."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0,
        1e-12)
    dq = jnp.clip(jnp.round(wf / s), -127, 127) * s
    return (wf + jax.lax.stop_gradient(dq - wf)).astype(w.dtype)


def _fq_resnet_block(blk: Dict) -> Dict:
    """Fake-quant every conv kernel of a stageN_blockM scope — the exact
    set quantize_resnet_params converts (conv1/2/3, down_conv/proj_conv,
    models/resnet_q8.py:240-259); BN scopes stay fp32 (folded at
    serving-conversion time, which the per-channel equivariance makes
    error-free to skip here)."""
    out = {}
    for k, v in blk.items():
        if ((k.endswith("conv") or k.startswith("conv"))
                and "kernel" in v):    # skip already-int8 serving trees
            out[k] = {**v, "kernel": fake_quant_conv_weight(v["kernel"])}
        else:
            out[k] = v
    return out


def fake_quant_resnet_trunks(
        params: Dict,
        trunk_names: Tuple[str, ...] = ("rgb_branch", "ResNet_0")) -> Dict:
    """Apply the int8 ResNet serving grid to every ResNet trunk's stage
    convs (same trunk discovery as models/resnet_q8.py::
    quantize_rgb_trunks; covers the ResNet-50 production trunk and the
    ResNet-18 distillation student).  The stem conv is untouched
    (serving keeps it bf16).  Models without a ResNet trunk pass through
    unchanged."""
    new = dict(params)
    for name in trunk_names:
        if name not in params or "stem_conv" not in params[name]:
            continue
        trunk = params[name]
        new[name] = {
            **{k: v for k, v in trunk.items()
               if not k.startswith("stage")},
            **{k: _fq_resnet_block(v) for k, v in trunk.items()
               if k.startswith("stage")}}
    return new


def fake_quant_trunks(params: Dict) -> Dict:
    """The full --qat transform: ViT encoder kernels AND ResNet stage
    convs snapped to their respective int8 serving grids (both pure
    param transforms; models without one trunk kind pass through)."""
    return fake_quant_resnet_trunks(fake_quant_vit_trunks(params))
