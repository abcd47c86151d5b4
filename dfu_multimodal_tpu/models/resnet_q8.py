"""Int8 ResNet-50 serving path (XLA convs, v5e int8 MXU rate).

Measured on v5e at b128: XLA lowers int8 convolutions to the MXU's int8
path at ~2x the bf16 rate (e.g. the 28x28x128 3x3 conv runs 0.154 ms bf16
vs 0.077 ms int8), and int8 activations additionally HALVE the HBM traffic
of the memory-bound early stages.  Unlike the ViT (where bf16 Pallas block
kernels beat XLA and the int8 variant lives in ops/vit_block_q8.py), the
best ResNet serving path is XLA convs — so the int8 ResNet is a plain Flax
module over ``lax.conv`` with quantized operands, and XLA fuses every
dequant/ReLU/requant chain into the conv epilogues.

Scheme (standard post-training quantization):
- weights: batch-norm folded, then per-OUTPUT-channel symmetric int8,
  quantized once at model load (``quantize_resnet_params``);
- activations: per-tensor symmetric int8 with STATIC scales obtained from
  a calibration pass (``calibrate_resnet``): run representative batches
  through the bf16 model with ``ResNet(calibrate=True)`` — every conv
  input sows its absmax into the ``calibration`` collection — and keep the
  running max.  Static scales are what let the requantize fuse into the
  producing conv's epilogue; dynamic per-tensor scales would need a full
  extra reduction pass over every activation between convs.
- the stem conv stays bf16 (3-channel input: negligible FLOPs, and the
  int8 MXU path gives nothing at Cin=3).

Accuracy contract: per-channel weights + per-tensor activations is the
conservative PTQ recipe (typically well under a point on ImageNet-class
CNNs); the path is OPT-IN for serving (``bench.py --int8``,
``predict --int8``) and has no VJP.  The reference has no analogue (stock
fp32 torch, SURVEY.md §0); this extends the int8 serving design of
ops/vit_block_q8.py to the RGB branch.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps, canonical_dtype, tap


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor int8 with a static scale (absmax/127)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def quantize_conv_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8 of an HWIO kernel."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


class _QConv(nn.Module):
    """One int8 conv with folded-BN bias: int8 x int8 -> int32 on the MXU,
    dequant + bias in the fp32 epilogue (XLA fuses it)."""

    features: int
    ks: Sequence[int]
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw = self.ks
        kq = self.param("kernel_q8", nn.initializers.zeros,
                        (kh, kw, cin, self.features), jnp.int8)
        ws = self.param("scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (), jnp.float32)

        xq = quantize_act(x, act_scale)
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        y = jax.lax.conv_general_dilated(
            xq, kq, (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (act_scale * ws) + bias
        return y.astype(canonical_dtype(self.dtype))


class Int8Bottleneck(nn.Module):
    """Serving-only int8 bottleneck; residual math in compute dtype."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        y = nn.relu(_QConv(f, (1, 1), dtype=self.dtype, name="conv1")(x))
        y = nn.relu(_QConv(f, (3, 3), self.stride, dtype=self.dtype,
                           name="conv2")(y))
        y = _QConv(4 * f, (1, 1), dtype=self.dtype, name="conv3")(y)

        if x.shape[-1] != 4 * f or self.stride != 1:
            x = _QConv(4 * f, (1, 1), self.stride, dtype=self.dtype,
                       name="down")(x)
        return nn.relu(x + y)


class Int8BasicBlock(nn.Module):
    """Serving-only int8 ResNet-18/34 block (3x3 -> 3x3, projection
    shortcut) — the distilled student's int8 path.  The projection reads
    the block input, so it reuses conv1's activation scale (mirrors the
    flax BasicBlock's calibration layout)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        shortcut = x
        if x.shape[-1] != f or self.stride != 1:
            shortcut = _QConv(f, (1, 1), self.stride, dtype=self.dtype,
                              name="proj")(x)
        y = nn.relu(_QConv(f, (3, 3), self.stride, dtype=self.dtype,
                           name="conv1")(x))
        y = _QConv(f, (3, 3), dtype=self.dtype, name="conv2")(y)
        return nn.relu(shortcut + y)


class Int8ResNet(nn.Module):
    """Int8 serving twin of :class:`~dfu_multimodal_tpu.models.resnet.ResNet`.
    Parameters come from :func:`quantize_resnet_params`; same tap points."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.bfloat16
    block_type: str = "bottleneck"     # or "basic" (ResNet-18/34)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        del train                                     # serving only
        dtype = canonical_dtype(self.dtype)
        x = x.astype(dtype)

        stem_k = self.param("stem_kernel", nn.initializers.zeros,
                            (7, 7, 3, 64), jnp.float32)
        stem_b = self.param("stem_bias", nn.initializers.zeros,
                            (64,), jnp.float32)
        x = jax.lax.conv_general_dilated(
            x, stem_k.astype(dtype), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        x = nn.relu(x + stem_b).astype(dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = (Int8BasicBlock if self.block_type == "basic"
                     else Int8Bottleneck)
        for stage_idx, (num_blocks, width) in enumerate(
                zip(self.stage_sizes, self.widths), start=1):
            for block_idx in range(num_blocks):
                stride = 2 if stage_idx > 1 and block_idx == 0 else 1
                x = block_cls(width, stride, dtype=dtype,
                              name=f"stage{stage_idx}_block{block_idx}")(x)
            x = tap(self, f"stage{stage_idx}", x, taps)

        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def Int8ResNet50(dtype: Any = jnp.bfloat16, **kwargs) -> Int8ResNet:
    return Int8ResNet(stage_sizes=(3, 4, 6, 3), widths=(64, 128, 256, 512),
                      dtype=dtype, **kwargs)


def Int8ResNet18(dtype: Any = jnp.bfloat16, **kwargs) -> Int8ResNet:
    """Int8 twin of the distilled ResNet-18 student."""
    return Int8ResNet(stage_sizes=(2, 2, 2, 2), widths=(64, 128, 256, 512),
                      dtype=dtype, block_type="basic", **kwargs)


# ------------------------------------------------------------- conversion


def _fold(conv, bn, eps=1e-5):
    """(HWIO kernel, flax BN vars) -> (folded kernel, fp32 bias)."""
    s = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    return conv["kernel"] * s, bn["bias"] - bn["mean"] * s


def calibrate_resnet(module, variables, batches):
    """Run ``batches`` (iterable of NHWC arrays, already normalized) through
    the bf16/fp32 model in calibration mode and return {conv path: absmax}.
    ``module`` must be built with ``calibrate=True``
    (e.g. ``ResNet50(dtype=..., calibrate=True)``)."""
    scales: dict = {}
    for x in batches:
        _, aux = module.apply(variables, x, train=False,
                              mutable=["calibration"])
        flat = jax.tree.leaves_with_path(aux["calibration"])
        for path, val in flat:
            key = tuple(getattr(p, "key", getattr(p, "idx", None))
                        for p in path)
            v = float(jnp.max(jnp.asarray(val)))
            scales[key] = max(scales.get(key, 0.0), v)
    return scales


def quantize_resnet_params(variables, act_absmax,
                           stage_sizes=(3, 4, 6, 3),
                           block_type="bottleneck"):
    """fp32 ResNet variables (params + batch_stats) + calibration absmaxes
    -> the Int8ResNet param tree.  ``act_absmax`` maps
    (block_name, conv_name, 'absmax', 0) tuples — the keys produced by
    :func:`calibrate_resnet` — to float absmax values.  ``block_type``
    selects the bottleneck (ResNet-50) or basic (ResNet-18/34 student)
    layout."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def absmax_for(block, conv):
        for key, v in act_absmax.items():
            if block in key and f"{conv}_in" in key:
                return max(v, 1e-6)
        raise KeyError(f"no calibration entry for {block}/{conv}")

    def qconv(block, conv, bn, cal_conv=None):
        w, b = _fold({**params[block][conv]},
                     {**params[block][bn], **stats[block][bn]})
        kq, ws = quantize_conv_weight(w)
        a = absmax_for(block, cal_conv or conv) / 127.0
        return {"kernel_q8": kq, "scale": ws, "bias": b,
                "act_scale": jnp.float32(a)}

    out = {}
    stem_w, stem_b = _fold({**params["stem_conv"]},
                           {**params["stem_bn"], **stats["stem_bn"]})
    out["stem_kernel"], out["stem_bias"] = stem_w, stem_b

    for stage_idx, num_blocks in enumerate(stage_sizes, start=1):
        for block_idx in range(num_blocks):
            name = f"stage{stage_idx}_block{block_idx}"
            blk = {"conv1": qconv(name, "conv1", "bn1"),
                   "conv2": qconv(name, "conv2", "bn2")}
            if block_type == "bottleneck":
                blk["conv3"] = qconv(name, "conv3", "bn3")
                if "down_conv" in params[name]:
                    # the projection reads the block input — conv1's scale
                    blk["down"] = qconv(name, "down_conv", "down_bn",
                                        cal_conv="conv1")
            elif "proj_conv" in params[name]:
                blk["proj"] = qconv(name, "proj_conv", "proj_bn",
                                    cal_conv="conv1")
            out[name] = blk
    return {"params": out}


def _trunk_architecture(trunk_params):
    """(stage_sizes, block_type) inferred from a flax ResNet param tree —
    lets :func:`quantize_rgb_trunks` serve both the ResNet-50 production
    trunk and the ResNet-18 distillation student without being told."""
    sizes = []
    for stage_idx in range(1, 99):
        n = 0
        while f"stage{stage_idx}_block{n}" in trunk_params:
            n += 1
        if n == 0:
            break
        sizes.append(n)
    if not sizes:
        raise ValueError("not a ResNet param tree (no stageN_blockM keys)")
    block_type = ("bottleneck" if "conv3" in trunk_params["stage1_block0"]
                  else "basic")
    return tuple(sizes), block_type


def quantize_rgb_trunks(variables, calib_batches, dtype=jnp.bfloat16,
                        trunk_names=("rgb_branch", "ResNet_0")):
    """Quantize every ResNet trunk in a model's variables for the int8
    serving path (fusion ``rgb_impl="int8"`` / classifier
    ``block_impl="int8"``): calibrate activation scales on
    ``calib_batches`` (iterable of NORMALIZED NHWC arrays), fold BN,
    per-channel-quantize weights.  The trunk architecture (ResNet-50
    production trunk or ResNet-18 distillation student) is inferred from
    the param tree.  Returns new variables — the trunk's params are
    replaced by the Int8ResNet tree and its batch_stats entry dropped;
    everything else (other branches, heads) is untouched."""
    from dfu_multimodal_tpu.models.resnet import ResNet

    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    found = False
    for name in trunk_names:
        if name not in params or "stem_conv" not in params[name]:
            continue
        found = True
        trunk_vars = {"params": params[name], "batch_stats": stats[name]}
        stage_sizes, block_type = _trunk_architecture(params[name])
        calib_module = ResNet(stage_sizes=stage_sizes,
                              block_type=block_type, dtype=dtype,
                              block_impl="flax", calibrate=True)
        absmax = calibrate_resnet(calib_module, trunk_vars, calib_batches)
        params[name] = quantize_resnet_params(
            trunk_vars, absmax, stage_sizes=stage_sizes,
            block_type=block_type)["params"]
        del stats[name]
    if not found:
        raise ValueError(f"no ResNet trunk found under {trunk_names}")
    out = {k: v for k, v in variables.items()
           if k not in ("params", "batch_stats")}
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
