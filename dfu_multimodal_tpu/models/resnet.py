"""ResNet-50 in Flax, NHWC, TPU-first.

Behavioral counterpart of the reference RGB backbone (torchvision resnet50,
reference notebooks/train_rgb_only.py:200-217) but designed for the MXU:

- NHWC activations / HWIO kernels — XLA's native TPU conv layout, so no
  transposes are inserted around every convolution.
- Compute dtype is configurable (bfloat16 by default for training); params
  and batch-norm statistics stay float32.
- torchvision "v1.5" bottleneck (stride on the 3x3 conv), so weights
  converted from torch checkpoints are architecturally identical.
- Grad-CAM tap point after ``stage4`` (the reference hooks ``layer4``,
  grad_cam_visualization.py:478).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps, canonical_dtype, tap


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut when needed.

    ``calibrate=True`` sows each conv input's absmax into the
    ``calibration`` collection — the int8 serving converter
    (models/resnet_q8.py) derives its static activation scales from these.
    """

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    calibrate: bool = False
    # Cross-shard BatchNorm: when set (the shard_map train path binds it
    # to the mesh's data axis), batch statistics pmean over the axis so
    # per-device programs reproduce the global-batch BN of the jit path.
    bn_axis_name: Any = None

    def _cal(self, name: str, x: jnp.ndarray) -> None:
        if self.calibrate:
            self.sow("calibration", name,
                     jnp.max(jnp.abs(x.astype(jnp.float32))))

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       axis_name=self.bn_axis_name)

        residual = x
        self._cal("conv1_in", x)
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        self._cal("conv2_in", y)
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        self._cal("conv3_in", y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="down_conv")(residual)
            residual = norm(name="down_bn")(residual)

        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3x3(stride) -> 3x3 with projection shortcut (torchvision
    BasicBlock) — the ResNet-18/34 block.  Exists for the distillation
    student (`dfu distill`): a 11M-param edge-deployable model the heavy
    trunks compress into; the reference itself never uses ResNet-18.

    ``calibrate=True`` sows conv-input absmaxes exactly like
    :class:`Bottleneck` (the projection reads the block input, so it
    shares ``conv1_in``) — models/resnet_q8.py consumes these for the
    int8 student serving path."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    calibrate: bool = False
    bn_axis_name: Any = None      # see Bottleneck

    def _cal(self, name: str, x: jnp.ndarray) -> None:
        if self.calibrate:
            self.sow("calibration", name,
                     jnp.max(jnp.abs(x.astype(jnp.float32))))

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        dtype = canonical_dtype(self.dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=dtype,
                     param_dtype=jnp.float32,
                     axis_name=self.bn_axis_name)
        conv = partial(nn.Conv, use_bias=False, dtype=dtype,
                       param_dtype=jnp.float32)
        shortcut = x
        self._cal("conv1_in", x)
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="proj_conv")(x)
            shortcut = bn(name="proj_bn")(shortcut)
        y = conv(self.features, (3, 3),
                 strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        self._cal("conv2_in", y)
        y = conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                 name="conv2")(y)
        y = bn(name="bn2")(y)
        return nn.relu(y + shortcut)


class _ConvKernel(nn.Module):
    """Parameter holder producing the exact tree of bias-free ``nn.Conv``."""

    features: int
    ks: Sequence[int]

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.ks) + (cin, self.features), jnp.float32)


class _BNStats(nn.Module):
    """Parameter holder producing the exact tree of ``nn.BatchNorm``
    (params scale/bias + batch_stats mean/var)."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


def _fold_bn(kernel, bn, eps=1e-5):
    """Eval-time BN is affine per channel: fold it into the conv.
    kernel: (kh, kw, Cin, Cout); returns (folded kernel, fp32 bias)."""
    scale, bias, mean, var = bn
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s, bias - mean * s


class FusedBottleneck(nn.Module):
    """Bottleneck computed by the fused Pallas kernel
    (ops/resnet_block.py): conv1+BN+relu -> 3x3 conv+BN+relu -> conv3+BN
    + shortcut + relu in ONE VMEM-resident kernel, with batch-norm folded
    into the conv weights at apply time (eval BN is a per-channel affine).
    Declares the SAME param tree as :class:`Bottleneck` (checkpoints and
    converters apply unchanged).  Stride-1 only; serving/eval only (train
    needs live batch statistics); trainable via the rematerializing custom
    VJP for Grad-CAM, which differentiates the serving forward."""

    features: int
    dtype: Any = jnp.float32
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        from dfu_multimodal_tpu.ops.resnet_block import fused_bottleneck

        del train                                     # eval-only path
        cin = x.shape[-1]
        f = self.features
        dt = canonical_dtype(self.dtype)

        w1, b1 = _fold_bn(_ConvKernel(f, (1, 1), name="conv1")(cin),
                          _BNStats(name="bn1")(f))
        w2, b2 = _fold_bn(_ConvKernel(f, (3, 3), name="conv2")(f),
                          _BNStats(name="bn2")(f))
        w3, b3 = _fold_bn(_ConvKernel(4 * f, (1, 1), name="conv3")(f),
                          _BNStats(name="bn3")(4 * f))
        w1 = w1[0, 0].astype(dt)
        # row-stacked 3x3 taps, (dy, dx) row-major — the kernel's tap order
        w2 = w2.reshape(9 * f, f).astype(dt)
        w3 = w3[0, 0].astype(dt)

        if cin != 4 * f:
            wd, bd = _fold_bn(
                _ConvKernel(4 * f, (1, 1), name="down_conv")(cin),
                _BNStats(name="down_bn")(4 * f))
            return fused_bottleneck(x.astype(dt), w1, b1, w2, b2, w3, b3,
                                    wd[0, 0].astype(dt), bd,
                                    interpret=self.interpret)
        return fused_bottleneck(x.astype(dt), w1, b1, w2, b2, w3, b3,
                                interpret=self.interpret)


class ResNet(nn.Module):
    """Generic ResNet trunk returning pooled features (B, 4*widths[-1]).

    ``block_impl``: "flax" composes nn.Conv/nn.BatchNorm (XLA convs);
    "fused" runs stride-1 bottlenecks through the fused Pallas kernel at
    eval time (ops/resnet_block.py) — strided blocks and training always
    use the flax path (strides change the layout; train-mode BN needs
    batch statistics).  "fused_interpret" forces the fused path through
    the Pallas interpreter (CPU numerics tests).  Both impls share one
    param tree.

    "auto" resolves to FLAX on every backend: measured at b128 on v5e,
    XLA's eval-mode conv blocks already sit AT the HBM roofline (e.g.
    0.27 ms for a 28x28x512 block = its exact read+write bound) and the
    Pallas roll+mask kernel loses 2-4x on MXU efficiency (9 small
    matmuls with K=64/N=64 lane waste) — see docs/DESIGN.md for the
    numbers.  The fused path remains available as an opt-in and as the
    substrate for future cross-block (whole-stage) fusion."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32
    block_impl: str = "auto"
    calibrate: bool = False
    # "bottleneck" (ResNet-50 family, 4x expansion) or "basic"
    # (ResNet-18/34, 1x) — the distillation student uses "basic"
    block_type: str = "bottleneck"
    # cross-shard BN stats axis for the shard_map train path (see
    # Bottleneck.bn_axis_name); None = per-program stats (jit path)
    bn_axis_name: Any = None

    def _use_fused(self, train: bool) -> bool:
        if train:
            return False
        return self.block_impl in ("fused", "fused_interpret")

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        dtype = canonical_dtype(self.dtype)
        x = x.astype(dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
                         axis_name=self.bn_axis_name, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        fused = self._use_fused(train)
        interpret = self.block_impl == "fused_interpret"
        for stage_idx, (num_blocks, width) in enumerate(
                zip(self.stage_sizes, self.widths), start=1):
            for block_idx in range(num_blocks):
                stride = 2 if stage_idx > 1 and block_idx == 0 else 1
                name = f"stage{stage_idx}_block{block_idx}"
                if self.block_type == "basic":
                    x = BasicBlock(width, stride, dtype=dtype,
                                   calibrate=self.calibrate,
                                   bn_axis_name=self.bn_axis_name,
                                   name=name)(x, train=train)
                elif fused and stride == 1:
                    x = FusedBottleneck(width, dtype=dtype,
                                        interpret=interpret,
                                        name=name)(x, train=train)
                else:
                    x = Bottleneck(width, stride, dtype=dtype,
                                   calibrate=self.calibrate,
                                   bn_axis_name=self.bn_axis_name,
                                   name=name)(x, train=train)
            x = tap(self, f"stage{stage_idx}", x, taps)

        x = jnp.mean(x, axis=(1, 2))          # global average pool -> (B, C)
        return x.astype(jnp.float32)


def ResNet50(dtype: Any = jnp.float32, **kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), widths=(64, 128, 256, 512),
                  dtype=dtype, **kwargs)


def ResNet18(dtype: Any = jnp.float32, **kwargs) -> ResNet:
    """11.2M-param trunk (512-d features) — the distillation student."""
    return ResNet(stage_sizes=(2, 2, 2, 2), widths=(64, 128, 256, 512),
                  dtype=dtype, block_type="basic", **kwargs)


class ResNetClassifier(nn.Module):
    """ResNet50 trunk + Dropout(0.5) + Linear(2048 -> num_classes) head —
    the reference's ``RGBOnlyModel`` contract (train_rgb_only.py:200-217)."""

    num_classes: int = 2
    drop_rate: float = 0.5
    dtype: Any = jnp.float32
    block_impl: str = "auto"
    trunk: str = "resnet50"       # or "resnet18" (distillation student)
    # cross-shard BN stats axis for shard_map train steps (see ResNet;
    # bound by DistillTrainer when the KD step runs under shard_map)
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        # trunk scope pinned to "ResNet_0" (the auto-name of the original
        # flax trunk) so both impls share one checkpoint key
        if self.trunk == "resnet18" and self.block_impl == "int8":
            from dfu_multimodal_tpu.models.resnet_q8 import Int8ResNet18
            feats = Int8ResNet18(dtype=self.dtype, name="ResNet_0")(
                x, train=train, taps=taps)
        elif self.trunk == "resnet18":
            feats = ResNet18(dtype=self.dtype,
                             bn_axis_name=self.bn_axis_name,
                             name="ResNet_0")(x, train=train, taps=taps)
        elif self.block_impl == "int8":
            from dfu_multimodal_tpu.models.resnet_q8 import Int8ResNet50
            feats = Int8ResNet50(dtype=self.dtype, name="ResNet_0")(
                x, train=train, taps=taps)
        else:
            feats = ResNet50(dtype=self.dtype, block_impl=self.block_impl,
                             bn_axis_name=self.bn_axis_name,
                             name="ResNet_0")(x, train=train, taps=taps)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="head")(feats)
        return logits
