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
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps, canonical_dtype, tap


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut when needed."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="down_conv")(residual)
            residual = norm(name="down_bn")(residual)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Generic ResNet trunk returning pooled features (B, 4*widths[-1])."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

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
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage_idx, (num_blocks, width) in enumerate(
                zip(self.stage_sizes, self.widths), start=1):
            for block_idx in range(num_blocks):
                stride = 2 if stage_idx > 1 and block_idx == 0 else 1
                x = Bottleneck(width, stride, dtype=dtype,
                               name=f"stage{stage_idx}_block{block_idx}")(
                                   x, train=train)
            x = tap(self, f"stage{stage_idx}", x, taps)

        x = jnp.mean(x, axis=(1, 2))          # global average pool -> (B, C)
        return x.astype(jnp.float32)


def ResNet50(dtype: Any = jnp.float32, **kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), widths=(64, 128, 256, 512),
                  dtype=dtype, **kwargs)


class ResNetClassifier(nn.Module):
    """ResNet50 trunk + Dropout(0.5) + Linear(2048 -> num_classes) head —
    the reference's ``RGBOnlyModel`` contract (train_rgb_only.py:200-217)."""

    num_classes: int = 2
    drop_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        feats = ResNet50(dtype=self.dtype)(x, train=train, taps=taps)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="head")(feats)
        return logits
