"""EfficientNet-B0 in Flax, NHWC — the legacy encoder lineage.

Behavioral counterpart of the reference ``EfficientNetEncoder``
(reference models/encoders.py:5-12: torchvision efficientnet_b0 with the
classifier removed -> 1280-d features), used by the early-files trainers
(notebooks/early files/*.py). Depthwise convolutions use
``feature_group_count`` which XLA lowers to efficient TPU vector ops; the
1x1 expand/project convs are MXU matmuls.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps, canonical_dtype, tap

# (expand_ratio, channels, repeats, stride, kernel) per stage — B0 config.
B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class SqueezeExcite(nn.Module):
    se_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    features: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    # torchvision stochastic depth ("row" mode): during training the
    # whole residual branch is dropped per sample with this probability
    # (and scaled by 1/keep); linearly ramped 0 -> 0.2 across the
    # network's blocks by EfficientNetB0 below, matching
    # torchvision.models.efficientnet_b0's StochasticDepth schedule.
    sd_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                       param_dtype=jnp.float32)
        in_features = x.shape[-1]
        residual = x
        mid = in_features * self.expand_ratio

        if self.expand_ratio != 1:
            x = conv(mid, (1, 1), name="expand_conv")(x)
            x = norm(name="expand_bn")(x)
            x = nn.silu(x)

        pad = self.kernel // 2
        x = conv(mid, (self.kernel, self.kernel),
                 strides=(self.stride, self.stride),
                 padding=((pad, pad), (pad, pad)),
                 feature_group_count=mid, name="dw_conv")(x)
        x = norm(name="dw_bn")(x)
        x = nn.silu(x)

        se_features = max(1, int(in_features * self.se_ratio))
        x = SqueezeExcite(se_features, dtype=self.dtype, name="se")(x)

        x = conv(self.features, (1, 1), name="project_conv")(x)
        x = norm(name="project_bn")(x)

        if self.stride == 1 and in_features == self.features:
            if train and self.sd_rate > 0.0:
                keep = 1.0 - self.sd_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    (x.shape[0], 1, 1, 1)).astype(x.dtype)
                x = x * mask / keep
            x = x + residual
        return x


class EfficientNetB0(nn.Module):
    """Trunk returning pooled 1280-d features."""

    stages: Sequence[Tuple[int, int, int, int, int]] = B0_STAGES
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        dtype = canonical_dtype(self.dtype)
        x = x.astype(dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=dtype, param_dtype=jnp.float32,
                         name="stem_bn")(x)
        x = nn.silu(x)

        # torchvision schedule: stochastic-depth prob ramps linearly
        # 0 -> 0.2 over the network's blocks (efficientnet.py's
        # sd_prob = 0.2 * block_id / total_blocks)
        total_blocks = sum(r for _, _, r, _, _ in self.stages)
        block_id = 0
        for si, (expand, feats, repeats, stride, kernel) in enumerate(self.stages):
            for bi in range(repeats):
                sd = 0.2 * block_id / total_blocks
                x = MBConv(feats, expand, stride if bi == 0 else 1, kernel,
                           sd_rate=sd, dtype=dtype,
                           name=f"stage{si}_block{bi}")(x, train=train)
                block_id += 1
        x = tap(self, "features", x, taps)

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=dtype,
                    param_dtype=jnp.float32, name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=dtype, param_dtype=jnp.float32,
                         name="head_bn")(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)   # (B, 1280)


class EfficientNetClassifier(nn.Module):
    """EfficientNet-B0 + Dropout + Linear head (legacy single-modality
    trainer contract, early files/train_singleRGB.py)."""

    num_classes: int = 2
    drop_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 taps: Taps = None) -> jnp.ndarray:
        feats = EfficientNetB0(dtype=self.dtype)(x, train=train, taps=taps)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(feats)
