"""Fusion models: the current late-fusion classifier plus legacy variants.

Current lineage (reference notebooks/train_multimodal_fusion.py:285-326):
ResNet50(RGB) ⊕ ViT-B/16(thermal) -> concat (2816) -> MLP 512 -> 256 -> 2
with ReLU + Dropout(0.5) between layers.

Legacy lineage (reference models/{models,fusion,classifier}.py):
- ``LegacyConcatFusion``: concat -> 512 -> 1 sigmoid head, Dropout 0.3
- ``GatedFusion``: sigmoid gate g·rgb + (1-g)·thermal over 1280-d features
- ``LegacyClassifier``: 1280 -> 256 -> 1 sigmoid head

The fusion MLP can optionally run as one fused Pallas kernel
(:mod:`dfu_multimodal_tpu.ops.fused_mlp`) — at (B, 2816)x(2816, 512) sizes the
XLA path is already MXU-bound, so the kernel mainly removes inter-op HBM
round-trips for small batches.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dfu_multimodal_tpu.models.common import Taps
from dfu_multimodal_tpu.models.resnet import ResNet50
from dfu_multimodal_tpu.models.vit import ViTBase16


class FusionMLP(nn.Module):
    """concat(2048+768) -> 512 -> 256 -> num_classes with ReLU+Dropout.

    At eval time on TPU the three matmuls + ReLUs run as ONE fused Pallas
    kernel (:mod:`dfu_multimodal_tpu.ops.fused_mlp`): no inter-layer HBM
    round-trips, which matters at small serving batches. Training (and
    CPU) uses the flax path — dropout sits between the layers there, and
    its backward is already XLA-optimal. Both paths share the same params.
    """

    num_classes: int = 2
    drop_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        deterministic = not train
        fc1 = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                       name="fc1")
        fc2 = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                       name="fc2")
        fc3 = nn.Dense(self.num_classes, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="fc3")

        if deterministic and not self.is_initializing():
            from dfu_multimodal_tpu.models.common import mosaic_kernels_ok
            if mosaic_kernels_ok():
                from dfu_multimodal_tpu.ops.fused_mlp import fused_mlp
                p = self.variables["params"]       # restored child params
                dt = fused.dtype
                return fused_mlp(
                    fused,
                    p["fc1"]["kernel"].astype(dt), p["fc1"]["bias"],
                    p["fc2"]["kernel"].astype(dt), p["fc2"]["bias"],
                    p["fc3"]["kernel"].astype(dt), p["fc3"]["bias"])

        x = nn.relu(fc1(fused))
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.relu(fc2(x))
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return fc3(x)


class MultimodalFusionClassifier(nn.Module):
    """Late fusion of ResNet50 (RGB) and ViT-B/16 (thermal)."""

    num_classes: int = 2
    drop_rate: float = 0.5
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    block_impl: str = "auto"
    # RGB trunk implementation: "auto" = the flax ResNet (XLA convs — the
    # measured best bf16 path, models/resnet.py); "int8" = the calibrated
    # int8 serving trunk (models/resnet_q8.py), params produced by
    # quantize_rgb_trunks.
    rgb_impl: str = "auto"
    # inference-only ToMe token merging for the ViT branch
    # (models/vit.py token_merge; load via split_encoder_variables)
    token_merge: Optional[Tuple[int, int]] = None
    # ToMe proportional attention for the post-merge ViT blocks
    # (models/vit.py tome_prop_attn; opt-in)
    tome_prop_attn: bool = False
    # cross-shard BN stats axis for the shard_map train path
    # (models/resnet.py Bottleneck.bn_axis_name); None = jit path
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, thermal: jnp.ndarray, *,
                 train: bool = False, taps: Taps = None) -> jnp.ndarray:
        if self.rgb_impl == "int8":
            from dfu_multimodal_tpu.models.resnet_q8 import Int8ResNet50
            rgb_feats = Int8ResNet50(dtype=self.dtype, name="rgb_branch")(
                rgb, train=train, taps=taps)                   # (B, 2048)
        else:
            rgb_feats = ResNet50(dtype=self.dtype,
                                 bn_axis_name=self.bn_axis_name,
                                 name="rgb_branch")(
                rgb, train=train, taps=taps)                   # (B, 2048)
        thermal_feats = ViTBase16(self.dtype, self.attention_impl,
                                  self.block_impl,
                                  token_merge=self.token_merge,
                                  tome_prop_attn=self.tome_prop_attn,
                                  name="thermal_branch")(
            thermal, train=train, taps=taps)                   # (B, 768)
        fused = jnp.concatenate([rgb_feats, thermal_feats], axis=-1)
        return FusionMLP(self.num_classes, self.drop_rate, self.dtype,
                         name="fusion")(fused, train=train)


class LegacyConcatFusion(nn.Module):
    """Legacy head: concat -> hidden -> 1 sigmoid (models/models.py:24-40)."""

    rgb_dim: int = 2048
    thermal_dim: int = 768
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb_feat: jnp.ndarray, thermal_feat: jnp.ndarray, *,
                 train: bool = False) -> jnp.ndarray:
        x = jnp.concatenate([rgb_feat, thermal_feat], axis=-1)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc2")(x)
        return nn.sigmoid(x)


class GatedFusion(nn.Module):
    """Legacy gated fusion: g = sigmoid(MLP(concat)); g·rgb + (1-g)·thermal
    (models/fusion.py:4-18)."""

    feat_dim: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb_feat: jnp.ndarray, th_feat: jnp.ndarray) -> jnp.ndarray:
        combined = jnp.concatenate([rgb_feat, th_feat], axis=-1)
        g = nn.Dense(self.feat_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="gate_fc1")(combined)
        g = nn.relu(g)
        g = nn.Dense(self.feat_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="gate_fc2")(g)
        g = nn.sigmoid(g.astype(jnp.float32))
        return g * rgb_feat + (1.0 - g) * th_feat


class LegacyGatedFusionClassifier(nn.Module):
    """Legacy dual-EfficientNet gated-fusion classifier — behavioral
    counterpart of the early-files trainers (reference notebooks/early
    files/train_RGB_Thermal_Unimodal_fusion.py:66-80: two EfficientNet-B0
    encoders -> sigmoid gate -> 1280 -> 256 -> head).

    Divergence (documented, SURVEY.md §7f): the legacy heads emit a single
    sigmoid unit trained with BCE; we standardize every model on the
    2-class softmax contract, so this head is Dense(num_classes).
    """

    num_classes: int = 2
    drop_rate: float = 0.3
    feat_dim: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, thermal: jnp.ndarray, *,
                 train: bool = False, taps: Taps = None) -> jnp.ndarray:
        from dfu_multimodal_tpu.models.efficientnet import EfficientNetB0
        rgb_feat = EfficientNetB0(dtype=self.dtype, name="rgb_encoder")(
            rgb, train=train, taps=taps)
        th_feat = EfficientNetB0(dtype=self.dtype, name="thermal_encoder")(
            thermal, train=train, taps=taps)
        fused = GatedFusion(self.feat_dim, self.dtype, name="fusion")(
            rgb_feat, th_feat)
        x = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                     name="cls_fc1")(fused)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(x)


class LegacyResNetEfficientNetFusion(nn.Module):
    """Legacy RGB-ResNet50 + thermal-EfficientNet gated fusion — counterpart
    of reference notebooks/early files/train_rgb_resnet_fusion.py:147-200
    (ResNet50 features projected 2048 -> 1280, then gated fusion).  Same
    2-class head standardization as above."""

    num_classes: int = 2
    drop_rate: float = 0.3
    feat_dim: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, thermal: jnp.ndarray, *,
                 train: bool = False, taps: Taps = None) -> jnp.ndarray:
        from dfu_multimodal_tpu.models.efficientnet import EfficientNetB0
        rgb_feat = ResNet50(dtype=self.dtype, name="rgb_encoder")(
            rgb, train=train, taps=taps)                   # (B, 2048)
        rgb_feat = nn.Dense(self.feat_dim, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="rgb_proj")(rgb_feat)     # -> 1280
        th_feat = EfficientNetB0(dtype=self.dtype, name="thermal_encoder")(
            thermal, train=train, taps=taps)
        fused = GatedFusion(self.feat_dim, self.dtype, name="fusion")(
            rgb_feat, th_feat)
        x = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                     name="cls_fc1")(fused)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(x)


class LegacyClassifier(nn.Module):
    """Legacy 1280 -> 256 -> 1 sigmoid head (models/classifier.py:4-16)."""

    feat_dim: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc2")(x)
        return nn.sigmoid(x)
