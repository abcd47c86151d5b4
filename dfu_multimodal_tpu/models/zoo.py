"""Model registry: a uniform handle the training/eval engines use.

Each entry couples a Flax module factory with the modalities it consumes so a
single jitted engine can drive every model family (the reference instead
re-defines each model class inside every script — train_rgb_only.py:200,
extended_metrics.py:307-367, ablation_study.py:116-157, etc.).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models.efficientnet import EfficientNetClassifier
from dfu_multimodal_tpu.models.fusion import (LegacyGatedFusionClassifier,
                                              LegacyResNetEfficientNetFusion,
                                              MultimodalFusionClassifier)
from dfu_multimodal_tpu.models.resnet import ResNetClassifier
from dfu_multimodal_tpu.models.vit import ViTClassifier


@dataclass(frozen=True)
class ModelSpec:
    name: str
    make: Callable[..., nn.Module]
    inputs: Tuple[str, ...]           # keys of the batch dict it consumes
    feature_dim: int


_REGISTRY: Dict[str, ModelSpec] = {}


def register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    return spec


class TinyCNN(nn.Module):
    """Small conv net for tests/smoke runs (not in the reference; exists so
    engine/CLI paths can be exercised in seconds on CPU)."""

    num_classes: int = 2
    drop_rate: float = 0.2
    dtype: Any = jnp.float32
    # cross-shard BN axis (shard_map train steps) — mirrors the real
    # families so engine SPMD paths can be tested at TinyCNN cost
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, taps=None):
        x = x.astype(self.dtype)
        for i, feats in enumerate((16, 32)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            # fast-converging running stats: smoke runs are only ~20 steps
            x = nn.BatchNorm(use_running_average=not train, momentum=0.5,
                             dtype=self.dtype, axis_name=self.bn_axis_name,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        if taps is not None and "features" in taps:
            x = x + taps["features"]
        self.sow("intermediates", "features", x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(x.astype(jnp.float32))


class TinyTrunk(nn.Module):
    """Pooled conv trunk for :class:`TinyFusion` — emits a (B, 32)
    feature vector like the real trunks emit (B, 2048)/(B, 768)."""

    dtype: Any = jnp.float32
    bn_axis_name: Any = None          # see TinyCNN

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        for i, feats in enumerate((16, 32)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.5,
                             dtype=self.dtype, axis_name=self.bn_axis_name,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


class TinyFusion(nn.Module):
    """Two-input late-fusion smoke model (not in the reference): the
    structural twin of ``MultimodalFusionClassifier`` — per-modality
    trunk scopes ``rgb_branch``/``thermal_branch`` feeding a concat MLP —
    at TinyCNN cost, so every multimodal code path (fusion engines,
    modality routing, per-trunk embedding audits, dual-modality drift)
    tests in seconds on CPU."""

    num_classes: int = 2
    drop_rate: float = 0.2
    dtype: Any = jnp.float32
    bn_axis_name: Any = None          # see TinyCNN

    @nn.compact
    def __call__(self, rgb, thermal, *, train: bool = False, taps=None):
        r = TinyTrunk(self.dtype, bn_axis_name=self.bn_axis_name,
                      name="rgb_branch")(rgb, train=train)
        t = TinyTrunk(self.dtype, bn_axis_name=self.bn_axis_name,
                      name="thermal_branch")(thermal, train=train)
        fused = jnp.concatenate([r, t], axis=-1)
        fused = nn.Dropout(self.drop_rate,
                           deterministic=not train)(fused)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(fused.astype(jnp.float32))


register(ModelSpec("tiny_rgb", TinyCNN, ("rgb",), 32))
register(ModelSpec("tiny_thermal", TinyCNN, ("thermal",), 32))
register(ModelSpec("tiny_fusion", TinyFusion, ("rgb", "thermal"), 64))
register(ModelSpec("rgb_only", ResNetClassifier, ("rgb",), 2048))
# ResNet-18 students for `dfu distill` (11M params, 512-d features; no
# reference counterpart — the compressed edge-deployment target)
register(ModelSpec("resnet18_rgb",
                   partial(ResNetClassifier, trunk="resnet18"),
                   ("rgb",), 512))
register(ModelSpec("resnet18_thermal",
                   partial(ResNetClassifier, trunk="resnet18"),
                   ("thermal",), 512))
register(ModelSpec("thermal_only", ViTClassifier, ("thermal",), 768))
register(ModelSpec("multimodal", MultimodalFusionClassifier,
                   ("rgb", "thermal"), 2816))
register(ModelSpec("efficientnet_rgb", EfficientNetClassifier, ("rgb",), 1280))
register(ModelSpec("efficientnet_thermal", EfficientNetClassifier,
                   ("thermal",), 1280))
register(ModelSpec("legacy_gated_fusion", LegacyGatedFusionClassifier,
                   ("rgb", "thermal"), 1280))
register(ModelSpec("legacy_rgb_resnet_fusion",
                   LegacyResNetEfficientNetFusion, ("rgb", "thermal"), 1280))


# models whose thermal/primary trunk is a scanned ViT: the set
# --token-merge applies to (the Trainer guard and the predict/serve
# CLIs all consult THIS constant — extend it when adding a ViT family).
# eval/vit_attribution.py::VIT_TRUNK_SCOPES maps the same models to
# their trunk scopes for transformer attribution.
VIT_TRUNK_MODELS = frozenset({"thermal_only", "multimodal"})


def get(name: str) -> ModelSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")


def available() -> Tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def build(name: str, *, num_classes: int = 2,
          drop_rate: Optional[float] = None,
          dtype: Any = jnp.float32, **kwargs) -> Tuple[nn.Module, ModelSpec]:
    """``drop_rate=None`` (default) keeps each model CLASS's own default
    (0.5 for the reference trio, 0.2 for the legacy/tiny families) —
    passing a value overrides it.  The trainers always pass
    ``cfg.drop_rate`` explicitly, so training behavior is unchanged;
    direct builders no longer get 0.5 force-fed onto models whose
    contract says otherwise."""
    spec = get(name)
    dr = {} if drop_rate is None else {"drop_rate": drop_rate}
    module = spec.make(num_classes=num_classes, dtype=dtype, **dr,
                       **kwargs)
    return module, spec


def apply_model(module: nn.Module, spec: ModelSpec, variables: Dict[str, Any],
                batch: Dict[str, jnp.ndarray], **apply_kwargs) -> Any:
    """Apply ``module`` to the modalities named by ``spec.inputs``."""
    inputs = tuple(batch[k] for k in spec.inputs)
    return module.apply(variables, *inputs, **apply_kwargs)


def init_model(module: nn.Module, spec: ModelSpec, rng: jax.Array,
               image_size: int = 224) -> Dict[str, Any]:
    dummy = tuple(
        jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        for _ in spec.inputs)
    return module.init({"params": rng}, *dummy, train=False)


def init_shapes(module: nn.Module, spec: ModelSpec,
                image_size: int = 224) -> Dict[str, Any]:
    """Abstract init: variable shapes/dtypes without any compute."""
    dummy = tuple(
        jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        for _ in spec.inputs)
    return jax.eval_shape(
        lambda *a: module.init({"params": jax.random.PRNGKey(0)}, *a,
                               train=False), *dummy)


def param_count(variables: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree.leaves(variables.get("params", {})))
