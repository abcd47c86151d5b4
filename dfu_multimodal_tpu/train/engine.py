"""The jitted training engine — one engine drives every model family.

The reference repeats a near-identical module-level training script per model
(reference notebooks/train_rgb_only.py:241-328, train_thermal_only.py:233-320,
train_multimodal_fusion.py:360-451).  Here a single :class:`Trainer`
parameterized by a model-zoo spec runs them all, with the reference's exact
training semantics:

- AdamW (torch defaults: b1=0.9 b2=0.999 eps=1e-8, decoupled weight decay
  applied to every parameter), lr/wd from config (train_rgb_only.py:227-228);
- class-weighted cross entropy with torch's weighted-mean reduction
  Σ wᵢ·ceᵢ / Σ wᵢ where wᵢ = class_weight[yᵢ] (train_rgb_only.py:170-177);
- weighted-with-replacement sampling per epoch (train_rgb_only.py:181-190);
- best-by-val-F1 checkpointing from epoch ≥ save_best_after_epoch
  (train_rgb_only.py:319-328); history dict of per-epoch loss/acc/F1.

TPU-native differences:
- augmentation + normalization run INSIDE the jitted train step on uint8
  batches (data/transforms.py), so the host only slices an index array;
- loss/accuracy/F1 accumulate as device-side confusion counts — one scalar
  transfer per epoch instead of per-batch ``.cpu().numpy()``
  (train_rgb_only.py:263-265);
- the step is jitted over a (data, model) mesh: batch sharded over ``data``,
  params replicated; XLA inserts the DP gradient all-reduce over ICI;
- donated state + fixed batch shapes -> zero per-step retracing/realloc.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import freeze, unfreeze

from dfu_multimodal_tpu.config import ModalityConfig, TrainConfig
from dfu_multimodal_tpu.data import loader as data_loader
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.data.transforms import (augment_and_normalize,
                                                eval_normalize)
from dfu_multimodal_tpu.eval import metrics as metrics_mod
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.parallel import mesh as mesh_mod
from dfu_multimodal_tpu.train import qat as qat_mod
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Exponential moving average of ``params`` (cfg.ema_decay > 0), updated
    # inside the jitted train step; None when EMA is off so the pytree
    # structure (and donation) is unchanged for the default path.
    ema_params: Any = None


def class_weights_from_labels(labels: np.ndarray) -> np.ndarray:
    """total/count_c per class, 0 for empty classes
    (train_rgb_only.py:170-175)."""
    counts = np.bincount(labels, minlength=2).astype(np.float64)
    total = counts.sum() if counts.sum() > 0 else 1.0
    return np.where(counts > 0, total / np.maximum(counts, 1), 0.0).astype(
        np.float32)


def per_sample_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)


def per_sample_focal(logits: jnp.ndarray, labels: jnp.ndarray,
                     gamma: float) -> jnp.ndarray:
    """Focal loss (Lin et al. 2017): (1 - p_y)^gamma · CE, with
    p_y = exp(-CE) — the true-class softmax probability.  gamma=0
    reduces exactly to CE; the per-class alpha weighting is carried by
    the engine's existing class weights."""
    ce = per_sample_ce(logits, labels)
    return ce * (1.0 - jnp.exp(-ce)) ** gamma


def weighted_mean(terms: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    return (jnp.sum(weights * terms)
            / jnp.maximum(jnp.sum(weights), 1e-12))


def weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                weights: jnp.ndarray) -> jnp.ndarray:
    """torch ``CrossEntropyLoss(weight=w)`` semantics: Σ wᵢ·ceᵢ / Σ wᵢ."""
    return weighted_mean(per_sample_ce(logits, labels), weights)


def mixup_batch(rng: jax.Array, inputs, valid: jnp.ndarray, alpha: float):
    """Mix each input with a random permutation partner.

    One lam ~ Beta(alpha, alpha) per batch (standard mixup), demoted to
    lam=1 per-row when the partner is a padded row — padding never bleeds
    into a real sample.  Returns (mixed_inputs, perm, lam_row)."""
    b = valid.shape[0]
    lam = jax.random.beta(rng, alpha, alpha)
    perm = jax.random.permutation(jax.random.fold_in(rng, 1), b)
    lam_row = jnp.where(valid[perm] > 0, lam, 1.0).astype(jnp.float32)

    def mix(x):
        lr = lam_row.reshape((b,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x * lr + x[perm] * (1 - lr)

    return tuple(mix(x) for x in inputs), perm, lam_row


def mixup_loss(per_sample, logits, labels, weights, valid, perm, lam_row):
    """lam-weighted two-target loss, normalized by the lam-weighted
    weight mass (reduces exactly to ``weighted_mean`` at lam=1).  Both
    terms are gated by the ROW's own validity — a padded row must not
    contribute through its partner's weight either."""
    la = per_sample(logits, labels)
    lb = per_sample(logits, labels[perm])
    v = valid.astype(jnp.float32)
    wa, wb = v * lam_row * weights, v * (1.0 - lam_row) * weights[perm]
    num = jnp.sum(wa * la + wb * lb)
    return num / jnp.maximum(jnp.sum(wa + wb), 1e-12)


def learning_rate_schedule(cfg):
    """Learning rate for ``optax.adamw``: the reference trains at a
    constant LR (reference notebooks/train_rgb_only.py:227-228), which
    stays the default and returns a plain float (bit-identical optimizer
    state to round-1 checkpoints). ``lr_schedule='cosine'`` and/or
    ``warmup_epochs > 0`` return an optax schedule over
    ``steps_per_epoch * num_epochs`` steps — standard fine-tuning practice
    for the pretrained-backbone recipe (docs/QUALITY_PARITY.md), offered
    as an opt-in beyond the reference surface."""
    sched = getattr(cfg, "lr_schedule", "constant")
    warm_epochs = float(getattr(cfg, "warmup_epochs", 0.0))
    if sched == "constant" and warm_epochs == 0.0:
        return cfg.learning_rate
    spe = int(getattr(cfg, "steps_per_epoch", 0))
    if spe <= 0:
        raise ValueError(
            "lr_schedule/warmup_epochs need cfg.steps_per_epoch > 0 "
            "(the train CLIs derive it from the dataset size)")
    total = max(1, spe * cfg.num_epochs)
    warm = int(round(warm_epochs * spe))
    if sched == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warm, decay_steps=total, end_value=0.0)
    if sched == "constant":   # warmup, then flat
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warm),
             optax.constant_schedule(cfg.learning_rate)], [warm])
    raise ValueError(f"unknown lr_schedule {sched!r} "
                     "(choose 'constant' or 'cosine')")


@dataclass
class EpochMetrics:
    loss: float
    accuracy: float
    f1: float


class Trainer:
    """Train/eval engine for one model-zoo entry."""

    def __init__(self, model_name: str, cfg: TrainConfig,
                 modalities: Dict[str, ModalityConfig],
                 class_weights: Optional[np.ndarray] = None,
                 mesh=None, attention_impl: str = "auto",
                 block_impl: str = "auto", rgb_impl: str = "auto",
                 token_merge=None, tome_prop_attn: bool = False):
        # every CLI builds a Trainer, so this is the one chokepoint where
        # the persistent XLA compile cache can cover the whole product
        # surface (train -> eval -> predict -> serve are separate
        # processes re-compiling identical programs otherwise)
        from dfu_multimodal_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dtype
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh(cfg.mesh)
        self.fsdp = bool(getattr(cfg.mesh, "fsdp", False))
        if self.fsdp and self.mesh.shape[mesh_mod.MODEL_AXIS] > 1:
            raise ValueError(
                "fsdp=True combined with a model axis > 1 is not supported: "
                "pick ZeRO-3 param sharding (fsdp) OR Megatron tensor "
                "parallelism (--mesh model axis), not both.")
        kwargs = {}
        spec_probe = zoo.get(model_name)
        # Fused-kernel serving under SPMD: on a pure-DP multi-device mesh
        # the EVAL/serving step is wrapped in jax.shard_map over the data
        # axis, where every device traces a per-device program — so the
        # Mosaic kernels never meet the auto-partitioner and the fused
        # Pallas paths survive multi-chip DP (docs/DESIGN.md "Kernels
        # under SPMD").  The TRAIN step keeps the jit/XLA path on
        # multi-device meshes except where build_train_step wraps it too.
        self._pure_dp = (self.mesh.size > 1 and not self.fsdp
                         and self.mesh.shape[mesh_mod.MODEL_AXIS] == 1)
        self._eval_shard_map = False
        if "thermal" in spec_probe.inputs and spec_probe.name in (
                "thermal_only", "multimodal"):
            kwargs["attention_impl"] = attention_impl
            kwargs["block_impl"] = block_impl
            wants_mosaic = (str(block_impl).startswith("fused")
                            or attention_impl == "pallas")
            if self.mesh.shape[mesh_mod.MODEL_AXIS] > 1 or self.fsdp:
                # Megatron-TP shards the encoder matmuls over ``model``;
                # FSDP shards the param tensors themselves over ``data``.
                # Either way the fused Pallas block kernels are opaque to
                # the XLA partitioner, so sharded-param runs use the flax
                # blocks (XLA inserts the collectives around the Dense ops).
                # (shard_map-wrapping can't help here: the PARAMS are the
                # sharded thing, and the kernels need them whole.)
                if block_impl not in ("auto", "flax"):
                    # int8/fused params (e.g. the predict --int8 tree) would
                    # fail inside the flax blocks with an opaque key/shape
                    # error — reject the combination up front.
                    mode = ("fsdp" if self.fsdp else
                            f"tensor parallelism (model axis "
                            f"{self.mesh.shape[mesh_mod.MODEL_AXIS]} > 1)")
                    raise ValueError(
                        f"block_impl={block_impl!r} is incompatible with "
                        f"{mode}: the fused Pallas kernels are opaque to "
                        "the XLA partitioner. Use block_impl='flax'/'auto' "
                        "or disable the sharded-param mode.")
                kwargs["block_impl"] = "flax"
            elif self._pure_dp:
                # Pure data parallelism, params replicated: the eval step
                # runs under shard_map, so fused impls are fine there —
                # explicitly requested (incl. the int8 q8/q8s serving
                # trees and the CPU interpret variants for tests) or
                # resolved by "auto" inside the wrapped trace on TPU.
                auto = "auto" in (block_impl, attention_impl)
                self._eval_shard_map = wants_mosaic or (
                    auto and jax.devices()[0].platform == "tpu")
        # int8 ResNet serving trunk (models/resnet_q8.py): the fusion model
        # takes it as rgb_impl, the standalone classifiers (ResNet-50
        # rgb_only + the distilled ResNet-18 students) as block_impl
        if token_merge is not None:
            # inference-only ToMe serving path (models/vit.py token_merge;
            # load checkpoints through split_encoder_variables — see
            # serve.engine.tome_for_serving)
            from dfu_multimodal_tpu.models.zoo import VIT_TRUNK_MODELS
            if spec_probe.name not in VIT_TRUNK_MODELS:
                raise ValueError(
                    f"token_merge applies to ViT-trunk models "
                    f"({sorted(VIT_TRUNK_MODELS)}), not "
                    f"{spec_probe.name!r}")
            kwargs["token_merge"] = tuple(token_merge)
            # full Bolya et al. recipe: post-merge blocks bias each key's
            # attention scores by log(token size) — opt-in, default
            # preserves the round-3 ToMe numerics (models/vit.py)
            kwargs["tome_prop_attn"] = bool(tome_prop_attn)
        if spec_probe.name == "multimodal":
            kwargs["rgb_impl"] = rgb_impl
            if (self._eval_shard_map
                    and int(getattr(cfg, "grad_accum", 1)) <= 1
                    and float(getattr(cfg, "mixup_alpha", 0.0)) == 0.0):
                # Cross-shard BatchNorm for the shard_map train path:
                # batch stats pmean over ``data`` inside the per-device
                # programs, reproducing the jit path's global-batch BN
                # (models/resnet.py).  Only set when the shard_map step
                # will actually be built — under a plain multi-device
                # jit the axis would be unbound (grad-accum/mixup keep
                # that path, so they gate the binding here).
                kwargs["bn_axis_name"] = mesh_mod.DATA_AXIS
        elif (spec_probe.name in ("rgb_only", "resnet18_rgb",
                                  "resnet18_thermal")
              and rgb_impl == "int8"):
            kwargs["block_impl"] = "int8"
        self.module, self.spec = zoo.build(
            model_name, drop_rate=cfg.drop_rate, dtype=dtype, **kwargs)
        self.modalities = modalities
        self.class_weights = (np.asarray(class_weights, np.float32)
                              if class_weights is not None else None)
        self.batch_sharding = mesh_mod.batch_sharding(self.mesh)
        self.replicated = mesh_mod.replicated(self.mesh)

        self.tx = optax.adamw(learning_rate_schedule(cfg),
                              b1=0.9, b2=0.999, eps=1e-8,
                              weight_decay=cfg.weight_decay,
                              mu_dtype=jnp.dtype(getattr(
                                  cfg, "optimizer_mu_dtype", "bfloat16")))
        # NOTE: do NOT wrap self.tx in optax.flatten to attack the rgb
        # step's ~1.7 ms of per-buffer dispatch copies — built and
        # measured in round 4 at −59.8% (13.5 → 33.5 ms/step b32): the
        # ravel/unravel of the ~100 MB param/grad/update trees costs far
        # more HBM traffic than the µs-copies it removes (docs/DESIGN.md
        # "Donated-state handoff study").
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- state

    def _param_shardings(self, params: Dict) -> Dict:
        """NamedSharding tree for this trainer's param placement: FSDP
        shards over ``data``, TP over ``model``; otherwise replicated.
        Leaves may be arrays OR ShapeDtypeStructs (jit out_shardings)."""
        from dfu_multimodal_tpu.parallel.sharding import (fsdp_shardings,
                                                          tp_shardings)
        if self.fsdp:
            return fsdp_shardings(params, self.mesh)
        if self.mesh.shape[mesh_mod.MODEL_AXIS] > 1:
            return tp_shardings(params, self.mesh)
        return jax.tree.map(lambda _: self.replicated, params)

    def _place_params(self, params: Dict) -> Dict:
        """Apply this trainer's param placement (multi-process safe:
        parallel.sharding.put_global builds global arrays from each
        process's addressable shards when the mesh spans hosts)."""
        from dfu_multimodal_tpu.parallel.sharding import put_global
        return jax.tree.map(put_global, params,
                            self._param_shardings(params))

    def _opt_tree_map(self, params: Dict, opt_tree, param_fn, other_fn):
        """Walk an optimizer-state-shaped tree: sub-trees structurally
        identical to ``params`` (mu/nu) map through ``param_fn``; every
        other leaf (step counts, empty states) through ``other_fn``."""
        pstruct = jax.tree_util.tree_structure(params)

        def rec(node):
            if isinstance(node, dict):
                if jax.tree_util.tree_structure(node) == pstruct:
                    return param_fn(node)
                return {k: rec(v) for k, v in node.items()}
            if isinstance(node, tuple):        # incl. optax NamedTuples
                children = [rec(c) for c in node]
                return (type(node)(*children) if hasattr(node, "_fields")
                        else tuple(children))
            if isinstance(node, list):
                return [rec(c) for c in node]
            return other_fn(node)

        return rec(opt_tree)

    def _place_opt_state(self, opt_state, params: Dict):
        """Place a LIVE optimizer state (host/device leaves) on the mesh:
        mu/nu get the params' FSDP/TP placement, everything else
        replicates.  Needed explicitly because ``jit(tx.init)`` constant-
        folds the zeros_like and XLA then parks the whole optimizer
        state on ONE device — full-model-size on that chip, silently
        voiding the ZeRO-3 memory contract (fresh init avoids this via
        :meth:`_init_opt_state_sharded`; this method re-places restored
        checkpoints)."""
        from dfu_multimodal_tpu.parallel.sharding import put_global
        return self._opt_tree_map(
            params, opt_state, self._place_params,
            lambda node: put_global(node, self.replicated))

    def _init_opt_state_sharded(self, params: Dict):
        """Fresh optimizer state with the correct sharded placement, via
        jit ``out_shardings`` — the zeros are CREATED sharded (works on
        multi-process meshes too, where re-placing a constant-folded
        single-device result would not)."""
        shardings = self._opt_tree_map(
            params, jax.eval_shape(self.tx.init, params),
            lambda node: self._param_shardings(node),
            lambda node: self.replicated)
        return jax.jit(self.tx.init, out_shardings=shardings)(params)

    def init_state(self, rng: jax.Array, image_size: int = 224) -> TrainState:
        variables = zoo.init_model(self.module, self.spec, rng, image_size)
        variables = unfreeze(variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        use_ema = float(getattr(self.cfg, "ema_decay", 0.0)) > 0.0

        def ema_copy(tree):
            # Fresh buffers (not aliases of params): the train step donates
            # the whole state, and a buffer may be donated only once.
            # jnp.copy under jit preserves each leaf's sharding, so the
            # EMA tree starts with exactly the params' placement (FSDP/TP
            # included).
            return jax.jit(lambda t: jax.tree.map(jnp.copy, t))(tree)

        if self.mesh.shape[mesh_mod.MODEL_AXIS] > 1 or self.fsdp:
            # Sharded params: Megatron-style TP over ``model``, or ZeRO-3
            # FSDP over ``data``.  The optimizer state gets the params'
            # placement EXPLICITLY via jit out_shardings — a plain
            # jit(tx.init) does NOT inherit it (zeros_like constant-
            # folds; XLA parks the result on one device).  put_global
            # placements make all of this multi-process safe (each host
            # contributes its addressable shards).
            from dfu_multimodal_tpu.parallel.sharding import put_global
            params = self._place_params(params)
            batch_stats = jax.tree.map(
                lambda v: put_global(v, self.replicated), batch_stats)
            ema = ema_copy(params) if use_ema else None
            return TrainState(
                step=put_global(jnp.zeros((), jnp.int32), self.replicated),
                params=params, batch_stats=batch_stats,
                opt_state=self._init_opt_state_sharded(params),
                ema_params=ema)

        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params),
                           ema_params=ema_copy(params) if use_ema else None)
        return jax.device_put(state, self.replicated)

    def variables(self, state: TrainState) -> Dict:
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # ------------------------------------------------------------- steps

    def _preprocess_train(self, rng: jax.Array,
                          batch: Dict[str, jnp.ndarray]) -> Tuple:
        inputs = []
        for i, m in enumerate(self.spec.inputs):
            key = jax.random.fold_in(rng, i)
            inputs.append(augment_and_normalize(
                key, batch[m], self.modalities[m], self.compute_dtype))
        return tuple(inputs)

    def _preprocess_eval(self, batch: Dict[str, jnp.ndarray]) -> Tuple:
        return tuple(
            eval_normalize(batch[m], self.modalities[m], self.compute_dtype)
            for m in self.spec.inputs)

    def _preprocess_train_spmd(self, rng: jax.Array,
                               batch: Dict[str, jnp.ndarray]) -> Tuple:
        """Shard_map counterpart of :meth:`_preprocess_train` (call ONLY
        inside a shard_map body over the data axis): per-shard
        augmentation drawing each row's key from the global split-stream
        (data/transforms.py::augment_and_normalize_spmd) — bit-identical
        augmentation to the single-program path."""
        from dfu_multimodal_tpu.data.transforms import (
            augment_and_normalize_spmd)

        n_shards = self.mesh.shape[mesh_mod.DATA_AXIS]
        return tuple(
            augment_and_normalize_spmd(
                jax.random.fold_in(rng, i), batch[m], self.modalities[m],
                self.compute_dtype, mesh_mod.DATA_AXIS, n_shards)
            for i, m in enumerate(self.spec.inputs))

    def _sample_weights(self, labels: jnp.ndarray,
                        valid: jnp.ndarray) -> jnp.ndarray:
        if self.class_weights is not None and self.cfg.class_weighted_loss:
            return jnp.asarray(self.class_weights)[labels] * valid
        return valid

    def build_train_step(self, jit: bool = True,
                         force_shard_map: bool = False) -> Callable:
        accum = max(1, int(getattr(self.cfg, "grad_accum", 1)))
        mix = float(getattr(self.cfg, "mixup_alpha", 0.0)) > 0.0
        # Fused kernels under SPMD, train side: the BN-free thermal model
        # (pure ViT — no cross-shard batch statistics) trains inside
        # jax.shard_map on a pure-DP mesh, with the gradient/metric
        # reductions as explicit psums (the same DP all-reduce XLA would
        # insert) — so multi-chip DP training keeps the fused Pallas
        # fwd+bwd kernels instead of falling back to the XLA blocks.
        # grad-accum composes (per-device microbatch scan of unnormalized
        # grads, ONE full-tree psum at the end — ∇(N/W) is linear in the
        # per-row contributions, so the spmd microbatch regrouping is
        # exact for BN-free models; BN models' microbatch statistics ARE
        # batch-global, so multimodal+accum keeps the jit path —
        # docs/DESIGN.md "Kernels under SPMD").  Mixup keeps the jit path
        # on any mesh: its batch-global permutation would need an
        # all-gather of the full augmented image batch (measured note in
        # DESIGN.md).
        bi = str(getattr(self.module, "block_impl", "auto"))
        if bi.startswith("fused_q8"):
            # serving-only kernels (no VJP): reject for TRAINING on any
            # mesh size with a readable error instead of dying deep in
            # autodiff with a raw "differentiation rule for pallas_call"
            raise ValueError(
                f"training with block_impl={bi!r} is not supported: the "
                "int8 kernels are serving-only (no VJP). Train bf16/fp32 "
                "and quantize at deployment (serve/predict --int8, or "
                "--qat to train through the serving grid).")
        # BN models qualify for the shard_map path only with cross-shard
        # stats wired (models/resnet.py bn_axis_name — multimodal sets
        # it in __init__ when this path will be built)
        bn_ok = (self.spec.name == "multimodal"
                 and getattr(self.module, "bn_axis_name", None)
                 == mesh_mod.DATA_AXIS)
        # grad-accum composes for the BN-free model only: multimodal's
        # bn_axis_name is never bound with accum > 1 (__init__), because
        # microbatch BN statistics are batch-GLOBAL groupings the
        # per-shard scan cannot reproduce (docs/DESIGN.md).  The spmd
        # accum scan also needs accum to divide the PER-DEVICE batch
        # (the jit scan only needs it to divide the global batch) — a
        # config where it doesn't, e.g. --batch-size 64 --grad-accum 16
        # on 8 chips, keeps the jit path rather than breaking a
        # previously working run.
        accum_ok = True
        if accum > 1:
            per_dev = (mesh_mod.pad_batch_to_mesh(self.cfg.batch_size,
                                                  self.mesh)
                       // self.mesh.shape[mesh_mod.DATA_AXIS])
            accum_ok = per_dev % accum == 0
        spmd_capable = ((self.spec.name == "thermal_only"
                         or (bn_ok and accum == 1))
                        and accum_ok and not mix)
        if force_shard_map and not spmd_capable:
            # an ignored force flag would make parity tests measure the
            # jit path and report vacuous success — fail loudly instead
            raise ValueError(
                "force_shard_map: this configuration cannot run the "
                "shard_map train path (needs thermal_only, or multimodal "
                "with bn_axis_name bound; no mixup; grad-accum only for "
                "the BN-free model and only when it divides the "
                "per-device batch)")
        use_shmap = spmd_capable and (
            (self._pure_dp and self._eval_shard_map) or force_shard_map)
        if self.mesh.size > 1 and not use_shmap:
            # Outside the shard_map path, Mosaic kernels cannot survive
            # a multi-device jit — reject mosaic impls with a readable
            # error instead of the raw "cannot be automatically
            # partitioned" (BN models need cross-shard stats; accum and
            # mixup configurations keep the XLA path).
            ai = str(getattr(self.module, "attention_impl", "auto"))
            if bi in ("fused", "fused_q8", "fused_q8s") or ai == "pallas":
                raise ValueError(
                    f"training with block_impl={bi!r}/attention_impl="
                    f"{ai!r} on a {self.mesh.size}-device mesh is only "
                    "supported for the shard_map path (thermal_only "
                    "trainable impls — grad-accum composes there when "
                    "it divides the per-device batch — or multimodal "
                    "without grad-accum; pure-DP, no mixup). "
                    "Train with 'auto' (XLA impls on this mesh) or on "
                    "one device.")
        module, spec, tx = self.module, self.spec, self.tx
        qat = bool(getattr(self.cfg, "qat", False))
        ema_decay = float(getattr(self.cfg, "ema_decay", 0.0))
        loss_name = getattr(self.cfg, "loss", "ce")
        if loss_name == "focal":
            gamma = float(getattr(self.cfg, "focal_gamma", 2.0))
            per_sample = partial(per_sample_focal, gamma=gamma)
        elif loss_name == "ce":
            per_sample = per_sample_ce
        else:
            raise ValueError(f"unknown loss {loss_name!r} "
                             "(choose 'ce' or 'focal')")
        mixup_alpha = float(getattr(self.cfg, "mixup_alpha", 0.0))
        if mixup_alpha > 0.0 and accum > 1:
            raise ValueError("mixup does not compose with --grad-accum "
                             "(mix pairs would be confined to one "
                             "microbatch); use one or the other")

        def ema_update(ema, new_params):
            # Static python branch: no lax.cond, the EMA tree-map simply
            # isn't in the traced program when EMA is off.
            if not ema_decay:
                return ema
            return jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, new_params)

        def apply_model(params, batch_stats, inputs, drop_rng):
            if qat:    # loss through serving-grid weights, STE gradients
                params = qat_mod.fake_quant_trunks(params)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                logits, new_state = module.apply(
                    variables, *inputs, train=True,
                    rngs={"dropout": drop_rng}, mutable=["batch_stats"])
                return logits, new_state["batch_stats"]
            # e.g. the pure-LayerNorm ViT: nothing mutable
            logits = module.apply(variables, *inputs, train=True,
                                  rngs={"dropout": drop_rng})
            return logits, batch_stats

        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                       rng: jax.Array):
            aug_rng, drop_rng = jax.random.split(jax.random.fold_in(
                rng, state.step))
            inputs = self._preprocess_train(aug_rng, batch)
            labels = batch["label"]
            valid = batch["valid"]
            weights = self._sample_weights(labels, valid)
            if mixup_alpha > 0.0:
                # a derived key, not a third split: the default path's
                # RNG streams stay bit-identical to mixup-off runs
                mixed, perm, lam_row = mixup_batch(
                    jax.random.fold_in(aug_rng, 7), inputs, valid,
                    mixup_alpha)
            else:
                mixed = inputs

            def loss_fn(params):
                logits, new_bs = apply_model(params, state.batch_stats,
                                             mixed, drop_rng)
                if mixup_alpha > 0.0:
                    loss = mixup_loss(per_sample, logits, labels, weights,
                                      valid, perm, lam_row)
                else:
                    loss = weighted_mean(per_sample(logits, labels),
                                         weights)
                return loss, (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt,
                                      ema_params=ema_update(state.ema_params,
                                                            new_params))
            preds = jnp.argmax(logits, axis=-1)
            counts = metrics_mod.confusion_counts(preds, labels,
                                                  batch["valid"])
            return new_state, {"loss": loss, "counts": counts}

        def train_step_accum(state: TrainState,
                             batch: Dict[str, jnp.ndarray], rng: jax.Array):
            """One optimizer step from ``accum`` sequential microbatches
            (lax.scan), EXACTLY reproducing the full-batch gradient: the
            weighted-CE numerator Σ wᵢ·ceᵢ and denominator Σ wᵢ accumulate
            separately, and ∇(N/W) = (Σ ∇Nₖ)/W because W is
            parameter-independent.  Peak activation memory is one
            microbatch.  BatchNorm running stats thread through the scan
            (one EMA update per microbatch — standard accumulation
            semantics, same as a torch accumulate loop); dropout draws a
            fresh key per microbatch."""
            aug_rng, drop_rng = jax.random.split(jax.random.fold_in(
                rng, state.step))
            inputs = self._preprocess_train(aug_rng, batch)
            labels = batch["label"]
            weights = self._sample_weights(labels, batch["valid"])
            b = labels.shape[0]
            if b % accum:
                raise ValueError(f"batch {b} not divisible by "
                                 f"grad_accum={accum}")
            mb = b // accum

            def split(x):
                return x.reshape(accum, mb, *x.shape[1:])

            mb_inputs = tuple(split(x) for x in inputs)
            scan_xs = (mb_inputs, split(labels), split(weights),
                       split(batch["valid"]),
                       jax.random.split(drop_rng, accum))

            def unnorm_loss(params, bs, xs, ys, ws, dr):
                logits, new_bs = apply_model(params, bs, xs, dr)
                return jnp.sum(ws * per_sample(logits, ys)), (logits,
                                                              new_bs)

            def body(carry, x):
                gacc, bs = carry
                xs, ys, ws, vd, dr = x
                (numer, (logits, new_bs)), g = jax.value_and_grad(
                    unnorm_loss, has_aux=True)(state.params, bs, xs, ys,
                                               ws, dr)
                gacc = jax.tree.map(jnp.add, gacc, g)
                counts = metrics_mod.confusion_counts(
                    jnp.argmax(logits, axis=-1), ys, vd)
                return (gacc, new_bs), (numer, jnp.sum(ws), counts)

            gacc0 = jax.tree.map(jnp.zeros_like, state.params)
            (gacc, new_bs), (numers, wsums, counts) = jax.lax.scan(
                body, (gacc0, state.batch_stats), scan_xs)
            wtotal = jnp.maximum(jnp.sum(wsums), 1e-12)
            grads = jax.tree.map(lambda g: g / wtotal, gacc)
            loss = jnp.sum(numers) / wtotal
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt,
                                      ema_params=ema_update(state.ema_params,
                                                            new_params))
            return new_state, {"loss": loss, "counts": counts.sum(axis=0)}

        if use_shmap:
            import contextlib

            from jax.sharding import PartitionSpec as P

            from dfu_multimodal_tpu.models import common as common_mod

            d_axis = mesh_mod.DATA_AXIS
            force = jax.devices()[0].platform == "tpu"
            preprocess_spmd = self._preprocess_train_spmd

            def train_step_spmd(state: TrainState,
                                batch: Dict[str, jnp.ndarray],
                                rng: jax.Array):
                ctx = (common_mod.force_mosaic_kernels() if force
                       else contextlib.nullcontext())
                with ctx:
                    aug_rng, drop_rng = jax.random.split(
                        jax.random.fold_in(rng, state.step))
                    inputs = preprocess_spmd(aug_rng, batch)
                    labels, valid = batch["label"], batch["valid"]
                    weights = self._sample_weights(labels, valid)
                    # dropout masks are generated at the SHARD's batch
                    # shape, so per-device streams must differ — the one
                    # (documented) RNG divergence from the jit path
                    drop_local = jax.random.fold_in(
                        drop_rng, jax.lax.axis_index(d_axis))

                    def loss_fn(params):
                        logits, new_bs = apply_model(
                            params, state.batch_stats, inputs, drop_local)
                        numer = jnp.sum(weights
                                        * per_sample(logits, labels))
                        return numer, (logits, new_bs)

                    # new_bs: with bn_axis_name bound, the BN batch stats
                    # pmean over the data axis inside apply, so the
                    # updated running stats are identical on every shard
                    # (replicated state stays consistent)
                    (numer, (logits, new_bs)), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(state.params)
                # grads of the UNNORMALIZED weighted sum, psum'd, then
                # divided by the global weight mass: exactly the
                # jit path's ∇(Σw·ce / Σw) since Σw is param-independent
                numer, den, g = jax.lax.psum(
                    (numer, jnp.sum(weights), g), d_axis)
                den = jnp.maximum(den, 1e-12)
                grads = jax.tree.map(lambda x: x / den, g)
                loss = numer / den
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_state = state.replace(
                    step=state.step + 1, params=new_params,
                    batch_stats=new_bs, opt_state=new_opt,
                    ema_params=ema_update(state.ema_params, new_params))
                counts = jax.lax.psum(
                    metrics_mod.confusion_counts(
                        jnp.argmax(logits, axis=-1), labels, valid),
                    d_axis)
                return new_state, {"loss": loss, "counts": counts}

            def train_step_accum_spmd(state: TrainState,
                                      batch: Dict[str, jnp.ndarray],
                                      rng: jax.Array):
                """Grad-accum inside the shard_map step (BN-free models):
                each device scans its OWN microbatches accumulating
                unnormalized grads/numerators, then ONE full-tree psum ÷
                the global weight mass — the same ∇(N/W) identity as the
                plain spmd step, so the result equals the jit accum step
                exactly (the microbatch REGROUPING — per-device slices vs
                global slices — changes nothing because the total is
                linear in per-row contributions; only fp summation order
                differs).  Peak activation memory stays one LOCAL
                microbatch per device."""
                ctx = (common_mod.force_mosaic_kernels() if force
                       else contextlib.nullcontext())
                with ctx:
                    aug_rng, drop_rng = jax.random.split(
                        jax.random.fold_in(rng, state.step))
                    inputs = preprocess_spmd(aug_rng, batch)
                    labels, valid = batch["label"], batch["valid"]
                    weights = self._sample_weights(labels, valid)
                    bl = labels.shape[0]
                    if bl % accum:
                        raise ValueError(
                            f"per-device batch {bl} not divisible by "
                            f"grad_accum={accum}")
                    mbl = bl // accum

                    def split(x):
                        return x.reshape(accum, mbl, *x.shape[1:])

                    drop_local = jax.random.fold_in(
                        drop_rng, jax.lax.axis_index(d_axis))
                    scan_xs = (tuple(split(x) for x in inputs),
                               split(labels), split(weights), split(valid),
                               jax.random.split(drop_local, accum))

                    def unnorm_loss(params, bs, xs, ys, ws, dr):
                        logits, new_bs = apply_model(params, bs, xs, dr)
                        return jnp.sum(ws * per_sample(logits, ys)), (
                            logits, new_bs)

                    def body(carry, x):
                        gacc, bs = carry
                        xs, ys, ws, vd, dr = x
                        (numer, (logits, new_bs)), g = jax.value_and_grad(
                            unnorm_loss, has_aux=True)(state.params, bs,
                                                       xs, ys, ws, dr)
                        gacc = jax.tree.map(jnp.add, gacc, g)
                        counts = metrics_mod.confusion_counts(
                            jnp.argmax(logits, axis=-1), ys, vd)
                        return (gacc, new_bs), (numer, jnp.sum(ws), counts)

                    gacc0 = jax.tree.map(jnp.zeros_like, state.params)
                    (gacc, new_bs), (numers, wsums, counts) = jax.lax.scan(
                        body, (gacc0, state.batch_stats), scan_xs)
                numer, den, gacc, counts = jax.lax.psum(
                    (jnp.sum(numers), jnp.sum(wsums), gacc,
                     counts.sum(axis=0)), d_axis)
                den = jnp.maximum(den, 1e-12)
                grads = jax.tree.map(lambda x: x / den, gacc)
                loss = numer / den
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_state = state.replace(
                    step=state.step + 1, params=new_params,
                    batch_stats=new_bs, opt_state=new_opt,
                    ema_params=ema_update(state.ema_params, new_params))
                return new_state, {"loss": loss, "counts": counts}

            spmd_body = (train_step_accum_spmd if accum > 1
                         else train_step_spmd)
            shmapped = jax.shard_map(
                spmd_body, mesh=self.mesh,
                in_specs=(P(), P(d_axis), P()),
                out_specs=(P(), {"loss": P(), "counts": P()}),
                check_vma=False)
            if not jit:
                return shmapped
            return jax.jit(shmapped, donate_argnums=(0,))

        step = train_step_accum if accum > 1 else train_step
        if not jit:
            return step             # raw body (e.g. for scanned benchmarks)
        return jax.jit(step, donate_argnums=(0,))

    def build_eval_step(self, force_shard_map: bool = False) -> Callable:
        """The jitted eval/serving forward.

        On a pure-DP multi-device mesh with fused kernels
        (``self._eval_shard_map``) the step is wrapped in ``jax.shard_map``
        over the data axis: each device traces a per-device program (so
        the Mosaic kernels never meet XLA's auto-partitioner), the
        batch-reduction metrics become explicit ``lax.psum``s, and the
        per-row outputs shard back over ``data`` — numerically the same
        contract as the plain jit path up to fp32 reduction order.
        ``force_shard_map`` exercises the wrapper regardless of impls
        (reduction-parity tests)."""
        module, spec = self.module, self.spec

        qat = bool(getattr(self.cfg, "qat", False))

        def eval_parts(variables: Dict, batch: Dict[str, jnp.ndarray]):
            if qat:     # validate on the same serving-grid weights QAT
                variables = {**variables,       # trains through
                             "params": qat_mod.fake_quant_trunks(
                                 variables["params"])}
            inputs = self._preprocess_eval(batch)
            labels = batch["label"]
            logits = module.apply(variables, *inputs, train=False)
            logits = logits.astype(jnp.float32)
            weights = self._sample_weights(labels, batch["valid"])
            # weighted CE split into numerator/denominator so the
            # shard_map path can psum each before the division
            num = jnp.sum(weights * per_sample_ce(logits, labels))
            den = jnp.sum(weights)
            probs = jax.nn.softmax(logits, axis=-1)[:, 1]
            preds = jnp.argmax(logits, axis=-1)
            counts = metrics_mod.confusion_counts(preds, labels,
                                                  batch["valid"])
            return num, den, counts, probs, preds

        # force_shard_map wraps even a 1-device mesh: that is how the
        # Mosaic-kernels-inside-shard_map compile/execute path is
        # validated on the single real TPU chip (scripts_dev/
        # bench_spmd_serving.py measures its overhead vs plain jit).
        use_shmap = self._eval_shard_map or force_shard_map
        if not use_shmap:
            def eval_step(variables: Dict, batch: Dict[str, jnp.ndarray]):
                num, den, counts, probs, preds = eval_parts(variables,
                                                            batch)
                return {"loss": num / jnp.maximum(den, 1e-12),
                        "counts": counts, "probs": probs, "preds": preds}

            return jax.jit(eval_step)

        import contextlib

        from jax.sharding import PartitionSpec as P

        from dfu_multimodal_tpu.models import common as common_mod

        d = mesh_mod.DATA_AXIS
        # only force "auto"->fused resolutions when the per-device
        # platform really is TPU (CPU tests request interpret impls
        # explicitly and need no forcing)
        force = jax.devices()[0].platform == "tpu"

        def spmd_eval_step(variables: Dict, batch: Dict[str, jnp.ndarray]):
            ctx = (common_mod.force_mosaic_kernels() if force
                   else contextlib.nullcontext())
            with ctx:
                num, den, counts, probs, preds = eval_parts(variables,
                                                            batch)
            num, den, counts = jax.lax.psum((num, den, counts), d)
            return {"loss": num / jnp.maximum(den, 1e-12),
                    "counts": counts, "probs": probs, "preds": preds}

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, so the checker cannot type them (jax 0.9 raises
        # "vma on jax.ShapeDtypeStruct must not be None").  The out_specs
        # above are correct by construction: loss/counts are psum'd
        # (replicated), probs/preds are per-row (batch-sharded).
        shmapped = jax.shard_map(
            spmd_eval_step, mesh=self.mesh, in_specs=(P(), P(d)),
            out_specs={"loss": P(), "counts": P(),
                       "probs": P(d), "preds": P(d)},
            check_vma=False)
        return jax.jit(shmapped)

    @property
    def train_step(self) -> Callable:
        if self._train_step is None:
            self._train_step = self.build_train_step()
        return self._train_step

    @property
    def eval_step(self) -> Callable:
        if self._eval_step is None:
            self._eval_step = self.build_eval_step()
        return self._eval_step

    # ------------------------------------------------------------- loops

    def run_train_epoch(self, state: TrainState, dataset: ArrayDataset,
                        np_rng: np.random.Generator, rng: jax.Array,
                        meter=None) -> Tuple[TrainState, EpochMetrics]:
        order = data_loader.epoch_indices(
            dataset.labels, np_rng, weighted=self.cfg.weighted_sampling)
        bs = mesh_mod.pad_batch_to_mesh(self.cfg.batch_size, self.mesh)
        step_metrics = []
        for batch in data_loader.device_prefetch(
                data_loader.batch_slices(dataset, order, bs),
                self.batch_sharding):
            state, m = self.train_step(state, batch, rng)
            step_metrics.append(m)
            if meter is not None:
                meter.update(bs)
        return state, self._reduce_epoch(step_metrics)

    def run_eval_epoch(self, state: TrainState, dataset: ArrayDataset
                       ) -> Tuple[EpochMetrics, Dict[str, np.ndarray]]:
        """Returns (metrics, {'y_true','y_pred','y_probs'}) with padding
        rows stripped."""
        bs = mesh_mod.pad_batch_to_mesh(self.cfg.eval_bs, self.mesh)
        if len(dataset) == 0:
            # fail like the train path's epoch_indices: an informative
            # error now, not a bare np.concatenate([]) crash after a full
            # train epoch
            raise ValueError(
                "cannot evaluate an empty dataset: the split directory "
                "has no images (check the data-dir layout)")
        variables = self.variables(state)
        outs, losses, counts = [], [], []
        for batch in data_loader.device_prefetch(
                data_loader.batch_slices(
                    dataset, np.arange(len(dataset)), bs),
                self.batch_sharding):
            out = self.eval_step(variables, batch)
            losses.append(out["loss"])
            counts.append(out["counts"])
            outs.append((out["preds"], out["probs"]))

        n = len(dataset)
        preds = np.concatenate([np.asarray(p) for p, _ in outs])[:n]
        probs = np.concatenate([np.asarray(pr) for _, pr in outs])[:n]
        total_counts = np.sum(np.asarray(jnp.stack(counts)), axis=0)
        metrics = EpochMetrics(
            loss=float(np.mean(np.asarray(jnp.stack(losses)))),
            accuracy=metrics_mod.accuracy_from_counts(total_counts),
            f1=metrics_mod.f1_from_counts(total_counts))
        arrays = {"y_true": np.asarray(dataset.labels), "y_pred": preds,
                  "y_probs": probs}
        return metrics, arrays

    def _reduce_epoch(self, step_metrics: List[Dict]) -> EpochMetrics:
        losses = np.asarray(jnp.stack([m["loss"] for m in step_metrics]))
        counts = np.sum(
            np.asarray(jnp.stack([m["counts"] for m in step_metrics])),
            axis=0)
        return EpochMetrics(loss=float(losses.mean()),
                            accuracy=metrics_mod.accuracy_from_counts(counts),
                            f1=metrics_mod.f1_from_counts(counts))

    # --------------------------------------------------------------- fit

    def fit(self, train_ds: ArrayDataset, val_ds: ArrayDataset,
            checkpoint_dir: Optional[Path] = None,
            image_size: int = 224, log: Callable[[str], None] = print,
            profile_dir: Optional[Path] = None,
            resume_from: Optional[Path] = None,
            init_from: Optional[Path] = None,
            metrics_jsonl: Optional[Path] = None
            ) -> Tuple[TrainState, Dict[str, List[float]], float]:
        """Full training run with the reference's epoch loop contract.
        Returns (final_state, history, best_val_f1).

        ``profile_dir`` captures a jax.profiler trace of epoch 2 (first
        epoch is compile-dominated). ``resume_from`` restores model +
        optimizer state and continues — a capability the reference lacks
        (it saves optimizer state but never reads it, SURVEY.md §5).
        ``init_from`` warm-starts the model weights only (fresh optimizer,
        epoch 1) from a converted/pretrained checkpoint directory — the
        reference's fine-tune-from-torchvision/timm flow
        (train_rgb_only.py:203-206; see docs/QUALITY_PARITY.md).
        ``metrics_jsonl`` appends one machine-readable JSON object per
        epoch (loss/acc/F1 for both splits, wall seconds, img/s/chip) —
        the observability stream the reference's print-only logging lacks
        (SURVEY.md §5 metrics row); append-mode so resumed runs extend
        the same file."""
        from dfu_multimodal_tpu.utils.logging import (ThroughputMeter,
                                                      profile_trace)

        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        state = self.init_state(rng, image_size)

        history: Dict[str, List[float]] = {
            "train_loss": [], "train_acc": [], "train_f1": [],
            "val_loss": [], "val_acc": [], "val_f1": []}
        best_val_f1 = 0.0
        start_epoch = 1

        # Resume prefers the per-epoch last_model (--save-last,
        # preemption-safe) when it is at least as recent as the best.
        resume_base = (ckpt_mod.resume_basename(resume_from)
                       if resume_from is not None else None)

        if init_from is not None and resume_base is None:
            state = self.restore(init_from, state=state,
                                 image_size=image_size, with_opt_state=False)
            log(f"Initialized model weights from {init_from}")

        if resume_base is not None:
            state = self.restore(resume_from, state=state,
                                 image_size=image_size,
                                 with_opt_state=True, basename=resume_base)
            meta = ckpt_mod.load_meta(resume_from, resume_base)
            start_epoch = int(meta.get("epoch", 0)) + 1
            best_val_f1 = float(meta.get("val_f1", 0.0))
            saved_history = meta.get("history", {})
            for key in history:
                history[key] = list(saved_history.get(key, []))
            log(f"Resumed from {resume_from} ({resume_base}) at epoch "
                f"{start_epoch} (best val F1 {best_val_f1:.4f})")

        use_ema = float(getattr(cfg, "ema_decay", 0.0)) > 0.0
        patience = int(getattr(cfg, "early_stop_patience", 0))
        best_seen, epochs_since_best = -1.0, 0
        multihost = jax.process_count() > 1
        use_async = getattr(cfg, "async_checkpoint", False) and not multihost
        if getattr(cfg, "async_checkpoint", False) and multihost:
            # the async saver's background fetch would run the multi-host
            # shard-gather collective on an unsynchronized daemon thread
            log("async checkpointing is single-process only; saving "
                "synchronously")
        saver = ckpt_mod.AsyncCheckpointer() if use_async else None
        base_save = (saver.save if saver is not None
                     else ckpt_mod.save_checkpoint)
        # Multi-host: every process runs the identical loop (the sharded
        # arrays are global), but exactly ONE process may touch shared
        # files — two writers racing unlink+write on the same
        # best_model.msgpack can interleave to a truncated checkpoint,
        # and the metrics JSONL would carry duplicate epoch lines.
        # Non-writer processes still CALL saves, with write=False: the
        # device->host fetch must gather non-addressable shards (FSDP/TP
        # over a multi-process mesh) with a collective every process
        # joins (utils/checkpoint.py::_to_numpy) — the save DECISION is
        # identical on all processes (same global metrics), so the
        # collective order matches.
        is_writer = jax.process_index() == 0
        save_fn = (base_save if is_writer
                   else partial(base_save, write=False))
        if not is_writer:      # implies multihost (rank > 0 exists)
            metrics_jsonl = None

        meter = ThroughputMeter(n_chips=self.mesh.size)
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            t0 = time.perf_counter()
            meter.reset()
            with profile_trace(profile_dir if epoch == 2 else None):
                state, train_m = self.run_train_epoch(
                    state, train_ds, np_rng, jax.random.fold_in(rng, epoch),
                    meter=meter)
            throughput = meter.summary()
            train_rate = meter.images_per_sec_per_chip
            # With EMA on, validation (and therefore best-checkpoint
            # selection) runs on the averaged weights — the weights a
            # deployment would actually serve.
            eval_state = (state.replace(params=state.ema_params)
                          if use_ema else state)
            val_m, _ = self.run_eval_epoch(eval_state, val_ds)
            dt = time.perf_counter() - t0

            history["train_loss"].append(train_m.loss)
            history["train_acc"].append(train_m.accuracy)
            history["train_f1"].append(train_m.f1)
            history["val_loss"].append(val_m.loss)
            history["val_acc"].append(val_m.accuracy)
            history["val_f1"].append(val_m.f1)

            log(f"[Epoch {epoch}/{cfg.num_epochs}] "
                f"Train Loss: {train_m.loss:.4f}, Acc: {train_m.accuracy:.4f},"
                f" F1: {train_m.f1:.4f} | "
                f"Val Loss: {val_m.loss:.4f}, Acc: {val_m.accuracy:.4f}, "
                f"F1: {val_m.f1:.4f} ({dt:.1f}s, {throughput})")

            if metrics_jsonl is not None:
                import json
                rec = {"epoch": epoch, "model": self.spec.name,
                       "train_loss": train_m.loss,
                       "train_acc": train_m.accuracy,
                       "train_f1": train_m.f1,
                       "val_loss": val_m.loss, "val_acc": val_m.accuracy,
                       "val_f1": val_m.f1, "seconds": round(dt, 3),
                       "images_per_sec_per_chip": round(train_rate, 2)}
                path = Path(metrics_jsonl)
                path.parent.mkdir(parents=True, exist_ok=True)
                with path.open("a") as f:
                    f.write(json.dumps(rec) + "\n")

            if (checkpoint_dir is not None
                    and epoch >= cfg.save_best_after_epoch
                    and val_m.f1 > best_val_f1):
                best_val_f1 = val_m.f1
                save_fn(
                    checkpoint_dir, epoch=epoch,
                    # EMA runs checkpoint the averaged weights as the
                    # model_state every downstream consumer loads, plus
                    # the raw params for exact mid-train resume.
                    model_state=self.variables(eval_state),
                    opt_state=state.opt_state, val_f1=val_m.f1,
                    history=history,
                    extra_meta={"model": self.spec.name,
                                **({"ema_decay": cfg.ema_decay}
                                   if use_ema else {})},
                    extra_state=({"raw_params": state.params}
                                 if use_ema else None))
                if is_writer:
                    log(f"  Saved BEST model (Val F1: {val_m.f1:.4f})")

            if checkpoint_dir is not None and getattr(cfg, "save_last",
                                                      False):
                # Per-epoch resume point (meta val_f1 carries the running
                # BEST so a resumed run keeps the best-save threshold).
                save_fn(checkpoint_dir, epoch=epoch,
                        model_state=self.variables(eval_state),
                        opt_state=state.opt_state, val_f1=best_val_f1,
                        history=history,
                        extra_meta={"model": self.spec.name,
                                    "last_val_f1": val_m.f1,
                                    **({"ema_decay": cfg.ema_decay}
                                       if use_ema else {})},
                        extra_state=({"raw_params": state.params}
                                     if use_ema else None),
                        basename=ckpt_mod.LAST_BASENAME)

            if val_m.f1 > best_seen + 1e-12:
                best_seen, epochs_since_best = val_m.f1, 0
            else:
                epochs_since_best += 1
            if patience and epochs_since_best >= patience:
                log(f"Early stopping at epoch {epoch}: no val-F1 "
                    f"improvement in {patience} epoch(s) "
                    f"(best {best_seen:.4f})")
                break

        if saver is not None:
            saver.wait()                 # final checkpoint durable
        return state, history, best_val_f1

    # ------------------------------------------------------------- load

    def restore(self, checkpoint_dir: Path, state: Optional[TrainState] = None,
                image_size: int = 224,
                with_opt_state: bool = False,
                basename: str = "best_model") -> TrainState:
        """Flexible restore into a fresh (or given) state; optionally also
        rebuilds the optimizer state for mid-train resume. ``basename``
        selects the artifact (best_model, or last_model for the
        --save-last per-epoch resume point)."""
        if state is None:
            state = self.init_state(jax.random.PRNGKey(0), image_size)
        payload, _ = ckpt_mod.load_checkpoint(checkpoint_dir, basename)
        target = self.variables(state)
        merged, _, _ = ckpt_mod.load_flexible(target, payload["model_state"])
        opt_state = state.opt_state
        if with_opt_state and payload.get("opt_state"):
            try:
                opt_state = ckpt_mod.restore_opt_state(state.opt_state,
                                                       payload["opt_state"])
            except (KeyError, ValueError, TypeError) as e:
                print(f"  (optimizer state not restored: {e})")
        params = merged["params"]
        ema_params = state.ema_params
        use_ema = float(getattr(self.cfg, "ema_decay", 0.0)) > 0.0
        if use_ema:
            # EMA checkpoints store the averaged weights as model_state
            # and the raw training params separately; resume continues
            # both trees exactly.  From a non-EMA (or converted)
            # checkpoint the EMA restarts at the loaded weights.  The EMA
            # tree is copied leaf-by-leaf: flexible merges can leave both
            # trees referencing the same fresh-init arrays, and the donated
            # train-step state must not alias buffers across fields.
            ema_params = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                      params)
            if payload.get("raw_params"):
                raw, _, _ = ckpt_mod.load_flexible(
                    {"params": target["params"]},
                    {"params": payload["raw_params"]}, verbose=False)
                params = raw["params"]
        batch_stats = merged.get("batch_stats", state.batch_stats)
        if self.fsdp or self.mesh.shape[mesh_mod.MODEL_AXIS] > 1:
            # load_flexible returns host arrays; re-apply the sharded
            # placement so a restored state trains with the same layout
            # (and memory footprint) as a fresh one.  That includes the
            # OPTIMIZER state (mu/nu mirror the params — left as host
            # arrays they would enter the first donated step uncommitted
            # and replicate per device, full-model-size, breaking the
            # ZeRO-3 memory contract exactly on --resume-from) and the
            # batch_stats (replicated, like init_state places them).
            params = self._place_params(params)
            if use_ema:
                ema_params = self._place_params(ema_params)
            opt_state = self._place_opt_state(opt_state, params)
            batch_stats = jax.device_put(batch_stats, self.replicated)
        return state.replace(
            params=params, batch_stats=batch_stats,
            opt_state=opt_state, ema_params=ema_params)
