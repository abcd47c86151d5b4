"""Self-supervised pretraining: SimCLR (contrastive) and MAE (masked
autoencoding) for the two trunk families.

Why this exists: the reference's headline accuracies depend on torchvision/
timm *pretrained* backbones (reference notebooks/train_rgb_only.py:203-206,
train_thermal_only.py:188-205) — with ~700-1200 training images, training
from scratch cannot reach them.  In a zero-egress deployment those weights
are unreachable, so the framework manufactures its own initialization from
the unlabeled training images:

- **SimCLR** (either trunk): two independently-augmented views per image,
  a 2-layer projection head, NT-Xent contrastive loss.  TPU-native detail:
  under a data-parallel mesh the (2B, 2B) similarity matrix is formed from
  the batch-sharded projections inside one jitted step — XLA inserts the
  all-gather over ICI, so every device contrasts against the GLOBAL batch
  (large negative pools are exactly what the hardware is good at).
- **MAE** (ViT trunk): mask 75% of the 196 patches, encode only the
  visible tokens (the ``keep_ids`` path of models/vit.py), decode with a
  small ViT decoder, MSE on per-patch-normalized pixels of the masked
  patches.  The encoder runs at 50 tokens instead of 197 — pretraining
  steps cost ~1/4 of a supervised forward.

The produced checkpoints use the training checkpoint format with the trunk
under its classifier scope name (``ResNet_0``/``ViT_0``) *and* its fusion-
branch alias (``rgb_branch``/``thermal_branch``), so every train CLI can
warm-start from them directly via ``--init-from`` (the projection/decoder
params are skipped by the flexible restore).
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import unfreeze

from dfu_multimodal_tpu.config import AugmentConfig, ModalityConfig
from dfu_multimodal_tpu.data import loader as data_loader
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.data.transforms import augment_and_normalize
from dfu_multimodal_tpu.models.resnet import ResNet50
from dfu_multimodal_tpu.models.vit import ViT, EncoderBlock
from dfu_multimodal_tpu.parallel import mesh as mesh_mod
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

# Trunk scope -> multimodal branch scope: the pretrained trunk is saved
# under both so one checkpoint warm-starts the unimodal classifiers AND
# the fusion model (whose branches the reference also builds pretrained,
# train_multimodal_fusion.py:285-326).
SCOPE_ALIASES = {"ResNet_0": "rgb_branch", "ViT_0": "thermal_branch"}


@dataclass(frozen=True)
class PretrainConfig:
    """Defaults follow small-data SSL practice, not the reference (which
    has no SSL); they are tuned for the ~1k-image DFU splits where many
    cheap epochs beat few expensive ones."""

    method: str = "simclr"              # 'simclr' | 'mae'
    batch_size: int = 64
    num_epochs: int = 100
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    warmup_epochs: float = 5.0
    seed: int = 42
    compute_dtype: str = "bfloat16"
    save_every: int = 0                 # also checkpoint every N epochs
    # SimCLR
    temperature: float = 0.2
    proj_hidden: int = 512
    proj_dim: int = 128
    # SimCLR's view augmentation encodes which invariances the features
    # keep: color jitter makes them color-INVARIANT, which is wrong when
    # the class signal is chromatic (ulcer redness).  Measured on the
    # hard synthetic rehearsal: with jitter, fine-tune F1 at 32 labels/
    # class LANDS BELOW from-scratch (0.81 vs 0.89); without, see
    # RESULTS_REHEARSAL.md.  Disable for color-diagnostic domains.
    simclr_color_jitter: bool = True
    # MAE
    mask_ratio: float = 0.75
    norm_pix: bool = True
    decoder_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    # ViT trunk architecture (defaults = ViT-B/16; overridable so tests
    # and small-image experiments can pretrain small ViTs)
    vit_patch: int = 16
    vit_hidden: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    mesh: Any = None                    # MeshConfig or None (all devices)


# --------------------------------------------------------------- augment


def simclr_augment(base: AugmentConfig,
                   color_jitter: bool = True) -> AugmentConfig:
    """Strengthened view pipeline: contrastive learning needs harder
    positives than supervised training (SimCLR's central finding), so the
    affine crop/scale range and jitter widen relative to the reference
    train transforms; flips/rotation stay.  ``color_jitter=False`` keeps
    the features color-SENSITIVE — use when the class signal is chromatic
    (see PretrainConfig.simclr_color_jitter)."""
    return dataclasses.replace(
        base, aug_prob=1.0, affine=True, affine_degrees=30.0,
        affine_translate=0.2, affine_scale=(0.4, 1.0),
        color_jitter=base.color_jitter and color_jitter,
        brightness=0.4, contrast=0.4, saturation=0.4)


def mae_augment(base: AugmentConfig) -> AugmentConfig:
    """MAE wants LIGHT augmentation (crop + flip only, per the paper —
    masking is the augmentation): geometric crop/zoom, no photometric
    noise that would corrupt the pixel reconstruction target."""
    return dataclasses.replace(
        base, aug_prob=1.0, rotation_degrees=0.0, color_jitter=False,
        gaussian_blur=False, affine=True, affine_degrees=0.0,
        affine_translate=0.1, affine_scale=(0.6, 1.0))


def ssl_modality(modality: ModalityConfig, method: str,
                 color_jitter: bool = True) -> ModalityConfig:
    if method == "simclr":
        aug = simclr_augment(modality.augment, color_jitter)
    else:
        aug = mae_augment(modality.augment)
    return dataclasses.replace(modality, augment=aug)


# ----------------------------------------------------------------- losses


def nt_xent_row_losses(z1: jnp.ndarray, z2: jnp.ndarray,
                       valid: jnp.ndarray, temperature: float = 0.2
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-anchor NT-Xent losses over the 2B projected views: returns
    ``(losses, v2)`` with shape (2B,) each, where ``v2`` is the doubled
    validity mask.  Split out so the shard_map SimCLR step can weight
    only its LOCAL anchor rows while every row still contrasts against
    the full global negative pool (train/ssl.py SPMD path).

    Padded rows (``valid==0``, the fixed-shape batch tail) are excluded
    both as anchors (zero loss weight) and as negatives (their similarity
    column is masked).  Masking uses a large finite negative, not -inf:
    an all--inf row would make log_softmax NaN and the NaN would leak
    through the zero loss weight's gradient (0*NaN).
    """
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    sim = (z @ z.T) / temperature                          # (2B, 2B)
    v2 = jnp.concatenate([valid, valid]).astype(jnp.float32)
    neg = jnp.asarray(-1e9, jnp.float32)
    mask = jnp.eye(2 * b, dtype=bool) | (v2[None, :] < 0.5)
    sim = jnp.where(mask, neg, sim)
    pos = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logprob = jax.nn.log_softmax(sim, axis=-1)
    return -logprob[jnp.arange(2 * b), pos], v2


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray, valid: jnp.ndarray,
                 temperature: float = 0.2) -> jnp.ndarray:
    """Normalized-temperature cross entropy over the 2B projected views
    (see :func:`nt_xent_row_losses` for the masking semantics)."""
    losses, v2 = nt_xent_row_losses(z1, z2, valid, temperature)
    return jnp.sum(losses * v2) / jnp.maximum(jnp.sum(v2), 1e-12)


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, gh*gw, p*p*C) in EXACTLY the patch-embed layout
    of models/vit.py (same reshape/transpose), so ``keep_ids`` indices and
    reconstruction targets refer to the same patches."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def random_keep_ids(key: jax.Array, batch: int, num_patches: int,
                    keep: int) -> jnp.ndarray:
    """Per-sample uniform-without-replacement visible-patch indices
    (B, keep) int32."""
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: jax.random.permutation(k, num_patches)[:keep]
    )(keys).astype(jnp.int32)


def keep_mask_from_ids(keep_ids: jnp.ndarray,
                       num_patches: int) -> jnp.ndarray:
    """(B, K) indices -> (B, num_patches) {0,1} mask of VISIBLE patches."""
    return jnp.clip(
        jax.nn.one_hot(keep_ids, num_patches, dtype=jnp.float32).sum(axis=1),
        0.0, 1.0)


def masked_pixel_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      keep_ids: jnp.ndarray, valid: jnp.ndarray,
                      norm_pix: bool = True) -> jnp.ndarray:
    """MSE over MASKED patches only (MAE semantics); ``norm_pix``
    normalizes each target patch to zero mean / unit variance (the paper's
    norm_pix_loss, better representations than raw pixels)."""
    if norm_pix:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
        axis=-1)                                           # (B, P)
    masked = (1.0 - keep_mask_from_ids(keep_ids, target.shape[1]))
    w = masked * valid[:, None].astype(jnp.float32)
    return jnp.sum(per_patch * w) / jnp.maximum(jnp.sum(w), 1e-12)


# ----------------------------------------------------------------- models


class _TinySSLTrunk(nn.Module):
    """Minutes-scale stand-in trunk for tests/smoke runs (mirrors
    zoo.TinyCNN's conv stack without the head)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        for i, feats in enumerate((16, 32)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.5,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


class SimCLRModel(nn.Module):
    """trunk -> features -> 2-layer projection MLP -> (B, proj_dim).

    The trunk scope is pinned to the classifier's name so the pretrained
    checkpoint merges into ResNetClassifier/ViTClassifier (and, via
    SCOPE_ALIASES at save time, into the fusion branches)."""

    trunk: str = "resnet"               # 'resnet' | 'vit' | 'tiny'
    proj_hidden: int = 512
    proj_dim: int = 128
    dtype: Any = jnp.float32
    block_impl: str = "auto"
    attention_impl: str = "auto"
    vit_cfg: Tuple[int, int, int, int] = (16, 768, 12, 12)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.trunk == "resnet":
            feats = ResNet50(dtype=self.dtype, block_impl=self.block_impl,
                             name="ResNet_0")(x, train=train)
        elif self.trunk == "vit":
            p, hid, depth, heads = self.vit_cfg
            feats = ViT(patch_size=p, hidden_dim=hid, depth=depth,
                        num_heads=heads, dtype=self.dtype,
                        attention_impl=self.attention_impl,
                        block_impl=self.block_impl, name="ViT_0")(
                            x, train=train)
        elif self.trunk == "tiny":
            feats = _TinySSLTrunk(dtype=self.dtype, name="trunk")(
                x, train=train)
        else:
            raise ValueError(f"unknown trunk {self.trunk!r}")
        z = nn.Dense(self.proj_hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_fc1")(feats)
        z = nn.relu(z)
        z = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_fc2")(z)
        return z.astype(jnp.float32)


class MAEModel(nn.Module):
    """ViT encoder on visible tokens + small ViT decoder reconstructing
    every patch; returns (B, num_patches, p*p*3) pixel predictions."""

    dtype: Any = jnp.float32
    attention_impl: str = "xla"       # masked sequences run the XLA blocks
    vit_cfg: Tuple[int, int, int, int] = (16, 768, 12, 12)
    decoder_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, keep_ids: jnp.ndarray, *,
                 train: bool = False) -> jnp.ndarray:
        p, hid, depth, heads = self.vit_cfg
        b, h, w, c = x.shape
        num_patches = (h // p) * (w // p)
        # The fused Pallas block kernels are tuned for the 197-token
        # production shape; the 1+K masked sequence runs the flax/XLA
        # blocks (cheap at 50 tokens, and mesh-shardable).
        tokens = ViT(patch_size=p, hidden_dim=hid, depth=depth,
                     num_heads=heads, dtype=self.dtype,
                     attention_impl=self.attention_impl,
                     block_impl="flax", name="ViT_0")(
                         x, train=train, keep_ids=keep_ids,
                         return_tokens=True)               # (B, 1+K, hid)
        dt = self.dtype
        z = nn.Dense(self.decoder_dim, dtype=dt, param_dtype=jnp.float32,
                     name="dec_embed")(tokens.astype(dt))
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.decoder_dim), jnp.float32)
        full = jnp.broadcast_to(
            mask_token.astype(dt), (b, num_patches, self.decoder_dim))
        # scatter the encoded visible tokens back to their patch slots
        full = jax.vmap(lambda f, ids, e: f.at[ids].set(e))(
            full, keep_ids, z[:, 1:])
        dec_pos = self.param("dec_pos_embed",
                             nn.initializers.normal(stddev=0.02),
                             (1, num_patches + 1, self.decoder_dim),
                             jnp.float32)
        seq = jnp.concatenate([z[:, :1], full], axis=1) + dec_pos.astype(dt)
        for i in range(self.decoder_depth):
            seq, _ = EncoderBlock(self.decoder_heads, 4, dt, "xla",
                                  name=f"dec_block{i}")(seq)
        seq = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                           name="dec_norm")(seq)
        pred = nn.Dense(p * p * c, dtype=dt, param_dtype=jnp.float32,
                        name="dec_pred")(seq[:, 1:])
        return pred.astype(jnp.float32)


# ----------------------------------------------------------------- engine


class SSLState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def alias_model_state(model_state: Dict) -> Dict:
    """Duplicate each canonical trunk scope under its fusion-branch alias
    so one pretrain checkpoint warm-starts every model family."""
    out = {}
    for col, sub in model_state.items():
        new = dict(sub)
        for canon, alias in SCOPE_ALIASES.items():
            if canon in sub:
                new[alias] = sub[canon]
        out[col] = new
    return out


class SSLTrainer:
    """Lean pretraining engine: jitted donated step over the (data, model)
    mesh, warmup-cosine AdamW, epoch loop over unlabeled images.  Reuses
    the supervised engine's mesh/prefetch/checkpoint plumbing."""

    def __init__(self, trunk: str, cfg: PretrainConfig,
                 modality: ModalityConfig, mesh=None,
                 image_size: int = 224, block_impl: str = "auto",
                 attention_impl: str = "auto"):
        from dfu_multimodal_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
        if cfg.method not in ("simclr", "mae"):
            raise ValueError(f"unknown SSL method {cfg.method!r}")
        if cfg.method == "mae" and trunk != "vit":
            raise ValueError("MAE pretrains the ViT trunk only "
                             "(masked patch tokens); use --method simclr "
                             f"for trunk {trunk!r}")
        wants_mosaic = (str(block_impl).startswith("fused")
                        or attention_impl == "pallas")
        if cfg.method == "mae" and (wants_mosaic or block_impl == "int8"):
            raise ValueError(
                "MAE encodes masked 1+K-token sequences — the fused "
                "Pallas kernels are tuned for the 197-token production "
                "shape, so MAE impls are fixed to the XLA blocks "
                f"(got block_impl={block_impl!r})")
        self.cfg = cfg
        self.trunk = trunk
        self.image_size = image_size
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        self.compute_dtype = dtype
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh(cfg.mesh)
        self.batch_sharding = mesh_mod.batch_sharding(self.mesh)
        self.replicated = mesh_mod.replicated(self.mesh)
        self.modality = ssl_modality(modality, cfg.method,
                                     cfg.simclr_color_jitter)
        vit_cfg = (cfg.vit_patch, cfg.vit_hidden, cfg.vit_depth,
                   cfg.vit_heads)
        # Fused kernels under SPMD (round-5): SimCLR over the (BN-free)
        # ViT trunk on a pure-DP mesh trains inside jax.shard_map — the
        # per-device traces keep the fused Pallas blocks, and the global
        # NT-Xent negatives arrive via an in-shard all_gather of the
        # (small) projection vectors (build_train_step).  Pretraining is
        # the longest-running workload in the framework, so this is the
        # one place a pod-sized run would otherwise pay the ~2.3x-slower
        # XLA ViT forward (docs/DESIGN.md measured table).
        self._pure_dp = (self.mesh.size > 1
                         and self.mesh.shape[mesh_mod.MODEL_AXIS] == 1)
        auto = "auto" in (block_impl, attention_impl)
        self._spmd = (cfg.method == "simclr" and trunk == "vit"
                      and self._pure_dp
                      and (wants_mosaic
                           or (auto
                               and jax.devices()[0].platform == "tpu")))
        if self.mesh.size > 1 and not self._spmd:
            if wants_mosaic:
                # Mosaic kernels cannot survive a plain multi-device jit
                # and only the SimCLR/ViT step has a shard_map wrapper
                raise ValueError(
                    f"block_impl={block_impl!r}/attention_impl="
                    f"{attention_impl!r} on a {self.mesh.size}-device "
                    "mesh is only supported for the shard_map SimCLR "
                    "path (trunk 'vit', pure data-parallel mesh). Use "
                    "'auto' (XLA impls on this mesh) or one device.")
            # other multi-device cases run the XLA paths under jit
            # ("auto" resolves per-device; force for clarity)
            block_impl = "flax"
            attention_impl = "xla"
        if cfg.method == "simclr":
            self.module = SimCLRModel(
                trunk=trunk, proj_hidden=cfg.proj_hidden,
                proj_dim=cfg.proj_dim, dtype=dtype, block_impl=block_impl,
                attention_impl=attention_impl, vit_cfg=vit_cfg)
        else:
            self.module = MAEModel(
                dtype=dtype, vit_cfg=vit_cfg, decoder_dim=cfg.decoder_dim,
                decoder_depth=cfg.decoder_depth,
                decoder_heads=cfg.decoder_heads)
        self.num_patches = (image_size // cfg.vit_patch) ** 2
        self.keep = max(1, int(round(
            self.num_patches * (1.0 - cfg.mask_ratio))))
        self._train_step = None
        self._tx = None

    # ------------------------------------------------------------- state

    def _schedule(self, steps_per_epoch: int):
        total = max(1, steps_per_epoch * self.cfg.num_epochs)
        # optax requires decay_steps > warmup_steps (it cosines over the
        # difference), so clamp warmup strictly below the horizon — a
        # 1-step run degenerates to pure cosine.
        warm = max(0, min(int(round(self.cfg.warmup_epochs
                                    * steps_per_epoch)), total - 1))
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=self.cfg.learning_rate,
            warmup_steps=warm, decay_steps=total, end_value=0.0)

    def make_tx(self, steps_per_epoch: int):
        self._tx = optax.adamw(self._schedule(steps_per_epoch),
                               b1=0.9, b2=0.999, eps=1e-8,
                               weight_decay=self.cfg.weight_decay,
                               mu_dtype=jnp.bfloat16)
        return self._tx

    def init_state(self, rng: jax.Array, steps_per_epoch: int) -> SSLState:
        tx = self.make_tx(steps_per_epoch)
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3),
                          self.compute_dtype)
        if self.cfg.method == "simclr":
            variables = self.module.init(rng, dummy, train=False)
        else:
            ids = jnp.zeros((1, self.keep), jnp.int32)
            variables = self.module.init(rng, dummy, ids, train=False)
        variables = unfreeze(variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = SSLState(step=jnp.zeros((), jnp.int32), params=params,
                         batch_stats=batch_stats, opt_state=tx.init(params))
        return jax.device_put(state, self.replicated)

    def variables(self, state: SSLState) -> Dict:
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # ------------------------------------------------------------- steps

    def _apply_simclr(self, params, batch_stats, x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            z, aux = self.module.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
            return z, aux["batch_stats"]
        return self.module.apply(variables, x, train=True), batch_stats

    def _project_views(self, params, batch_stats, v1, v2):
        """(z1, z2, new_batch_stats) for the two augmented views.

        BN-free trunks (ViT) run ONE forward over the concatenated 2B
        batch — row-wise identical math (LayerNorm/attention are
        per-image), half the dispatches/block-scans.  BN trunks keep the
        two-pass form: concatenation would compute batch statistics over
        both views at once (different normalization = a different
        training run), and the stats must thread view1 -> view2 exactly
        as before."""
        if batch_stats:
            z1, bs = self._apply_simclr(params, batch_stats, v1)
            z2, bs = self._apply_simclr(params, bs, v2)
            return z1, z2, bs
        b = v1.shape[0]
        z, _ = self._apply_simclr(params, batch_stats,
                                  jnp.concatenate([v1, v2], axis=0))
        return z[:b], z[b:], batch_stats

    def build_train_step(self, force_shard_map: bool = False) -> Callable:
        cfg, tx = self.cfg, self._tx
        modality, dtype = self.modality, self.compute_dtype
        mod_name = self.modality.name
        if force_shard_map and not (
                cfg.method == "simclr"
                and (self.mesh.size == 1
                     or (self._pure_dp and self.trunk == "vit"))):
            # an ignored force flag would make parity tests measure the
            # jit path and report vacuous success — fail loudly instead.
            # (BN trunks are excluded on multi-device meshes: per-shard
            # batch statistics would silently diverge from the jit
            # path's global-batch BN; a 1-device shard_map — the real-
            # Mosaic chip probe — has one shard and is exact.)
            raise ValueError(
                "force_shard_map: the SSL shard_map path covers SimCLR "
                "with the (BN-free) ViT trunk on a pure-DP mesh, or any "
                "SimCLR trunk on a 1-device mesh")
        if self._spmd or force_shard_map:
            return self._build_simclr_spmd_step()

        def simclr_step(state: SSLState, batch: Dict, rng: jax.Array):
            k1, k2 = jax.random.split(jax.random.fold_in(rng, state.step))
            v1 = augment_and_normalize(k1, batch[mod_name], modality, dtype)
            v2 = augment_and_normalize(k2, batch[mod_name], modality, dtype)

            def loss_fn(params):
                z1, z2, bs = self._project_views(params, state.batch_stats,
                                                 v1, v2)
                return nt_xent_loss(z1, z2, batch["valid"],
                                    cfg.temperature), bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 batch_stats=new_bs, opt_state=new_opt
                                 ), loss

        def mae_step(state: SSLState, batch: Dict, rng: jax.Array):
            r = jax.random.fold_in(rng, state.step)
            k_aug, k_mask = jax.random.split(r)
            x = augment_and_normalize(k_aug, batch[mod_name], modality,
                                      dtype)
            keep_ids = random_keep_ids(k_mask, x.shape[0],
                                       self.num_patches, self.keep)
            target = patchify(x.astype(jnp.float32), cfg.vit_patch)

            def loss_fn(params):
                pred = self.module.apply({"params": params}, x, keep_ids,
                                         train=True)
                return masked_pixel_loss(pred, target, keep_ids,
                                         batch["valid"], cfg.norm_pix)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt_state=new_opt), loss

        step = simclr_step if cfg.method == "simclr" else mae_step
        return jax.jit(step, donate_argnums=(0,))

    def _build_simclr_spmd_step(self) -> Callable:
        """SimCLR step inside ``jax.shard_map`` over the data axis:
        per-device traces keep the fused Pallas ViT blocks on multi-chip
        DP (models/common.py::force_mosaic_kernels), and the GLOBAL
        NT-Xent negative pool is restored by an in-shard ``all_gather``
        of the projection vectors — each device forms the full (2B, 2B)
        similarity matrix (tiny: proj_dim columns) but weights only its
        LOCAL anchor rows; psum of the unnormalized anchor losses ÷ the
        global valid count reproduces the jit path's loss and gradient
        exactly (up to fp summation order), because the count is
        parameter-independent (the same ∇(N/W) identity as
        train/engine.py).  Augmentation draws each row's keys from the
        global split-stream (sliced per shard) — bit-identical views to
        the jit path.  The ViT trunk is BN-free and dropout-free, so
        there is NO RNG divergence from the jit path at all."""
        import contextlib

        from jax.sharding import PartitionSpec as P

        from dfu_multimodal_tpu.data.transforms import (
            augment_and_normalize_spmd)
        from dfu_multimodal_tpu.models import common as common_mod

        cfg, tx = self.cfg, self._tx
        modality, dtype = self.modality, self.compute_dtype
        mod_name = self.modality.name
        d_axis = mesh_mod.DATA_AXIS
        n_shards = self.mesh.shape[d_axis]
        force = jax.devices()[0].platform == "tpu"

        def aug_view(key, images):
            """Per-shard view from the GLOBAL per-row key stream (shared
            recipe with the supervised engine — transforms.py)."""
            return augment_and_normalize_spmd(key, images, modality,
                                              dtype, d_axis, n_shards)

        def simclr_step_spmd(state: SSLState, batch: Dict,
                             rng: jax.Array):
            ctx = (common_mod.force_mosaic_kernels() if force
                   else contextlib.nullcontext())
            with ctx:
                k1, k2 = jax.random.split(
                    jax.random.fold_in(rng, state.step))
                v1 = aug_view(k1, batch[mod_name])
                v2 = aug_view(k2, batch[mod_name])
                valid = batch["valid"]
                bl = valid.shape[0]
                idx = jax.lax.axis_index(d_axis)
                rows = jnp.arange(bl * n_shards)
                local = ((rows >= idx * bl)
                         & (rows < (idx + 1) * bl)).astype(jnp.float32)

                def loss_fn(params):
                    z1, z2, bs = self._project_views(
                        params, state.batch_stats, v1, v2)
                    z1g = jax.lax.all_gather(z1, d_axis, tiled=True)
                    z2g = jax.lax.all_gather(z2, d_axis, tiled=True)
                    vg = jax.lax.all_gather(valid, d_axis, tiled=True)
                    losses, v2mask = nt_xent_row_losses(
                        z1g, z2g, vg, cfg.temperature)
                    w = v2mask * jnp.concatenate([local, local])
                    return jnp.sum(losses * w), (jnp.sum(w), bs)

                (numer, (cnt, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            numer, cnt, g = jax.lax.psum((numer, cnt, g), d_axis)
            cnt = jnp.maximum(cnt, 1e-12)
            grads = jax.tree.map(lambda x: x / cnt, g)
            loss = numer / cnt
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 batch_stats=new_bs,
                                 opt_state=new_opt), loss

        shmapped = jax.shard_map(
            simclr_step_spmd, mesh=self.mesh,
            in_specs=(P(), P(d_axis), P()),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(shmapped, donate_argnums=(0,))

    @property
    def train_step(self) -> Callable:
        if self._train_step is None:
            self._train_step = self.build_train_step()
        return self._train_step

    # --------------------------------------------------------------- fit

    def save(self, directory: Path, state: SSLState, epoch: int,
             history: Dict[str, List[float]]) -> None:
        ckpt_mod.save_checkpoint(
            Path(directory), epoch=epoch,
            model_state=alias_model_state(self.variables(state)),
            opt_state=state.opt_state, val_f1=0.0, history=history,
            extra_meta={"ssl_method": self.cfg.method, "trunk": self.trunk,
                        "image_size": self.image_size,
                        "pretrain": dataclasses.asdict(
                            dataclasses.replace(self.cfg, mesh=None))})

    def restore(self, directory: Path, state: SSLState
                ) -> Tuple[SSLState, int, Dict[str, List[float]]]:
        """Resume pretraining: model + optimizer state + epoch counter."""
        payload, meta = ckpt_mod.load_checkpoint(Path(directory))
        target = self.variables(state)
        merged, _, _ = ckpt_mod.load_flexible(target, payload["model_state"],
                                              verbose=False)
        opt_state = state.opt_state
        if payload.get("opt_state"):
            try:
                opt_state = ckpt_mod.restore_opt_state(state.opt_state,
                                                       payload["opt_state"])
            except (KeyError, ValueError, TypeError) as e:
                print(f"  (optimizer state not restored: {e})")
        state = state.replace(
            params=merged["params"],
            batch_stats=merged.get("batch_stats", state.batch_stats),
            opt_state=opt_state)
        history = {k: list(v) for k, v in
                   meta.get("history", {}).items()}
        return state, int(meta.get("epoch", 0)), history

    def fit(self, dataset: ArrayDataset, checkpoint_dir: Path,
            log: Callable[[str], None] = print,
            resume: bool = False) -> Tuple[SSLState, Dict[str, List[float]]]:
        cfg = self.cfg
        bs = mesh_mod.pad_batch_to_mesh(cfg.batch_size, self.mesh)
        n = len(dataset)
        steps_per_epoch = max(1, -(-n // bs))
        rng = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        state = self.init_state(rng, steps_per_epoch)
        history: Dict[str, List[float]] = {"loss": []}
        start_epoch = 1
        if resume and (Path(checkpoint_dir) / "best_model.msgpack").exists():
            state, last_epoch, history = self.restore(checkpoint_dir, state)
            history.setdefault("loss", [])
            start_epoch = last_epoch + 1
            # keep the host-side shuffle stream aligned with a fresh run
            for _ in range(last_epoch):
                np_rng.permutation(n)
            log(f"Resumed pretraining at epoch {start_epoch}")

        for epoch in range(start_epoch, cfg.num_epochs + 1):
            t0 = time.perf_counter()
            order = np_rng.permutation(n)
            losses = []
            for batch in data_loader.device_prefetch(
                    data_loader.batch_slices(dataset, order, bs),
                    self.batch_sharding):
                state, loss = self.train_step(
                    state, batch, jax.random.fold_in(rng, epoch))
                losses.append(loss)
            mean_loss = float(np.mean(np.asarray(jnp.stack(losses))))
            history["loss"].append(mean_loss)
            dt = time.perf_counter() - t0
            rate = n / max(dt, 1e-9) / self.mesh.size
            log(f"[Pretrain {cfg.method} {epoch}/{cfg.num_epochs}] "
                f"loss {mean_loss:.4f} ({dt:.1f}s, {rate:.0f} img/s/chip)")
            if cfg.save_every and epoch % cfg.save_every == 0:
                self.save(checkpoint_dir, state, epoch, history)
        self.save(checkpoint_dir, state, cfg.num_epochs, history)
        log(f"Saved pretrained trunk to {checkpoint_dir} "
            f"(use --init-from with any train CLI)")
        return state, history
