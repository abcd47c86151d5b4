"""Typed configuration for every entry point.

The reference has no config system: each script hard-codes module-level
constants ("CHANGE THESE" comments are the config UX — see
reference notebooks/train_rgb_only.py:32-46).  Here every entry point takes a
small frozen dataclass whose defaults equal the reference constants, plus
argparse glue so data/checkpoint directories are flags instead of
``Path.home()``-anchored constants.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

IMAGE_SIZE = 224
NUM_CLASSES = 2
CLASS_NAMES = ("healthy", "ulcer")

# Normalization constants (reference scripts/dataloader.py:157-159, 180-183).
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)
THERMAL_MEAN = (0.5, 0.5, 0.5)
THERMAL_STD = (0.5, 0.5, 0.5)


@dataclass(frozen=True)
class AugmentConfig:
    """Device-side augmentation pipeline parameters.

    Defaults mirror the reference training transforms
    (train_rgb_only.py:102-111 / train_thermal_only.py:103-112 /
    train_multimodal_fusion.py:173-199): hflip/vflip p=0.5, rotation ±30°,
    then with probability ``aug_prob`` a color jitter and/or an affine
    (±20°, translate 0.1, scale 0.8–1.2), and for thermal a Gaussian blur.
    All of it runs inside the jitted train step on uint8 batches.
    """

    horizontal_flip_prob: float = 0.5
    vertical_flip_prob: float = 0.5
    rotation_degrees: float = 30.0
    aug_prob: float = 0.6                 # AUG_PROB in the reference
    # Color jitter (RGB only in the reference trainers)
    color_jitter: bool = True
    brightness: float = 0.3
    contrast: float = 0.3
    saturation: float = 0.3
    # Random affine applied with probability aug_prob
    affine: bool = True
    affine_degrees: float = 20.0
    affine_translate: float = 0.1
    affine_scale: Tuple[float, float] = (0.8, 1.2)
    # Gaussian blur (thermal trainer only: train_thermal_only.py:109)
    gaussian_blur: bool = False
    blur_kernel_size: int = 3
    blur_sigma: Tuple[float, float] = (0.1, 0.5)
    # Early-files lineage quirk: those pipelines apply the geometric augs
    # AFTER Normalize (reference scripts/early files/dataloader.py:123-147),
    # so torchvision's zero rotation fill lands at the normalization MEAN in
    # image space.  True = fill out-of-coverage pixels with the modality
    # mean instead of black (exact equivalent, see transforms._augment_one).
    fill_with_mean: bool = False


def rgb_augment() -> AugmentConfig:
    return AugmentConfig(color_jitter=True, gaussian_blur=False)


def thermal_augment(blur: bool = True) -> AugmentConfig:
    # train_thermal_only.py uses blur; the multimodal trainer's thermal
    # pipeline uses affine only (train_multimodal_fusion.py:191-199).
    return AugmentConfig(color_jitter=False, gaussian_blur=blur)


def legacy_augment() -> AugmentConfig:
    """Early-files transform pipeline (reference scripts/early
    files/dataloader.py:123-147): h/v flip p=0.5 + rotation ±15° only — no
    jitter, no affine, no blur — applied after Normalize, hence the
    mean-valued rotation fill."""
    return AugmentConfig(rotation_degrees=15.0, color_jitter=False,
                         affine=False, gaussian_blur=False,
                         fill_with_mean=True)


@dataclass(frozen=True)
class ModalityConfig:
    name: str = "rgb"
    mean: Tuple[float, float, float] = RGB_MEAN
    std: Tuple[float, float, float] = RGB_STD
    augment: AugmentConfig = field(default_factory=rgb_augment)


def rgb_modality() -> ModalityConfig:
    return ModalityConfig("rgb", RGB_MEAN, RGB_STD, rgb_augment())


def thermal_modality(blur: bool = True) -> ModalityConfig:
    return ModalityConfig("thermal", THERMAL_MEAN, THERMAL_STD, thermal_augment(blur))


def legacy_rgb_modality() -> ModalityConfig:
    return ModalityConfig("rgb", RGB_MEAN, RGB_STD, legacy_augment())


def legacy_thermal_modality() -> ModalityConfig:
    return ModalityConfig("thermal", THERMAL_MEAN, THERMAL_STD,
                          legacy_augment())


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape. ``data`` is the batch-sharded DP axis over ICI;
    ``model`` is reserved for tensor-parallel experiments (defaults to 1 —
    the 25M–110M-param models here do not need TP, SURVEY.md §2.3)."""

    data: int = -1          # -1: use all available devices
    model: int = 1
    # ZeRO-3-style fully-sharded data parallelism: params + optimizer state
    # shard over ``data`` (parallel/sharding.py::fsdp_param_specs); XLA
    # inserts the per-use all-gathers. Never *needed* at this project's
    # 23-110M-param scale (replicated DP fits easily), but completes the
    # parallelism matrix (dp / tp / pp / fsdp) for larger backbones.
    fsdp: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Reference constants: train_rgb_only.py:33-40 (batch 32),
    train_thermal_only.py:34-41 (batch 16), train_multimodal_fusion.py:36-43
    (batch 6)."""

    batch_size: int = 32
    num_epochs: int = 10
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    drop_rate: float = 0.5
    save_best_after_epoch: int = 3
    seed: int = 42
    # TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"       # conv/matmul compute precision
    # AdamW first-moment storage dtype.  bf16 halves the m read+write HBM
    # traffic of the update (28 -> 24 B/param: measured 4.95 -> 4.23 ms on
    # the 85.8 M-param thermal tree at b32, scripts_dev/bench_adamw2.py);
    # the second moment stays fp32 (squares need the mantissa).  Standard
    # large-scale practice; set "float32" for bit-level optax parity.
    optimizer_mu_dtype: str = "bfloat16"
    # Gradient accumulation: split each global batch into this many
    # microbatches inside ONE jitted step (a lax.scan), summing the
    # unnormalized weighted-CE and Σw separately so the accumulated
    # gradient is EXACTLY the full-batch gradient (train/engine.py).
    # Peak activation memory drops ~grad_accum×; BatchNorm models update
    # running stats once per microbatch (standard accumulation semantics).
    grad_accum: int = 1
    # Quantization-aware training (train/qat.py): compute the loss through
    # ViT encoder kernels AND ResNet stage convs snapped to their int8
    # serving grids (straight-through estimator), so the int8 conversion
    # at deployment is essentially lossless.  No-op for models without
    # either trunk kind.
    qat: bool = False
    # Learning-rate schedule (train/engine.py::learning_rate_schedule).
    # The reference trains at a constant LR (its default here); 'cosine'
    # and warmup_epochs are opt-in for the pretrained fine-tune recipe.
    # steps_per_epoch is derived from the dataset by the train CLIs —
    # schedules need a step horizon, constant LR ignores it.
    lr_schedule: str = "constant"          # 'constant' | 'cosine'
    warmup_epochs: float = 0.0
    steps_per_epoch: int = 0
    # Model EMA (train/engine.py): keep an exponential moving average of
    # the params on device (ema = d·ema + (1-d)·params per optimizer
    # step, updated inside the jitted train step) and validate/checkpoint
    # with the averaged weights — the standard production trick for
    # stabler small-dataset fine-tunes.  0 disables (reference behavior:
    # the reference has no EMA).  Checkpoints written with EMA on store
    # the EMA weights as model_state (what eval/predict/serve consume)
    # plus the raw params for exact mid-train resume.
    ema_decay: float = 0.0
    # Early stopping: stop after this many consecutive epochs without a
    # val-F1 improvement.  0 disables (the reference always runs the full
    # num_epochs).  Composes with best-by-val-F1 checkpointing — the
    # saved checkpoint is unaffected, only wasted tail epochs are cut.
    early_stop_patience: int = 0
    # Async checkpointing (utils/checkpoint.py::AsyncCheckpointer): the
    # best-model save's device→host fetch + msgpack write run in a
    # background thread over an on-device snapshot, overlapping the next
    # training epoch — the fetch alone is seconds over the axon tunnel.
    # Off by default: the synchronous path is the bit-identical baseline.
    async_checkpoint: bool = False
    # Preemption-safe training: additionally write a per-epoch
    # ``last_model`` checkpoint (model + optimizer + EMA + history), so
    # --resume continues from the LAST completed epoch instead of
    # replaying everything after the best one.  The best-model artifact
    # contract is untouched.
    save_last: bool = False
    # Training loss (train/engine.py). 'ce' = the reference's
    # class-weighted cross-entropy (default, bit-compatible). 'focal'
    # = focal loss FL = w·(1-p_y)^gamma·CE — down-weights easy examples,
    # the standard alternative for hard class imbalance; validation/test
    # losses stay plain weighted CE so runs remain comparable.
    loss: str = "ce"                       # 'ce' | 'focal'
    focal_gamma: float = 2.0
    # Mixup (train/engine.py::mixup_batch): per-batch lam ~ Beta(a, a),
    # inputs mixed with a random permutation partner, loss the
    # lam-weighted sum over both label targets. Padded rows never
    # corrupt a real one (a row whose partner is padding keeps lam=1).
    # 0 disables (reference behavior). Train-step metrics score the
    # unmixed labels (standard practice).
    mixup_alpha: float = 0.0
    eval_batch_size: Optional[int] = None  # defaults to batch_size
    weighted_sampling: bool = True         # WeightedRandomSampler equivalent
    class_weighted_loss: bool = True       # class-weighted CE equivalent
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @property
    def eval_bs(self) -> int:
        return self.eval_batch_size or self.batch_size


@dataclass(frozen=True)
class DataConfig:
    data_dir: Path = Path.home() / "CompVis" / "Dataset" / "data"
    checkpoint_root: Path = Path("logs")
    image_size: int = IMAGE_SIZE
    cache_images: bool = True      # decode+resize once, keep uint8 in RAM
    prefetch: int = 2              # device prefetch depth (double buffering)
    # Persistent mmap-backed decode cache (data/cache.py): decode once
    # ACROSS runs, bounded-RAM build, datasets larger than host memory.
    # None = in-RAM decode per run (fine at reference scale).
    cache_dir: Optional[Path] = None


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--data-dir", type=Path, default=None,
                        help="Root containing rgb/ and thermal/ split dirs")
    parser.add_argument("--checkpoint-root", type=Path, default=Path("logs"),
                        help="Directory for checkpoints and result artifacts")
    parser.add_argument("--cache-dir", type=Path, default=None,
                        help="persistent mmap-backed decode cache directory "
                             "(decode once across runs; datasets larger "
                             "than RAM). Also settable as DFU_CACHE_DIR.")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--weight-decay", type=float, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save-best-after", type=int, default=None,
                        help="first epoch eligible for best-checkpoint save "
                             "(reference: 3)")
    parser.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                        default="bfloat16")
    parser.add_argument("--optimizer-mu-dtype",
                        choices=["bfloat16", "float32"], default="bfloat16",
                        help="AdamW first-moment storage dtype (bf16 halves "
                             "the m-state HBM traffic; float32 for "
                             "bit-level optax parity)")
    parser.add_argument("--mesh-data", type=int, default=-1,
                        help="DP axis size (-1 = all devices)")
    parser.add_argument("--lr-schedule", choices=["constant", "cosine"],
                        default="constant",
                        help="constant (reference behavior) or cosine "
                             "decay over the full run")
    parser.add_argument("--warmup-epochs", type=float, default=0.0,
                        help="linear LR warmup over this many epochs "
                             "(fractional ok; composes with either "
                             "schedule)")
    parser.add_argument("--fsdp", action="store_true",
                        help="fully-sharded data parallelism: params + "
                             "optimizer state shard over the data axis "
                             "(ZeRO-3 memory scaling; XLA inserts the "
                             "per-use all-gathers)")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="microbatches per optimizer step (exact "
                             "full-batch gradients, ~N× lower activation "
                             "memory; batch size must divide evenly)")
    parser.add_argument("--ema-decay", type=float, default=0.0,
                        help="model EMA decay (e.g. 0.999): validate and "
                             "checkpoint with exponentially-averaged "
                             "weights; 0 = off (reference behavior)")
    parser.add_argument("--early-stop-patience", type=int, default=0,
                        help="stop after this many epochs without val-F1 "
                             "improvement; 0 = off (reference always "
                             "runs the full epoch budget)")
    parser.add_argument("--save-last", action="store_true",
                        help="also checkpoint every epoch as last_model.* "
                             "so --resume continues from the last "
                             "completed epoch (preemption-safe); the "
                             "best_model contract is unchanged")
    parser.add_argument("--async-checkpoint", action="store_true",
                        help="write best-model checkpoints in a "
                             "background thread over an on-device "
                             "snapshot (overlaps the device->host fetch "
                             "and disk write with the next epoch)")
    parser.add_argument("--qat", action="store_true",
                        help="quantization-aware training: loss through "
                             "ViT encoder kernels and ResNet stage convs "
                             "snapped to their int8 serving grids "
                             "(straight-through estimator), making "
                             "predict --int8 conversion ~lossless")
    parser.add_argument("--loss", choices=["ce", "focal"], default="ce",
                        help="training loss: class-weighted CE (reference "
                             "default) or focal loss (down-weights easy "
                             "examples; eval stays CE)")
    parser.add_argument("--focal-gamma", type=float, default=2.0,
                        help="focal-loss focusing exponent (with "
                             "--loss focal)")
    parser.add_argument("--mixup-alpha", type=float, default=0.0,
                        help="mixup Beta(a, a) strength (e.g. 0.2); "
                             "0 = off (reference behavior)")


def train_config_from_args(args: argparse.Namespace,
                           defaults: TrainConfig) -> TrainConfig:
    updates = {}
    if args.batch_size is not None:
        updates["batch_size"] = args.batch_size
    if args.epochs is not None:
        updates["num_epochs"] = args.epochs
    if args.lr is not None:
        updates["learning_rate"] = args.lr
    if args.weight_decay is not None:
        updates["weight_decay"] = args.weight_decay
    if args.save_best_after is not None:
        updates["save_best_after_epoch"] = args.save_best_after
    updates["seed"] = args.seed
    updates["compute_dtype"] = args.compute_dtype
    updates["optimizer_mu_dtype"] = args.optimizer_mu_dtype
    updates["grad_accum"] = args.grad_accum
    updates["qat"] = args.qat
    updates["loss"] = getattr(args, "loss", "ce")
    updates["focal_gamma"] = getattr(args, "focal_gamma", 2.0)
    updates["mixup_alpha"] = getattr(args, "mixup_alpha", 0.0)
    updates["lr_schedule"] = getattr(args, "lr_schedule", "constant")
    updates["warmup_epochs"] = getattr(args, "warmup_epochs", 0.0)
    updates["ema_decay"] = getattr(args, "ema_decay", 0.0)
    updates["early_stop_patience"] = getattr(args, "early_stop_patience", 0)
    updates["async_checkpoint"] = getattr(args, "async_checkpoint", False)
    updates["save_last"] = getattr(args, "save_last", False)
    updates["mesh"] = MeshConfig(data=args.mesh_data,
                                 fsdp=getattr(args, "fsdp", False))
    return dataclasses.replace(defaults, **updates)


def data_config_from_args(args: argparse.Namespace) -> DataConfig:
    kwargs = {}
    if args.data_dir is not None:
        kwargs["data_dir"] = args.data_dir
    kwargs["checkpoint_root"] = args.checkpoint_root
    if getattr(args, "cache_dir", None) is not None:
        kwargs["cache_dir"] = args.cache_dir
        # Process-wide so every decode_all in this run — dataset loads,
        # predict/serve calibration batches — hits the same cache.
        import os
        os.environ["DFU_CACHE_DIR"] = str(args.cache_dir)
    return DataConfig(**kwargs)
