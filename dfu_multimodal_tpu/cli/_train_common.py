"""Shared implementation of the three training entry points.

The reference scripts share an identical skeleton with per-model edits
(SURVEY.md §3.1); here the skeleton lives once and each CLI supplies a small
recipe: model name, modalities, defaults, dataset loading.  Output contracts
match the reference: ``<ckpt-root>/checkpoints_<name>/best_model.*`` and
``test_results.pt`` with keys test_preds/test_labels/test_probs/test_acc/
test_f1/test_loss (reference notebooks/train_rgb_only.py:372-379).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from dfu_multimodal_tpu import config as cfg_mod
from dfu_multimodal_tpu.config import DataConfig, ModalityConfig, TrainConfig
from dfu_multimodal_tpu.data import check_split_leakage
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.eval import metrics as metrics_mod
from dfu_multimodal_tpu.train.engine import (Trainer,
                                             class_weights_from_labels)
from dfu_multimodal_tpu.utils.artifacts import save_pt


@dataclass(frozen=True)
class TrainRecipe:
    name: str                       # checkpoint dir suffix, e.g. "rgb_only"
    model: str                      # model-zoo name
    title: str                      # banner text
    modalities: Dict[str, ModalityConfig]
    defaults: TrainConfig
    load_datasets: Callable[[DataConfig, argparse.Namespace],
                            Dict[str, ArrayDataset]]
    leakage_name: str = ""


def build_parser(recipe: TrainRecipe) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=recipe.title)
    cfg_mod.add_common_args(parser)
    parser.add_argument("--model", default=recipe.model,
                        help="model-zoo name override (e.g. tiny_rgb for "
                             "smoke runs)")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--attention-impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--no-leakage-check", action="store_true")
    parser.add_argument("--skip-test-eval", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="resume from this run's best checkpoint "
                             "(model + optimizer state)")
    parser.add_argument("--init-from", type=Path, default=None,
                        help="warm-start the model weights from a "
                             "converted/pretrained checkpoint directory "
                             "(cli.convert_checkpoint output) — fresh "
                             "optimizer, epoch 1")
    parser.add_argument("--profile-dir", type=Path, default=None,
                        help="write a jax.profiler trace of epoch 2 here")
    parser.add_argument("--log-jsonl", type=Path, default=None,
                        help="append one machine-readable JSON object per "
                             "epoch (losses, accs, F1s, seconds, img/s/"
                             "chip) to this file — structured stream for "
                             "dashboards/run comparison")
    parser.add_argument("--debug-nans", action="store_true",
                        help="raise at the first NaN produced under jit")
    return parser


def _write_run_info(ckpt_dir: Path, recipe: TrainRecipe, args, train_cfg,
                    argv) -> None:
    """Reproducibility manifest next to the checkpoint: the exact command,
    resolved config, library/backend versions. The reference records
    nothing about how a checkpoint was produced (SURVEY.md §5 config
    row); this makes every training artifact auditable."""
    import json
    import sys

    import jax

    info = {
        "model": args.model,
        "recipe": recipe.name,
        "argv": list(sys.argv[1:] if argv is None else argv),
        "config": {k: (str(v) if isinstance(v, Path) else v)
                   for k, v in dataclasses.asdict(train_cfg).items()},
        "jax_version": jax.__version__,
        "backend": jax.devices()[0].platform,
        "device_count": jax.device_count(),
        "python": sys.version.split()[0],
    }
    (Path(ckpt_dir) / "run_info.json").write_text(
        json.dumps(info, indent=2, default=str))


def run_training(recipe: TrainRecipe,
                 argv: Optional[list] = None) -> Dict[str, float]:
    parser = build_parser(recipe)
    args = parser.parse_args(argv)
    train_cfg = cfg_mod.train_config_from_args(args, recipe.defaults)
    data_cfg = cfg_mod.data_config_from_args(args)

    import jax
    if args.debug_nans:
        from dfu_multimodal_tpu.utils.logging import enable_nan_debugging
        enable_nan_debugging(True)
    ckpt_dir = Path(data_cfg.checkpoint_root) / f"checkpoints_{recipe.name}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    print(f"Device: {jax.devices()[0].platform} x{jax.device_count()}")
    print(f"Data Directory: {data_cfg.data_dir}")
    print(f"Checkpoint Directory: {ckpt_dir}\n")

    print("Loading datasets...")
    datasets = recipe.load_datasets(
        dataclasses.replace(data_cfg, image_size=args.image_size), args)
    for split in ("train", "val", "test"):
        ds = datasets[split]
        counts = ds.class_counts
        print(f"  {split.upper()}: {len(ds)} samples "
              f"({counts[0]} healthy, {counts[1]} ulcer)")

    if not args.no_leakage_check:
        for modality in datasets["train"].modalities:
            check_split_leakage(
                {split: datasets[split].paths.get(modality, [])
                 for split in ("train", "val", "test")},
                name=f"{recipe.leakage_name or recipe.name}/{modality}")

    labels = datasets["train"].labels
    class_weights = class_weights_from_labels(labels)
    counts = np.bincount(labels, minlength=2)
    print(f"\nTraining class counts: healthy={counts[0]}, ulcer={counts[1]}")
    print(f"Using class weights for loss: {class_weights.tolist()}")

    if (train_cfg.lr_schedule != "constant" or train_cfg.warmup_epochs
            ) and train_cfg.steps_per_epoch == 0:
        # schedules need a step horizon; ceil over the unpadded batch size
        # (mesh padding can only round the batch up, shortening the epoch
        # by <1 step — negligible against a full-run decay)
        spe = -(-len(datasets["train"]) // train_cfg.batch_size)
        train_cfg = dataclasses.replace(train_cfg, steps_per_epoch=spe)

    if (jax.devices()[0].platform == "tpu"
            and args.model in ("thermal_only", "multimodal")
            and train_cfg.batch_size < 64):
        # measured batch-scaling study (docs/DESIGN.md, round 3): the
        # ViT-trunk steps gain up to +7% img/s at b128 vs the reference
        # defaults (b16 thermal / b6 multimodal); the defaults stay
        # reference-parity, so surface the knob instead of changing it
        print(f"\nHint: batch size {train_cfg.batch_size} is below this "
              "chip's sweet spot for ViT-trunk training — --batch-size "
              "64+ measured up to +7% throughput (docs/DESIGN.md batch-"
              "scaling study); defaults stay at the reference values.")

    print("\nBuilding model...")
    trainer = Trainer(args.model, train_cfg, recipe.modalities,
                      class_weights=class_weights,
                      attention_impl=args.attention_impl)
    print(f"Model: {args.model} "
          f"(compute dtype {train_cfg.compute_dtype}, "
          f"mesh data={trainer.mesh.shape['data']})")

    print("\n" + "=" * 70)
    print(recipe.title.upper())
    print("=" * 70)
    state, history, best_val_f1 = trainer.fit(
        datasets["train"], datasets["val"], checkpoint_dir=ckpt_dir,
        image_size=args.image_size, profile_dir=args.profile_dir,
        resume_from=ckpt_dir if args.resume else None,
        init_from=args.init_from, metrics_jsonl=args.log_jsonl)

    print("\n" + "=" * 70)
    print(f"TRAINING COMPLETE - Best Val F1: {best_val_f1:.4f}")
    print("=" * 70)

    _write_run_info(ckpt_dir, recipe, args, train_cfg, argv)

    # Drift baseline: per-channel intensity histograms + moments of the
    # TRAIN split's raw uint8 images (eval/drift.py). serve auto-loads it
    # to score live traffic (PSI); predict --drift-check uses it offline.
    from dfu_multimodal_tpu.eval import drift as drift_mod
    drift_mod.save_baseline(
        ckpt_dir / drift_mod.BASELINE_FILENAME,
        drift_mod.baseline_from_arrays(datasets["train"].arrays,
                                       paths=datasets["train"].paths))

    results = {"best_val_f1": best_val_f1}
    if not args.skip_test_eval:
        print("\nEvaluating on test set...")
        if getattr(train_cfg, "ema_decay", 0.0) > 0.0:
            # EMA runs validate/checkpoint/deploy the averaged weights —
            # test the same ones (final-epoch EMA, mirroring the
            # reference's test-the-final-model flow).
            state = state.replace(params=state.ema_params)
        test_m, arrays = trainer.run_eval_epoch(state, datasets["test"])
        test_acc = metrics_mod.compute_all_metrics(
            arrays["y_true"], arrays["y_pred"])["accuracy"]
        print("\n" + "=" * 70)
        print(f"TEST RESULTS ({recipe.name.upper()})")
        print("=" * 70)
        print(f"Test Loss: {test_m.loss:.4f}")
        print(f"Test Acc:  {test_m.accuracy:.4f}")
        print(f"Test F1:   {test_m.f1:.4f}")
        print("=" * 70)

        save_pt({
            "test_preds": arrays["y_pred"],
            "test_labels": arrays["y_true"],
            "test_probs": arrays["y_probs"],
            "test_acc": test_m.accuracy,
            "test_f1": test_m.f1,
            "test_loss": test_m.loss,
        }, ckpt_dir / "test_results.pt")
        results.update(test_acc=test_acc, test_f1=test_m.f1,
                       test_loss=test_m.loss)
        print(f"\nTraining complete!")
        if (ckpt_dir / "best_model.msgpack").exists():
            print(f"Best model saved to: {ckpt_dir / 'best_model.msgpack'}")
        else:
            # reference save contract: best-by-val-F1, epoch >=
            # save_best_after_epoch, STRICT improvement over 0.0 — a run
            # whose val F1 never rose above zero writes nothing
            print("WARNING: no best_model checkpoint was written — val F1 "
                  f"never improved after epoch {train_cfg.save_best_after_epoch} "
                  "(train longer, or lower --save-best-after)")
        print(f"Test results saved to: {ckpt_dir / 'test_results.pt'}")
    return results
