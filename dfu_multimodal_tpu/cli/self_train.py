"""Semi-supervised self-training entry point (`dfu self-train`).

For deployments with FEW labeled images and a directory of unlabeled
ones (the common clinical reality): iteratively train, pseudo-label the
pool at a confidence threshold, and retrain on labeled + adopted images
(train/self_train.py).  Composes with SSL pretraining::

    dfu pretrain --modality rgb --data-dir data --out pre_rgb
    dfu self-train --modality rgb --data-dir data \\
        --unlabeled-dir pool_images/ --init-from pre_rgb \\
        --rounds 3 --threshold 0.9

The labeled set is the standard ``data/<modality>/train`` split (however
small); val drives best-round selection; test stays untouched.  Writes
``checkpoints_<model>_selftrain/best_model.*`` (the winning round) plus a
``self_train_report.json`` audit of per-round adoption counts.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Semi-supervised self-training over an unlabeled pool")
    p.add_argument("--data-dir", type=Path, required=True,
                   help="root with <modality>/{train,val,test} labeled "
                        "splits (train may be tiny)")
    p.add_argument("--unlabeled-dir", type=Path, required=True,
                   help="flat directory of unlabeled images (the pool)")
    p.add_argument("--modality", choices=["rgb", "thermal"], default="rgb")
    p.add_argument("--model", default=None,
                   help="model-zoo name (default: the modality's "
                        "reference model — rgb_only / thermal_only)")
    p.add_argument("--checkpoint-root", type=Path, default=Path("logs"))
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--threshold", type=float, default=0.9,
                   help="adopt a pool image when max-class prob >= this")
    p.add_argument("--max-per-class", type=int, default=None,
                   help="per-round cap on adopted pseudo-labels per class")
    p.add_argument("--no-balance", action="store_true",
                   help="skip class-balancing the adopted set (default "
                        "adopts the min of the two classes' counts)")
    p.add_argument("--epochs", type=int, default=10,
                   help="training epochs per round")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--lr-schedule", choices=["constant", "cosine"],
                   default="cosine",
                   help="cosine by default: every round is a short "
                        "fine-tune")
    p.add_argument("--init-from", type=Path, default=None,
                   help="warm-start EVERY round from this checkpoint "
                        "(e.g. a dfu-pretrain SSL trunk)")
    return p


def main(argv=None) -> int:
    import numpy as np

    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.data.loader import (ArrayDataset, decode_all,
                                                load_single_modality)
    from dfu_multimodal_tpu.data.layout import list_images
    from dfu_multimodal_tpu.train.self_train import (SelfTrainConfig,
                                                     self_train)

    args = build_parser().parse_args(argv)
    model = args.model or {"rgb": "rgb_only",
                           "thermal": "thermal_only"}[args.modality]
    modality = (cfg_mod.rgb_modality() if args.modality == "rgb"
                else cfg_mod.thermal_modality())

    labeled = load_single_modality(args.data_dir / args.modality, "train",
                                   args.image_size, args.modality)
    val_ds = load_single_modality(args.data_dir / args.modality, "val",
                                  args.image_size, args.modality)
    pool_paths = sorted(list_images(args.unlabeled_dir))
    if not pool_paths:
        raise SystemExit(f"no images under {args.unlabeled_dir}")
    pool = ArrayDataset(
        arrays={args.modality: decode_all(pool_paths, args.image_size)},
        labels=np.zeros(len(pool_paths), np.int32),     # ignored
        paths={args.modality: list(pool_paths)})

    print(f"Self-training {model}: {len(labeled)} labeled, "
          f"{len(pool)} unlabeled pool, {args.rounds} rounds @ "
          f"threshold {args.threshold}")
    train_cfg = cfg_mod.TrainConfig(
        batch_size=args.batch_size, num_epochs=args.epochs,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        seed=args.seed, compute_dtype=args.compute_dtype,
        lr_schedule=args.lr_schedule,
        save_best_after_epoch=1)
    st_cfg = SelfTrainConfig(rounds=args.rounds, threshold=args.threshold,
                             max_per_class=args.max_per_class,
                             balance=not args.no_balance)
    ckpt_dir = args.checkpoint_root / f"checkpoints_{model}_selftrain"
    trainer, state, report = self_train(
        model, st_cfg, train_cfg, {args.modality: modality}, labeled,
        pool, val_ds, ckpt_dir, init_from=args.init_from,
        image_size=args.image_size)

    (ckpt_dir / "self_train_report.json").write_text(
        json.dumps({"model": model, "threshold": args.threshold,
                    "rounds": report}, indent=2))
    print(f"Report: {ckpt_dir / 'self_train_report.json'}")

    test_dir = args.data_dir / args.modality / "test"
    if test_dir.exists():
        test_ds = load_single_modality(args.data_dir / args.modality,
                                       "test", args.image_size,
                                       args.modality)
        m, _ = trainer.run_eval_epoch(state, test_ds)
        print(f"Test: acc {m.accuracy:.4f}, F1 {m.f1:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
