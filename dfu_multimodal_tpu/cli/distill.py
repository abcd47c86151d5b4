"""Knowledge-distillation entry point (`dfu distill`).

Compress a trained checkpoint into a smaller student (train/distill.py)::

    # same-modality compression: ResNet50 -> ResNet18
    dfu distill --teacher-checkpoint logs/checkpoints_rgb_only \\
        --student resnet18_rgb --data-dir data

    # cross-modal: multimodal teacher -> RGB-only student
    dfu distill --teacher-checkpoint logs/checkpoints_multimodal \\
        --student resnet18_rgb --data-dir data

Writes ``checkpoints_<student>_distilled/best_model.*`` +
``test_results.pt`` with the standard artifact contract, so
extended-metrics / predict / serve / export consume the student like any
other checkpoint.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Distill a trained teacher into a smaller student")
    p.add_argument("--teacher-checkpoint", type=Path, required=True)
    p.add_argument("--teacher-model", default=None,
                   help="zoo name of the teacher (default: read from the "
                        "checkpoint's meta)")
    p.add_argument("--student", default="resnet18_rgb",
                   help="zoo name of the student (resnet18_rgb / "
                        "resnet18_thermal / any zoo model)")
    p.add_argument("--data-dir", type=Path, required=True)
    p.add_argument("--checkpoint-root", type=Path, default=Path("logs"))
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--alpha", type=float, default=0.7,
                   help="weight of the soft-target KL term")
    p.add_argument("--temperature", type=float, default=4.0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--lr-schedule", choices=["constant", "cosine"],
                   default="cosine")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware distillation: the student "
                        "trains through its int8 serving grid (ResNet "
                        "stage convs / ViT encoder kernels snapped with "
                        "straight-through gradients, train/qat.py), so "
                        "the int8 student deployment is ~lossless")
    p.add_argument("--skip-test-eval", action="store_true")
    return p


def main(argv=None) -> int:
    import numpy as np

    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.data.loader import (load_paired,
                                                load_single_modality)
    from dfu_multimodal_tpu.eval import metrics as metrics_mod
    from dfu_multimodal_tpu.models import zoo
    from dfu_multimodal_tpu.train.distill import (DistillConfig,
                                                  DistillTrainer)
    from dfu_multimodal_tpu.train.engine import (Trainer,
                                                 class_weights_from_labels)
    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod
    from dfu_multimodal_tpu.utils.artifacts import save_pt

    args = build_parser().parse_args(argv)
    teacher_model = args.teacher_model or ckpt_mod.load_meta(
        args.teacher_checkpoint).get("model", "rgb_only")
    tspec, sspec = zoo.get(teacher_model), zoo.get(args.student)
    needed = tuple(dict.fromkeys(sspec.inputs + tspec.inputs))

    modalities = {"rgb": cfg_mod.rgb_modality(),
                  "thermal": cfg_mod.thermal_modality(
                      blur="multimodal" not in teacher_model)}

    # datasets: paired when teacher+student together span both
    # modalities (pseudo-pairing = the multimodal trainer's semantics),
    # single-modality otherwise
    if set(needed) == {"rgb", "thermal"}:
        load = lambda split: load_paired(args.data_dir, split,
                                         args.image_size,
                                         strategy="pseudo", seed=args.seed)
    else:
        (mod,) = needed
        load = lambda split: load_single_modality(
            args.data_dir / mod, split, args.image_size, mod)
    train_ds, val_ds, test_ds = (load(s) for s in ("train", "val", "test"))

    # teacher restore (throwaway Trainer for the flexible restore path)
    tcfg = cfg_mod.TrainConfig(compute_dtype=args.compute_dtype)
    t_trainer = Trainer(teacher_model, tcfg, modalities)
    t_state = t_trainer.restore(args.teacher_checkpoint,
                                image_size=args.image_size)
    teacher_variables = t_trainer.variables(t_state)

    scfg = cfg_mod.TrainConfig(
        batch_size=args.batch_size, num_epochs=args.epochs,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        seed=args.seed, compute_dtype=args.compute_dtype,
        lr_schedule=args.lr_schedule, save_best_after_epoch=1,
        qat=args.qat,
        steps_per_epoch=max(1, -(-len(train_ds) // args.batch_size)))
    dcfg = DistillConfig(alpha=args.alpha, temperature=args.temperature)
    trainer = DistillTrainer(args.student, teacher_model,
                             teacher_variables, dcfg, scfg, modalities,
                             class_weights=class_weights_from_labels(
                                 train_ds.labels))
    t_params = zoo.param_count({"params": teacher_variables["params"]})
    s_shapes = zoo.init_shapes(trainer.module, trainer.spec,
                               image_size=args.image_size)
    print(f"Distilling {teacher_model} ({t_params:,} params) -> "
          f"{args.student} ({zoo.param_count(s_shapes):,} params), "
          f"alpha {args.alpha}, T {args.temperature}")

    ckpt_dir = (args.checkpoint_root
                / f"checkpoints_{args.student}_distilled")
    state, history, best = trainer.fit(train_ds, val_ds,
                                       checkpoint_dir=ckpt_dir,
                                       image_size=args.image_size)
    try:
        state = trainer.restore(ckpt_dir, state=state,
                                image_size=args.image_size)
    except FileNotFoundError:
        print("  (no best checkpoint was saved; evaluating final state)")

    if not args.skip_test_eval:
        m, arrays = trainer.run_eval_epoch(state, test_ds)
        print(f"Student test: acc {m.accuracy:.4f}, F1 {m.f1:.4f}")
        tm, _ = t_trainer.run_eval_epoch(t_state, test_ds)
        print(f"Teacher test: acc {tm.accuracy:.4f}, F1 {tm.f1:.4f}")
        save_pt({
            "test_preds": arrays["y_pred"], "test_labels": arrays["y_true"],
            "test_probs": arrays["y_probs"], "test_acc": m.accuracy,
            "test_f1": m.f1, "test_loss": m.loss,
            "teacher_model": teacher_model,
            "teacher_test_f1": tm.f1,
            "alpha": args.alpha, "temperature": args.temperature},
            ckpt_dir / "test_results.pt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
