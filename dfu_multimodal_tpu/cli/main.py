"""Umbrella ``dfu`` command: one entry point for every CLI.

The reference project is driven as a collection of loose scripts
(``python notebooks/train_rgb_only.py`` — reference README.md:125-156);
here every tool is also reachable through a single command::

    dfu train-rgb-only --data-dir data
    dfu extended-metrics
    dfu serve --checkpoint-root logs

``dfu <sub> ...`` is exactly equivalent to the ``dfu-<sub>`` console
script / ``python -m dfu_multimodal_tpu.cli.<module>``; this module only
dispatches, so each subcommand keeps its own argparse surface and
``--help``.
"""

from __future__ import annotations

import importlib
import sys
from typing import List, Optional

# subcommand -> (module under dfu_multimodal_tpu.cli, one-line help)
COMMANDS = {
    "train-rgb-only": ("train_rgb_only", "train the ResNet50 RGB classifier"),
    "train-thermal-only": ("train_thermal_only",
                           "train the ViT-B/16 thermal classifier"),
    "train-multimodal-fusion": ("train_multimodal_fusion",
                                "train the late-fusion multimodal model"),
    "train-legacy": ("train_legacy",
                     "EfficientNet/gated-fusion legacy variants"),
    "pretrain": ("pretrain",
                 "self-supervised trunk pretraining (SimCLR / MAE)"),
    "self-train": ("self_train",
                   "semi-supervised pseudo-labeling over an unlabeled "
                   "pool"),
    "distill": ("distill",
                "compress a trained teacher into a smaller student"),
    "soup": ("soup",
             "average same-architecture checkpoints into one model"),
    "robustness": ("robustness",
                   "F1 under parametric corruptions x severity levels"),
    "compare": ("compare",
                "paired statistical comparison of two checkpoints "
                "(McNemar + bootstrap deltas)"),
    "cross-validate": ("cross_validate",
                       "k-fold CV with patient-level grouping"),
    "sweep": ("sweep", "hyperparameter grid / random search"),
    "extended-metrics": ("extended_metrics",
                         "medical metrics suite + ROC/PR/confusion plots"),
    "grad-cam": ("grad_cam_visualization", "Grad-CAM visualizations"),
    "tta": ("test_time_augmentation", "test-time-augmentation robustness"),
    "ablation": ("ablation_study", "RGB vs thermal vs multimodal ablation"),
    "predict": ("predict", "batch inference on an image directory"),
    "embed": ("embed", "trunk embeddings: retrieval + uncertainty triage"),
    "model-card": ("model_card",
                   "audit-ready markdown card from checkpoint artifacts"),
    "serve": ("serve", "online micro-batching HTTP daemon"),
    "export-model": ("export_model", "freeze a checkpoint to jax.export"),
    "organize-dataset": ("organize_clean_dataset",
                         "dedup + split raw datasets (canonical L0)"),
    "dataset-tools": ("dataset_tools",
                      "verify/analyze/standardize/patient-split/prepare"),
    "download-datasets": ("download_datasets", "fetch the Kaggle datasets"),
    "convert-checkpoint": ("convert_checkpoint",
                           "torch checkpoint -> native format"),
    "fix-checkpoint-keys": ("fix_checkpoint_keys",
                            "rewrite backbone.* keys in torch checkpoints"),
    "check-tpu": ("check_tpu", "device/mesh/compile smoke check"),
}


def _usage() -> str:
    width = max(len(name) for name in COMMANDS)
    lines = [f"  {name:<{width}}  {help_}"
             for name, help_ in sorted(
                 (n, h) for n, (_, h) in COMMANDS.items())]
    return ("usage: dfu <command> [args...]\n\n"
            "TPU-native DFU multimodal classification framework.\n"
            "Commands (each supports --help):\n" + "\n".join(lines) + "\n")


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage(), end="")
        return 0
    name = argv[0]
    if name not in COMMANDS:
        print(f"dfu: unknown command {name!r}\n\n{_usage()}",
              end="", file=sys.stderr)
        return 2
    module = importlib.import_module(
        f"dfu_multimodal_tpu.cli.{COMMANDS[name][0]}")
    # present the subcommand as the program name so --help prints sensibly
    sys.argv[0] = f"dfu {name}"
    result = module.main(argv[1:])
    # several mains return result dicts for programmatic use, not rcs
    return result if isinstance(result, int) else 0


if __name__ == "__main__":
    sys.exit(main())
