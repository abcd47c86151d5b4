"""Multimodal late-fusion training entry point (ResNet50 + ViT-B/16).

TPU-native counterpart of reference notebooks/train_multimodal_fusion.py:
pseudo-paired loader with modulo cycling (:109-137), batch 6, dual-modality
leakage gate, 2816->512->256->2 fusion head, parameter-count report
(:333-336).  The thermal augmentation pipeline here has the affine but no
blur/jitter, matching :191-199.

    python -m dfu_multimodal_tpu.cli.train_multimodal_fusion --data-dir <root>
"""

from __future__ import annotations



from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.cli._train_common import TrainRecipe, run_training
from dfu_multimodal_tpu.data.loader import load_paired
from dfu_multimodal_tpu.models import zoo


def _load(data_cfg, args):
    return {split: load_paired(
        data_cfg.data_dir, split, data_cfg.image_size, strategy="pseudo",
        seed=args.seed)
        for split in ("train", "val", "test")}


RECIPE = TrainRecipe(
    name="multimodal",
    model="multimodal",
    title="Training Multimodal Fusion model (ResNet50 + ViT)",
    modalities={"rgb": config.rgb_modality(),
                "thermal": config.thermal_modality(blur=False)},
    defaults=config.TrainConfig(batch_size=6),
    load_datasets=_load,
)


def main(argv=None):
    # parameter-count report, like the reference (:333-336)
    module, spec = zoo.build(RECIPE.model)
    shapes = zoo.init_shapes(module, spec)
    print(f"Total parameters: {zoo.param_count(shapes):,}")
    return run_training(RECIPE, argv)


if __name__ == "__main__":
    main()
