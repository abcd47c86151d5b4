"""Grad-CAM visualization over all three checkpoints.

TPU-native counterpart of reference notebooks/grad_cam_visualization.py:
for each model pick 5 healthy + 5 ulcer test samples (:688-691), produce the
1x3 (original | heatmap | overlay) figure per sample — 2x3 for multimodal
with an RGB and a thermal row (:599-632) — and save as
``<out>/grad_cam_visualizations/<model>/{healthy,ulcer}_NN.png`` at dpi=150
(:728-732).

    python -m dfu_multimodal_tpu.cli.grad_cam_visualization --data-dir <root>
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu import config as cfg_mod
from dfu_multimodal_tpu.config import TrainConfig
from dfu_multimodal_tpu.data.loader import (ArrayDataset, load_paired,
                                            load_single_modality)
from dfu_multimodal_tpu.data.transforms import eval_normalize
from dfu_multimodal_tpu.eval import gradcam
from dfu_multimodal_tpu.train.engine import Trainer
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

MODELS = (
    ("checkpoints_rgb_only", "rgb_only", "rgb_only", "RGB-Only"),
    ("checkpoints_thermal_only", "thermal_only", "thermal_only",
     "Thermal-Only"),
    ("checkpoints_multimodal", "multimodal", "multimodal", "Multimodal"),
)
# Tap per trunk: stage4 = reference's resnet layer4 hook (:478); the ViT's
# 'blocks' tap is non-4D so it triggers the input-saliency fallback
# (:401-413).  ONE registry shared with the serving/predict explainers
# (serve/explain.py::BRANCH_TAPS) so online and offline explanations of
# the same checkpoint can never diverge; this CLI taps the PRIMARY
# input's branch ("stage4" fallback for unregistered models, the
# reference default).


def _primary_tap(spec) -> str:
    from dfu_multimodal_tpu.serve.explain import BRANCH_TAPS
    taps = BRANCH_TAPS.get(spec.name)
    if taps:
        return taps.get(spec.inputs[0], "stage4")
    return "stage4"


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Grad-CAM visualization")
    cfg_mod.add_common_args(parser)
    parser.add_argument("--output-dir", type=Path, default=None)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--attention-impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--num-per-class", type=int, default=5)
    parser.add_argument("--cam-class", default="0",
                        help="'0' (reference quirk: class-0 logit), '1', "
                             "or 'pred'")
    parser.add_argument("--cam-method", default="saliency",
                        choices=["saliency", "rollout", "chefer"],
                        help="ViT-branch attribution: 'saliency' (default, "
                             "reference-parity input gradients), 'rollout' "
                             "(attention rollout), or 'chefer' (relevance "
                             "propagation) — eval/vit_attribution.py; "
                             "ResNet branches always use true Grad-CAM")
    parser.add_argument("--multimodal-cam", default="fused",
                        choices=["fused", "strict"],
                        help="multimodal branch CAM semantics: 'fused' "
                             "(default, d fused-logit/d branch) or 'strict' "
                             "(reference parity: each trunk CAMed in "
                             "isolation against its own first feature unit, "
                             "grad_cam_visualization.py:575-580)")
    parser.add_argument("--models", nargs="*", default=None)
    parser.add_argument("--model-overrides", nargs="*", default=[],
                        metavar="NAME=ZOO")
    return parser


def _select_samples(labels: np.ndarray, per_class: int) -> List[int]:
    """First ``per_class`` indices of each class in dataset order
    (the reference walks the loader in order, :715-726)."""
    chosen, counts = [], {0: 0, 1: 0}
    for i, lbl in enumerate(labels):
        lbl = int(lbl)
        if counts[lbl] < per_class:
            chosen.append(i)
            counts[lbl] += 1
        if all(c >= per_class for c in counts.values()):
            break
    return chosen


def _method_label(method) -> str:
    """Figure label for an attribution method.  The reference titles
    everything (including its ViT saliency fallback) \"Grad-CAM\"; the
    transformer methods must not inherit that mislabel — these PNGs are
    clinical evidence artifacts and the method shown must be the method
    stated."""
    return {"rollout": "Attention Rollout",
            "chefer": "Chefer Relevance"}.get(method, "Grad-CAM")


def _figure_single(img_u8, cam_out, modality_title: str, model_title: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    overlay, heatmap = gradcam.overlay_cam(img_u8, cam_out["cam"])
    label = _method_label(cam_out.get("method"))
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(img_u8)
    axes[0].set_title(f"Original {modality_title} Image")
    axes[1].imshow(heatmap)
    axes[1].set_title(f"{label} Heatmap")
    pred_txt = "Ulcer" if cam_out["pred"] == 1 else "Healthy"
    axes[2].imshow(overlay)
    axes[2].set_title(f"Overlay\nPred: {pred_txt} "
                      f"({cam_out['confidence']:.3f})")
    for ax in axes:
        ax.axis("off")
    plt.suptitle(f"{model_title} Model {label}", fontsize=14,
                 fontweight="bold")
    plt.tight_layout()
    return fig


def _figure_multimodal(rgb_u8, thermal_u8, rgb_cam, thermal_cam, pred: int,
                       confidence: float, rgb_method=None,
                       thermal_method=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rgb_overlay, rgb_heat = gradcam.overlay_cam(rgb_u8, rgb_cam)
    th_overlay, th_heat = gradcam.overlay_cam(thermal_u8, thermal_cam)
    labels = (_method_label(rgb_method), _method_label(thermal_method))
    fig, axes = plt.subplots(2, 3, figsize=(18, 10))
    for row, (img, heat, over, name) in enumerate(
            [(rgb_u8, rgb_heat, rgb_overlay, "RGB"),
             (thermal_u8, th_heat, th_overlay, "Thermal")]):
        axes[row, 0].imshow(img, cmap="gray" if row else None)
        axes[row, 0].set_title(f"{name} Image")
        axes[row, 1].imshow(heat)
        axes[row, 1].set_title(f"{name} {labels[row]}")
        axes[row, 2].imshow(over)
        axes[row, 2].set_title(f"{name} Overlay")
    for ax in axes.ravel():
        ax.axis("off")
    pred_txt = "Ulcer" if pred == 1 else "Healthy"
    head = ("Grad-CAM" if labels[0] == labels[1] == "Grad-CAM"
            else f"{labels[0]} (RGB) / {labels[1]} (Thermal)")
    plt.suptitle(f"Multimodal Fusion {head}\nPrediction: {pred_txt} "
                 f"(Confidence: {confidence:.3f})",
                 fontsize=14, fontweight="bold")
    plt.tight_layout()
    return fig


def _vit_branch_cam(trainer, variables, inputs, cam_class,
                    input_index: int, method: str):
    """ViT-branch attribution via eval/vit_attribution.py (rollout /
    chefer) for the models whose thermal trunk is a ViT."""
    from dfu_multimodal_tpu.eval import vit_attribution as va

    scope = va.VIT_TRUNK_SCOPES[trainer.spec.name]
    return va.compute_vit_cam_batch(
        trainer.module, variables, inputs, scope, method,
        class_index=cam_class, input_index=input_index)


def visualize_model(trainer: Trainer, state, dataset: ArrayDataset,
                    out_dir: Path, display: str, cam_class,
                    per_class: int, mm_cam: str = "fused",
                    cam_method: str = "saliency") -> int:
    import matplotlib.pyplot as plt

    variables = trainer.variables(state)
    module, spec = trainer.module, trainer.spec
    tap_name = _primary_tap(spec)
    out_dir.mkdir(parents=True, exist_ok=True)
    counts = {0: 0, 1: 0}
    saved = 0

    # All selected samples CAM in ONE jitted forward+backward per tap
    # (the reference loops single-image double-forwards, :715-741).
    selected = _select_samples(dataset.labels, per_class)
    if not selected:
        return 0
    sel = np.asarray(selected)
    raw_batches = {m: dataset.arrays[m][sel] for m in spec.inputs}
    inputs = tuple(eval_normalize(jnp.asarray(raw_batches[m]),
                                  trainer.modalities[m], jnp.float32)
                   for m in spec.inputs)

    if spec.name == "multimodal" and mm_cam == "strict":
        # Reference parity: CAM each trunk in isolation, score = the
        # trunk's own first feature unit (the reference's GradCAM wraps
        # model.resnet / model.vit and backprops output[0, 0] regardless
        # of class_idx, grad_cam_visualization.py:385-387, :575-580).
        # Prediction/confidence still come from the fused model (:567-572).
        import jax
        from dfu_multimodal_tpu.models.resnet import ResNet50
        from dfu_multimodal_tpu.models.vit import ViTBase16
        rgb_outs = gradcam.compute_cam_batch(
            ResNet50(dtype=jnp.float32),
            gradcam.branch_variables(variables, "rgb_branch"),
            (inputs[0],), "stage4", class_index=0)
        th_outs = gradcam.compute_cam_batch(
            ViTBase16(jnp.float32, module.attention_impl, module.block_impl),
            gradcam.branch_variables(variables, "thermal_branch"),
            (inputs[1],), "blocks", class_index=0)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(
            module.apply(variables, *inputs, train=False),
            jnp.float32), axis=-1))
        for k in range(probs.shape[0]):
            pred = int(probs[k].argmax())
            for outs in (rgb_outs, th_outs):
                outs[k]["pred"] = pred
                outs[k]["confidence"] = float(probs[k][pred])
    elif spec.name == "multimodal":
        rgb_outs = gradcam.compute_cam_batch(module, variables, inputs,
                                             "stage4", cam_class,
                                             input_index=0)
        if cam_method != "saliency":
            th_outs = _vit_branch_cam(trainer, variables, inputs,
                                      cam_class, 1, cam_method)
        else:
            th_outs = gradcam.compute_cam_batch(module, variables, inputs,
                                                "blocks", cam_class,
                                                input_index=1)
    elif cam_method != "saliency" and spec.name == "thermal_only":
        cam_outs = _vit_branch_cam(trainer, variables, inputs, cam_class,
                                   0, cam_method)
    else:
        cam_outs = gradcam.compute_cam_batch(module, variables, inputs,
                                             tap_name, cam_class,
                                             input_index=0)

    for k, idx in enumerate(selected):
        label = int(dataset.labels[idx])
        if spec.name == "multimodal":
            fig = _figure_multimodal(
                raw_batches["rgb"][k], raw_batches["thermal"][k],
                rgb_outs[k]["cam"], th_outs[k]["cam"],
                rgb_outs[k]["pred"], rgb_outs[k]["confidence"],
                rgb_method=rgb_outs[k].get("method"),
                thermal_method=th_outs[k].get("method"))
        else:
            fig = _figure_single(raw_batches[spec.inputs[0]][k],
                                 cam_outs[k], spec.inputs[0].upper(),
                                 display)
        cls_name = "healthy" if label == 0 else "ulcer"
        path = out_dir / f"{cls_name}_{counts[label]:02d}.png"
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        counts[label] += 1
        saved += 1
        print(f"  Saved {path.name}")
    return saved


def main(argv=None) -> Dict[str, int]:
    args = build_parser().parse_args(argv)
    data_cfg = cfg_mod.data_config_from_args(args)
    out_root = args.output_dir or (Path(data_cfg.checkpoint_root)
                                   / "grad_cam_visualizations")
    overrides = dict(kv.split("=", 1) for kv in args.model_overrides)
    selected = set(args.models) if args.models else None
    cam_class = args.cam_class if args.cam_class == "pred" else int(
        args.cam_class)
    if args.multimodal_cam == "strict" and args.cam_method != "saliency":
        raise SystemExit(
            "--multimodal-cam strict reproduces the reference's "
            "isolated-trunk saliency semantics and cannot combine with "
            f"--cam-method {args.cam_method}")
    size = args.image_size

    print("=" * 70)
    print("GRAD-CAM VISUALIZATION")
    print("=" * 70)
    print(f"Will visualize {args.num_per_class} healthy + "
          f"{args.num_per_class} ulcer samples per model\n")

    # lazy per-model loading: with --models a subset, the other splits
    # are never decoded (and need not exist on disk)
    loaders = {
        "rgb_only": lambda: load_single_modality(
            data_cfg.data_dir / "rgb", "test", size, "rgb"),
        "thermal_only": lambda: load_single_modality(
            data_cfg.data_dir / "thermal", "test", size, "thermal"),
        "multimodal": lambda: load_paired(data_cfg.data_dir, "test", size,
                                          strategy="pseudo",
                                          seed=args.seed),
    }

    results: Dict[str, int] = {}
    for ckpt_name, subdir, zoo_default, display in MODELS:
        if selected is not None and subdir not in selected:
            continue
        ckpt_dir = Path(data_cfg.checkpoint_root) / ckpt_name
        print(f"\nVISUALIZING {display.upper()} MODEL")
        if not ckpt_mod.best_checkpoint_exists(ckpt_dir):
            print(f"  Checkpoint not found: {ckpt_dir}")
            continue
        zoo_name = overrides.get(
            subdir, ckpt_mod.load_meta(ckpt_dir).get("model") or zoo_default)
        if args.cam_method != "saliency":
            from dfu_multimodal_tpu.eval.vit_attribution import (
                DOWNGRADE_NOTE, supports_transformer_attribution)
            if not supports_transformer_attribution(zoo_name):
                print(f"  --cam-method {args.cam_method} {DOWNGRADE_NOTE}")
        cfg = TrainConfig(batch_size=1, compute_dtype="float32",
                          mesh=cfg_mod.MeshConfig(data=1))
        trainer = Trainer(zoo_name, cfg,
                          {"rgb": cfg_mod.rgb_modality(),
                           "thermal": cfg_mod.thermal_modality()},
                          attention_impl=args.attention_impl)
        print(f"Loading: {ckpt_dir}")
        state = trainer.restore(ckpt_dir, image_size=size)
        n = visualize_model(trainer, state, loaders[subdir](),
                            out_root / subdir, display, cam_class,
                            args.num_per_class, mm_cam=args.multimodal_cam,
                            cam_method=args.cam_method)
        print(f"Saved {n} {display} visualizations to {out_root / subdir}")
        results[subdir] = n
    return results


if __name__ == "__main__":
    main()
