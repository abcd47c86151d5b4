"""Batch inference: classify a directory of images with a checkpoint.

No reference counterpart (the reference can only evaluate labeled split
dirs); this is the serving-style entry point: point it at ANY directory (or
paired rgb/thermal directories), get per-image probabilities + a CSV.

    python -m dfu_multimodal_tpu.cli.predict --checkpoint logs/checkpoints_rgb_only \
        --images <dir> [--thermal-images <dir>] [--output preds.csv] \
        [--explain-dir <dir>]   # Grad-CAM evidence overlay per image
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path


import numpy as np

from dfu_multimodal_tpu import config as cfg_mod
from dfu_multimodal_tpu.config import TrainConfig
from dfu_multimodal_tpu.data.layout import list_images
from dfu_multimodal_tpu.data.loader import ArrayDataset, decode_all
from dfu_multimodal_tpu.train.engine import Trainer
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Batch inference")
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--model", default=None,
                        help="zoo name; default: checkpoint metadata")
    parser.add_argument("--images", type=Path, required=True,
                        help="directory of images (RGB modality for "
                             "multimodal models)")
    parser.add_argument("--thermal-images", type=Path, default=None,
                        help="paired thermal directory (multimodal models; "
                             "paired by sorted filename order)")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--output", type=Path, default=None,
                        help="write CSV of path,prob_ulcer,prediction")
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--attention-impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--int8", action="store_true",
                        help="int8 serving: ViT branch via fused int8 "
                             "kernels, ResNet branch via calibrated int8 "
                             "XLA convs (weights quantized at load, "
                             "activation scales calibrated on the inputs; "
                             "~2x MXU rate on TPU, <1%% typical accuracy "
                             "cost)")
    parser.add_argument("--calib-images", type=Path, default=None,
                        help="directory of images to calibrate the int8 "
                             "ResNet activation scales on (first 32, sorted "
                             "order). Default: the first <=32 inference "
                             "inputs themselves — note that then a given "
                             "image's probabilities depend on which other "
                             "files are in --images; pin this for "
                             "reproducible deployments")
    parser.add_argument("--token-merge", default=None, metavar="L:K",
                        help="ViT-trunk token merging (thermal_only/"
                             "multimodal): run L encoder blocks on the "
                             "full 197 tokens, bipartite-merge to K "
                             "tokens, run the remaining blocks reduced "
                             "(e.g. 4:128 — ~1.3x ViT throughput; "
                             "validate the accuracy cost on real data "
                             "before deploying; composes with --int8: "
                             "5300 img/s/chip combined)")
    parser.add_argument("--tome-prop-attn", action="store_true",
                        help="with --token-merge: ToMe proportional "
                             "attention (full Bolya et al. recipe) — "
                             "post-merge blocks bias each key's scores "
                             "by log(token size)")
    parser.add_argument("--threshold", type=float, default=None,
                        help="classify ulcer when P(ulcer) >= this value "
                             "instead of argmax (0.5). Tune it on a "
                             "validation split with extended_metrics "
                             "--operating-point (e.g. sens@0.95 for "
                             "screening deployments)")
    parser.add_argument("--temperature", type=float, default=None,
                        help="temperature-scale the reported probabilities "
                             "(sigmoid(logit(p)/T)); fit T on a validation "
                             "split with extended_metrics "
                             "--temperature-from-val. Rankings and argmax "
                             "predictions are unchanged")
    parser.add_argument("--tta", type=int, default=0, metavar="N",
                        help="test-time augmentation: average P(ulcer) "
                             "over N augmented views per image (majority-"
                             "vote predictions; one vmapped device "
                             "program). 0 = off")
    parser.add_argument("--seed", type=int, default=0,
                        help="PRNG seed for the --tta augmentations")
    parser.add_argument("--explain-dir", type=Path, default=None,
                        help="write a Grad-CAM evidence overlay PNG per "
                             "image (per provided modality) into this "
                             "directory — the offline counterpart of the "
                             "serving daemon's /v1/explain. Overlays "
                             "always differentiate the full-fidelity "
                             "checkpoint, even with --int8/--token-merge")
    parser.add_argument("--explain-class", default="pred",
                        choices=["pred", "0", "1"],
                        help="class logit the CAM explains: the model's "
                             "predicted class per image (default) or a "
                             "fixed class ('0' matches the offline "
                             "grad_cam CLI's reference-parity quirk)")
    parser.add_argument("--cam-method", default="saliency",
                        choices=["saliency", "rollout", "chefer"],
                        help="ViT-branch attribution for --explain-dir: "
                             "'saliency' (default, reference-parity input "
                             "gradients), 'rollout' (attention rollout) or "
                             "'chefer' (relevance propagation; eval/"
                             "vit_attribution.py). ResNet branches always "
                             "use true Grad-CAM")
    parser.add_argument("--drift-check", action="store_true",
                        help="score the inputs' intensity distribution "
                             "against the checkpoint's training-split "
                             "drift_baseline.json (PSI per channel; "
                             "stable < 0.1, major drift >= 0.25) and "
                             "print the report")
    parser.add_argument("--ignore-deployment", action="store_true",
                        help="do not auto-load <checkpoint>/"
                             "deployment.json (the val-tuned threshold/"
                             "temperature persisted by extended_metrics "
                             "--save-deployment); explicit flags always "
                             "override per-field")
    return parser


def _write_explanations(trainer, state, arrays, paths, provided,
                        out_dir: Path, explain_class: str,
                        batch_size: int,
                        cam_method: str = "saliency") -> int:
    """Grad-CAM overlay PNG per (image, provided modality) — the batch
    counterpart of the serving daemon's /v1/explain (serve/explain.py):
    tapped trunks true Grad-CAM, untapped/ViT models input saliency (or,
    with ``cam_method`` rollout/chefer, transformer attribution on the
    ViT branch), one jitted forward+backward per batch per branch."""
    import jax.numpy as jnp

    from dfu_multimodal_tpu.data.transforms import eval_normalize
    from dfu_multimodal_tpu.eval import gradcam
    from dfu_multimodal_tpu.eval.vit_attribution import (
        DOWNGRADE_NOTE, VIT_TRUNK_SCOPES, compute_vit_cam_batch,
        supports_transformer_attribution)
    from dfu_multimodal_tpu.serve.explain import (BRANCH_TAPS,
                                                  saliency_grads_fn,
                                                  render_overlay)

    out_dir.mkdir(parents=True, exist_ok=True)
    ci = "pred" if explain_class == "pred" else int(explain_class)
    module = trainer.module
    variables = trainer.variables(state)
    taps = BRANCH_TAPS.get(trainer.spec.name)
    vit_scope = VIT_TRUNK_SCOPES.get(trainer.spec.name)
    if (cam_method != "saliency"
            and not supports_transformer_attribution(trainer.spec.name)):
        print(f"--cam-method {cam_method}: model {trainer.spec.name!r} "
              f"{DOWNGRADE_NOTE}")
        cam_method = "saliency"
    saliency = None if taps is not None else saliency_grads_fn(module, ci)
    written = 0
    n = len(paths)
    for start in range(0, n, batch_size):
        sl = slice(start, min(start + batch_size, n))
        inputs = tuple(eval_normalize(jnp.asarray(arrays[m][sl]),
                                      trainer.modalities[m], jnp.float32)
                       for m in trainer.spec.inputs)
        cams = {}
        if taps is None:
            _, sal = saliency(variables, inputs)
            for i, m in enumerate(trainer.spec.inputs):
                if m in provided:
                    batch_cam = np.asarray(sal[i], np.float32)
                    peak = batch_cam.max(axis=(1, 2), keepdims=True)
                    cams[m] = batch_cam / np.maximum(peak, 1e-12)
        else:
            for m in provided:
                if cam_method != "saliency" and taps[m] == "blocks":
                    outs = compute_vit_cam_batch(
                        module, variables, inputs, vit_scope, cam_method,
                        class_index=ci,
                        input_index=trainer.spec.inputs.index(m))
                else:
                    outs = gradcam.compute_cam_batch(
                        module, variables, inputs, taps[m], class_index=ci,
                        input_index=trainer.spec.inputs.index(m))
                cams[m] = np.stack([o["cam"] for o in outs])
        for k, pi in enumerate(range(sl.start, sl.stop)):
            stem = Path(paths[pi]).stem
            for m, batch_cam in cams.items():
                png = render_overlay(arrays[m][pi], batch_cam[k])
                (out_dir / f"{pi:05d}_{stem}_{m}.png").write_bytes(png)
                written += 1
    return written


def main(argv=None):
    args = build_parser().parse_args(argv)
    model_name = args.model or ckpt_mod.load_meta(args.checkpoint).get(
        "model", "rgb_only")

    cfg = TrainConfig(batch_size=args.batch_size,
                      eval_batch_size=args.batch_size,
                      compute_dtype=args.compute_dtype,
                      mesh=cfg_mod.MeshConfig(data=-1))
    modalities = {"rgb": cfg_mod.rgb_modality(),
                  "thermal": cfg_mod.thermal_modality()}
    trainer = Trainer(model_name, cfg, modalities,
                      attention_impl=args.attention_impl)
    state = trainer.restore(args.checkpoint, image_size=args.image_size)

    paths = list_images(args.images)
    if not paths:
        print(f"No images found under {args.images}")
        return {}
    arrays = {}
    primary = trainer.spec.inputs[0]
    arrays[primary] = decode_all(paths, args.image_size)
    if len(trainer.spec.inputs) > 1:
        th_paths = list_images(args.thermal_images) if args.thermal_images \
            else paths
        n = min(len(paths), len(th_paths))
        paths = paths[:n]
        arrays = {trainer.spec.inputs[0]: arrays[primary][:n],
                  "thermal": decode_all(th_paths[:n], args.image_size)}

    if args.drift_check:
        import json as json_mod

        from dfu_multimodal_tpu.eval import drift as drift_mod
        baseline = drift_mod.load_baseline(
            args.checkpoint / drift_mod.BASELINE_FILENAME)
        if baseline is None:
            print(f"drift check: no {drift_mod.BASELINE_FILENAME} in "
                  f"{args.checkpoint} (written by training runs of this "
                  "framework) — skipping")
        else:
            mon = drift_mod.DriftMonitor(baseline, min_images=1)
            # score only modalities the user actually supplied: with a
            # multimodal checkpoint and no --thermal-images the thermal
            # array is a duplicate of the RGB photos (inference fill-in,
            # predict.py above) — RGB pixels against the thermal baseline
            # would report guaranteed spurious major_drift
            provided = {primary} | ({"thermal"} if args.thermal_images
                                    is not None else set())
            for m, arr in arrays.items():
                if m in provided:
                    mon.update(m, arr)
            rep = mon.report()
            print("DRIFT CHECK vs training-split baseline "
                  f"(verdict: {rep['verdict']}):")
            print(json_mod.dumps(rep["modalities"], indent=2))

    # the --explain-dir overlays differentiate the full-fidelity restore,
    # never the int8/token-merge rebuilds below (serve/explain.py design)
    base_trainer, base_state = trainer, state

    if args.int8:
        # Quantize the restored fp32 trunks once, then rebuild the engine
        # around the int8 serving paths (serve/engine.py): fused int8
        # Pallas blocks for the ViT, calibrated static-scale int8 XLA
        # convs for the ResNet.
        from dfu_multimodal_tpu.serve.engine import (RESNET_TRUNK_MODELS,
                                                     quantize_for_serving)

        calib_u8 = None
        if model_name in RESNET_TRUNK_MODELS:
            if args.calib_images is not None:
                calib_paths = list_images(args.calib_images)[:32]
                if not calib_paths:
                    raise SystemExit(
                        f"No calibration images under {args.calib_images}")
                calib_u8 = decode_all(calib_paths, args.image_size)
            else:       # default: the first <=32 inference inputs
                calib_u8 = arrays[primary][:min(32, len(paths))]
        trainer, state = quantize_for_serving(
            trainer, state, image_size=args.image_size, calib_u8=calib_u8,
            attention_impl=args.attention_impl)

    if args.token_merge:
        # composes with --int8: tome_for_serving preserves the quantized
        # block impls (measured 5300 img/s/chip combined, docs/DESIGN.md)
        from dfu_multimodal_tpu.models.zoo import VIT_TRUNK_MODELS
        if model_name not in VIT_TRUNK_MODELS:
            # same graceful skip as the serve CLI: a non-ViT checkpoint
            # must not die in a raw ValueError deep in the rebuild
            print(f"--token-merge skipped ({model_name} has no ViT trunk)")
        else:
            from dfu_multimodal_tpu.serve.engine import (parse_token_merge,
                                                         tome_for_serving)
            merge_at, keep = parse_token_merge(args.token_merge)
            trainer, state = tome_for_serving(
                trainer, state, merge_at, keep, image_size=args.image_size,
                attention_impl=args.attention_impl,
                prop_attn=args.tome_prop_attn)
            print(f"Token merging: {merge_at} full-token blocks, "
                  f"then {keep} tokens"
                  + (" (proportional attention)"
                     if args.tome_prop_attn else ""))

    n = len(paths)
    ds = ArrayDataset(arrays=arrays, labels=np.zeros(n, np.int32))
    if args.tta > 0:
        # Robust inference: average softmax P(ulcer) over N augmented
        # views per image (one vmapped device program, eval/tta.py);
        # predictions are the per-view majority vote unless a threshold
        # (below) overrides them.
        from dfu_multimodal_tpu.eval.tta import tta_predictions
        preds, probs = tta_predictions(trainer, state, ds,
                                       num_tta=args.tta, seed=args.seed)
        print(f"TTA: averaging {args.tta} augmented views per image")
    else:
        _, out = trainer.run_eval_epoch(state, ds)
        preds = out["y_pred"]
        probs = out["y_probs"]
    from dfu_multimodal_tpu.eval.deployment import resolve_deployment
    threshold, temperature, note = resolve_deployment(
        args.checkpoint, args.threshold, args.temperature,
        args.ignore_deployment)
    if note:
        print(f"Loaded {note}")
    if temperature is not None:
        from dfu_multimodal_tpu.eval.calibration import apply_temperature
        probs = apply_temperature(probs, temperature)
        print(f"Calibration: temperature T={temperature}")
    if threshold is not None:
        from dfu_multimodal_tpu.eval.threshold import apply_threshold
        preds = apply_threshold(probs, threshold)
        print(f"Operating point: P(ulcer) >= {threshold}")
    results = {str(p): (float(prob), int(pred))
               for p, prob, pred in zip(paths, probs, preds)}
    print(f"{'image':50s}  P(ulcer)  prediction")
    for p, (prob, pred) in results.items():
        name = Path(p).name
        print(f"{name:50s}  {prob:8.4f}  "
              f"{'ulcer' if pred == 1 else 'healthy'}")

    if args.explain_dir is not None:
        provided = [primary] + (
            ["thermal"] if (len(trainer.spec.inputs) > 1
                            and args.thermal_images is not None) else [])
        written = _write_explanations(
            base_trainer, base_state, arrays, paths, provided,
            args.explain_dir, args.explain_class, args.batch_size,
            cam_method=args.cam_method)
        print(f"\nWrote {written} evidence overlays to {args.explain_dir}")

    if args.output:
        with open(args.output, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["path", "prob_ulcer", "prediction"])
            for p, (prob, pred) in results.items():
                writer.writerow([p, f"{prob:.6f}",
                                 "ulcer" if pred == 1 else "healthy"])
        print(f"\nWrote {args.output}")
    return results


if __name__ == "__main__":
    main()
