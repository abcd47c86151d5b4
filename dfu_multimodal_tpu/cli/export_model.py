"""Freeze a trained checkpoint into a serialized serving bundle.

TPU-native deployment packaging (no reference counterpart — the reference,
e.g. notebooks/extended_metrics.py:699-712, rebuilds torch modules from
source every time a checkpoint is used): the bundle holds one versioned
StableHLO program per serving batch bucket (``jax.export``) plus the
variables, so the serving daemon replays it with NO model source, flax
trace, or XLA lowering at startup (serve/export.py).

    python -m dfu_multimodal_tpu.cli.export_model \
        --checkpoint logs/checkpoints_multimodal --out export/multimodal \
        [--int8 --calib-images <dir>] [--max-batch 64] [--verify]

    # then, on the serving box (same platform + jaxlib):
    python -m dfu_multimodal_tpu.cli.serve --exported export/multimodal

``--verify`` reloads the written bundle and checks row-for-row parity of
probabilities/predictions against the live checkpoint forward.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Export a checkpoint to a jax.export serving bundle")
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--out", type=Path, required=True,
                        help="bundle output directory")
    parser.add_argument("--model", default=None,
                        help="zoo name; default: checkpoint metadata")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--max-batch", type=int, default=64,
                        help="top of the power-of-two bucket ladder")
    parser.add_argument("--buckets", default=None,
                        help="comma-separated explicit bucket list "
                             "(overrides --max-batch ladder)")
    parser.add_argument("--platforms", default=None,
                        help="comma-separated lowering platforms (e.g. "
                             "'tpu' or 'tpu,cpu'); default: the current "
                             "backend")
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--attention-impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--int8", action="store_true",
                        help="freeze the int8 serving path (fused int8 ViT "
                             "blocks + calibrated int8-conv ResNet)")
    parser.add_argument("--calib-images", type=Path, default=None,
                        help="REQUIRED with --int8 for models with an RGB "
                             "trunk (static activation-scale calibration)")
    parser.add_argument("--token-merge", default=None, metavar="L:K",
                        help="freeze the token-merge ViT serving path "
                             "(L full-token blocks, merge to K tokens; "
                             "see serve --token-merge; composes with --int8)")
    parser.add_argument("--tome-prop-attn", action="store_true",
                        help="with --token-merge: freeze the ToMe "
                             "proportional-attention variant (log-size "
                             "key bias; serve --tome-prop-attn)")
    parser.add_argument("--verify", action="store_true",
                        help="reload the bundle and check prob/pred parity "
                             "vs the live checkpoint forward")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np

    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.cli.serve import restore_trainer
    from dfu_multimodal_tpu.config import TrainConfig
    from dfu_multimodal_tpu.serve.export import export_bundle, load_bundle

    cfg = TrainConfig(batch_size=args.max_batch,
                      eval_batch_size=args.max_batch,
                      compute_dtype=args.compute_dtype,
                      mesh=cfg_mod.MeshConfig(data=1, model=1))
    modalities = {"rgb": cfg_mod.rgb_modality(),
                  "thermal": cfg_mod.thermal_modality()}

    name, trainer, state = restore_trainer(args.checkpoint, args.model,
                                           args, cfg, modalities)
    buckets = ([int(b) for b in args.buckets.split(",")]
               if args.buckets else None)
    platforms = args.platforms.split(",") if args.platforms else None

    meta = export_bundle(
        trainer, state, args.out, image_size=args.image_size,
        max_batch=args.max_batch, buckets=buckets, platforms=platforms,
        extra_meta={"int8": bool(args.int8),
                    "token_merge": args.token_merge,
                    "tome_prop_attn": bool(args.tome_prop_attn),
                    "checkpoint": str(args.checkpoint)})
    # carry the checkpoint's val-tuned deployment config (threshold /
    # temperature, extended_metrics --save-deployment) into the bundle —
    # serve --exported auto-loads it from the bundle directory
    from dfu_multimodal_tpu.eval.deployment import (DEPLOYMENT_NAME,
                                                    load_deployment)
    dep = load_deployment(args.checkpoint)
    if dep:
        (args.out / DEPLOYMENT_NAME).write_text(
            (Path(args.checkpoint) / DEPLOYMENT_NAME).read_text())
        print(f"deployment config copied into bundle "
              f"(threshold={dep.get('threshold')}, "
              f"temperature={dep.get('temperature')})")
    # likewise the training-split drift baseline (eval/drift.py), so
    # serve --exported can monitor input drift without the checkpoint dir
    from dfu_multimodal_tpu.eval.drift import BASELINE_FILENAME
    drift_src = Path(args.checkpoint) / BASELINE_FILENAME
    if drift_src.exists():
        (args.out / BASELINE_FILENAME).write_text(drift_src.read_text())
        print("drift baseline copied into bundle")

    total = sum(p.stat().st_size for p in args.out.iterdir())
    print(f"exported {name} -> {args.out}  buckets={meta['buckets']}  "
          f"platforms={meta['platforms']}  ({total / 1e6:.1f} MB)")

    if args.verify:
        servable = load_bundle(args.out)
        b = servable.buckets[0]
        s = args.image_size
        rng = np.random.default_rng(0)
        batch = {m: rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
                 for m in trainer.spec.inputs}
        batch["label"] = np.zeros(b, np.int32)
        batch["valid"] = np.ones(b, np.float32)
        live = trainer.eval_step(trainer.variables(state), batch)
        frozen = servable.eval_step(servable.variables(), batch)
        dp = float(np.max(np.abs(np.asarray(live["probs"], np.float64)
                                 - np.asarray(frozen["probs"], np.float64))))
        same = bool(np.array_equal(np.asarray(live["preds"]),
                                   np.asarray(frozen["preds"])))
        # Predictions must match row-for-row on every path.  Probability
        # tolerance is path-dependent: the bf16/fp32 bundle replays
        # bit-exactly on TPU (measured max delta 0.0 on-chip,
        # scripts_dev/export_tpu_check.py), but the int8 path's
        # requantize/round chain is compiled independently for the live and
        # frozen programs and XLA's differing fusion choices shift ±1-LSB
        # int8 roundings (measured max prob delta 4.6e-3 on-chip, preds
        # identical).
        tol = 1e-2 if args.int8 else 1e-5
        print(f"verify: max |prob delta| {dp:.2e} (tol {tol:.0e}), "
              f"preds equal: {same}")
        if not same or dp > tol:
            raise SystemExit("bundle verification FAILED")
    return meta


if __name__ == "__main__":
    main()
