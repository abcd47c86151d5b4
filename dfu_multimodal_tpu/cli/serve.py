"""Online serving daemon: dynamic-batching HTTP inference on checkpoints.

No reference counterpart (the reference ends at offline evaluation of
labeled split directories); this is the production deployment entry point:

    # one model
    python -m dfu_multimodal_tpu.cli.serve \
        --checkpoint logs/checkpoints_multimodal --port 8000 \
        [--int8 --calib-images <dir>] [--max-batch 64] [--max-wait-ms 2]

    # the full clinical router: every checkpoints_* under logs/ is served,
    # and each request routes to the model matching its modalities
    # (rgb photo alone -> rgb_only, rgb+thermal -> multimodal, ...)
    python -m dfu_multimodal_tpu.cli.serve --checkpoint-root logs

Then:

    curl -X POST --data-binary @foot.jpg -H 'Content-Type: image/jpeg' \
        http://localhost:8000/v1/predict
    curl http://localhost:8000/metrics

Single-image p50 on the fused bf16 path is ~0.6 ms of device compute
(docs/DESIGN.md latency row); the batcher coalesces concurrent requests
into power-of-two buckets so throughput under load approaches the b128
serving numbers (~3375 img/s bf16 / ~4100 int8 / 4266 bf16+token-merge /
5300 int8+token-merge per chip, docs/DESIGN.md).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Serving daemon")
    parser.add_argument("--checkpoint", type=Path, action="append",
                        default=None,
                        help="checkpoint dir; repeat to serve several "
                             "models behind one modality router")
    parser.add_argument("--checkpoint-root", type=Path, default=None,
                        help="serve every checkpoints_* directory under "
                             "this root (the trainers' layout)")
    parser.add_argument("--exported", type=Path, action="append",
                        default=None,
                        help="serve a jax.export bundle directory "
                             "(cli.export_model output) — no model source "
                             "or trace/compile at startup; repeatable")
    parser.add_argument("--model", default=None,
                        help="zoo name for a SINGLE --checkpoint; "
                             "default: checkpoint metadata")
    parser.add_argument("--threshold", type=float, default=None,
                        help="clinical operating point: respond "
                             "prediction=1 (ulcer) when prob_ulcer >= "
                             "this value instead of argmax; tune on a "
                             "validation split with extended_metrics "
                             "--operating-point")
    parser.add_argument("--temperature", type=float, default=None,
                        help="temperature-scale responded probabilities "
                             "(sigmoid(logit(p)/T)); fit T on a "
                             "validation split with extended_metrics "
                             "--temperature-from-val. An explicit "
                             "--threshold applies to the scaled probs")
    parser.add_argument("--max-queue", type=int, default=None,
                        help="bound the request queue; submissions beyond "
                             "this many waiting requests get HTTP 503 + "
                             "Retry-After (backpressure) instead of "
                             "queueing without limit")
    parser.add_argument("--ignore-deployment", action="store_true",
                        help="do not auto-load each model's "
                             "deployment.json (val-tuned threshold/"
                             "temperature persisted by extended_metrics "
                             "--save-deployment)")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--max-batch", type=int, default=64,
                        help="largest coalesced batch (top bucket)")
    parser.add_argument("--max-wait-ms", type=float, default=2.0,
                        help="batching window after the first queued "
                             "request")
    parser.add_argument("--pipeline-depth", type=int, default=1,
                        help="2 overlaps next-batch transfer+dispatch with "
                             "the previous batch's result fetch (helps on "
                             "direct-attached hosts; measured SLOWER over "
                             "a tunneled link, serve/engine.py)")
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--attention-impl", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--int8", action="store_true",
                        help="serve the int8 paths (fused int8 ViT blocks "
                             "+ calibrated int8-conv ResNet; measured 0%% "
                             "prediction flips, RESULTS_REHEARSAL.md)")
    parser.add_argument("--calib-images", type=Path, default=None,
                        help="REQUIRED with --int8 for models with an RGB "
                             "trunk: directory of images (first 32, sorted) "
                             "fixing the static int8 activation scales")
    parser.add_argument("--token-merge", default=None, metavar="L:K",
                        help="ViT-trunk token merging for thermal_only/"
                             "multimodal models: L full-token encoder "
                             "blocks, bipartite-merge to K tokens, rest "
                             "reduced (~1.3x ViT throughput; validate "
                             "accuracy on real data first). Non-ViT "
                             "models in a --checkpoint-root router are "
                             "served unmodified; composes with --int8")
    parser.add_argument("--tome-prop-attn", action="store_true",
                        help="with --token-merge: ToMe proportional "
                             "attention (full Bolya et al. recipe) — "
                             "post-merge blocks bias each key's scores "
                             "by log(token size)")
    parser.add_argument("--shadow", type=Path, action="append",
                        default=None,
                        help="shadow-deploy a candidate checkpoint: it "
                             "scores every request its matching primary "
                             "answers (matched by input modalities, like "
                             "request routing) but never responds; "
                             "/metrics reports live decision agreement, "
                             "flips and probability deltas "
                             "(serve/shadow.py). Repeatable, one shadow "
                             "per primary. The shadow applies its OWN "
                             "deployment.json (as-deployed comparison); "
                             "served fp32/bf16 full-fidelity")
    parser.add_argument("--explain", action="store_true",
                        help="enable POST /v1/explain: per-request "
                             "Grad-CAM evidence heatmaps (serve/"
                             "explain.py). Explanations always "
                             "differentiate the full-fidelity restored "
                             "checkpoint, even when predictions serve "
                             "int8/token-merge rebuilds. Checkpoint "
                             "models only (exported bundles carry no "
                             "model source)")
    parser.add_argument("--explain-class", default="pred",
                        choices=["pred", "0", "1"],
                        help="which class logit the CAM explains: the "
                             "served decision ('pred', default) or a "
                             "fixed class ('0' matches the offline "
                             "CLI's reference-parity quirk)")
    parser.add_argument("--cam-method", default="saliency",
                        choices=["saliency", "rollout", "chefer"],
                        help="ViT-branch attribution for /v1/explain: "
                             "'saliency' (default, reference-parity "
                             "input gradients), 'rollout' (attention "
                             "rollout) or 'chefer' (relevance "
                             "propagation; eval/vit_attribution.py). "
                             "ResNet branches always use true Grad-CAM")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip pre-compiling the batch buckets "
                             "(first requests then pay XLA compiles)")
    parser.add_argument("--no-drift-monitor", action="store_true",
                        help="do not score live inputs against each "
                             "model's drift_baseline.json (training-split "
                             "intensity statistics written by the "
                             "trainers; PSI report on /metrics and "
                             "/healthz)")
    return parser


def restore_trainer(ckpt: Path, model_name, args, cfg, modalities,
                    keep_base: bool = False):
    """Restore (name, trainer, state) from a checkpoint dir, applying the
    int8 serving quantization when ``args.int8`` — shared by the serving
    daemon and the export CLI (cli/export_model.py).

    ``keep_base=True`` returns ``(name, trainer, state, (base_trainer,
    base_state))`` where the base pair is the PRE-int8/token-merge
    restore — the full-fidelity model the serving-time explainer
    differentiates (serve/explain.py)."""
    from dfu_multimodal_tpu.serve.engine import quantize_for_serving
    from dfu_multimodal_tpu.train.engine import Trainer
    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

    model_name = model_name or ckpt_mod.load_meta(ckpt).get(
        "model", "rgb_only")
    trainer = Trainer(model_name, cfg, modalities,
                      attention_impl=args.attention_impl)
    state = trainer.restore(ckpt, image_size=args.image_size)
    base = (trainer, state)

    if args.int8:
        from dfu_multimodal_tpu.serve.engine import RESNET_TRUNK_MODELS
        calib_u8 = None
        if model_name in RESNET_TRUNK_MODELS:
            from dfu_multimodal_tpu.data.layout import list_images
            from dfu_multimodal_tpu.data.loader import decode_all

            if args.calib_images is None:
                raise SystemExit("--int8 with a ResNet trunk requires "
                                 "--calib-images (static activation-scale "
                                 "calibration set)")
            paths = list_images(args.calib_images)[:32]
            if not paths:
                raise SystemExit(
                    f"No calibration images under {args.calib_images}")
            calib_u8 = decode_all(paths, args.image_size)
        trainer, state = quantize_for_serving(
            trainer, state, image_size=args.image_size, calib_u8=calib_u8,
            attention_impl=args.attention_impl)

    if getattr(args, "token_merge", None):
        from dfu_multimodal_tpu.models.zoo import VIT_TRUNK_MODELS
        if model_name in VIT_TRUNK_MODELS:
            from dfu_multimodal_tpu.serve.engine import (parse_token_merge,
                                                         tome_for_serving)
            merge_at, keep = parse_token_merge(args.token_merge)
            trainer, state = tome_for_serving(
                trainer, state, merge_at, keep,
                image_size=args.image_size,
                attention_impl=args.attention_impl,
                prop_attn=getattr(args, "tome_prop_attn", False))
            print(f"{ckpt.name}: token merging ({merge_at} full-token "
                  f"blocks, then {keep} tokens)")
        else:
            print(f"{ckpt.name}: --token-merge skipped "
                  f"({model_name} has no ViT trunk)")
    if keep_base:
        return model_name, trainer, state, base
    return model_name, trainer, state


def _resolve_deployment(directory: Path, args):
    """Per-model val-tuned threshold/temperature from deployment.json
    (extended_metrics --save-deployment); explicit flags win per-field."""
    from dfu_multimodal_tpu.eval.deployment import resolve_deployment
    threshold, temperature, note = resolve_deployment(
        directory, args.threshold, args.temperature,
        getattr(args, "ignore_deployment", False))
    if note:
        print(f"{directory.name}: loaded {note}")
    return threshold, temperature


def _drift_monitor(directory: Path, args):
    """DriftMonitor over <dir>/drift_baseline.json (written by every
    training run) unless --no-drift-monitor; a missing file means no
    monitoring for that model (exported bundles may carry one too)."""
    if getattr(args, "no_drift_monitor", False):
        return None
    from dfu_multimodal_tpu.eval import drift as drift_mod
    baseline = drift_mod.load_baseline(
        Path(directory) / drift_mod.BASELINE_FILENAME)
    if baseline is None:
        return None
    print(f"{Path(directory).name}: drift monitoring on "
          f"(baseline: {sorted(baseline['modalities'])})")
    return drift_mod.DriftMonitor(baseline)


def _load_engine(ckpt: Path, model_name, args, cfg, modalities):
    from dfu_multimodal_tpu.serve.engine import ServingEngine

    model_name, trainer, state, base = restore_trainer(
        ckpt, model_name, args, cfg, modalities, keep_base=True)
    explainer = None
    if getattr(args, "explain", False):
        from dfu_multimodal_tpu.serve.explain import Explainer
        from dfu_multimodal_tpu.eval.vit_attribution import (
            DOWNGRADE_NOTE, supports_transformer_attribution)
        cls = args.explain_class
        method = getattr(args, "cam_method", "saliency")
        if (method != "saliency"
                and not supports_transformer_attribution(model_name)):
            print(f"{ckpt.name}: --cam-method {method} {DOWNGRADE_NOTE}")
            method = "saliency"
        explainer = Explainer(base[0], base[1],
                              class_index="pred" if cls == "pred" else cls,
                              cam_method=method)
        print(f"{ckpt.name}: /v1/explain on (class={cls}, "
              f"method={method})")
    threshold, temperature = _resolve_deployment(ckpt, args)
    return model_name, ServingEngine(
        trainer, state, image_size=args.image_size,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        pipeline_depth=args.pipeline_depth, threshold=threshold,
        temperature=temperature, max_queue=args.max_queue,
        drift_monitor=_drift_monitor(ckpt, args), explainer=explainer)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.config import TrainConfig
    from dfu_multimodal_tpu.serve.engine import ModelRouter
    from dfu_multimodal_tpu.serve.http import make_server

    ckpts = list(args.checkpoint or [])
    if args.checkpoint_root is not None:
        ckpts += sorted(p for p in args.checkpoint_root.glob("checkpoints_*")
                        if p.is_dir())
    bundles = list(args.exported or [])
    if not ckpts and not bundles:
        raise SystemExit("need --checkpoint (repeatable), --checkpoint-root "
                         "and/or --exported")
    if args.model and len(ckpts) > 1:
        raise SystemExit("--model only applies to a single --checkpoint")

    cfg = TrainConfig(batch_size=args.max_batch,
                      eval_batch_size=args.max_batch,
                      compute_dtype=args.compute_dtype,
                      mesh=cfg_mod.MeshConfig(data=-1))
    modalities = {"rgb": cfg_mod.rgb_modality(),
                  "thermal": cfg_mod.thermal_modality()}

    engines = {}
    for ckpt in ckpts:
        name, engine = _load_engine(ckpt, args.model, args, cfg, modalities)
        if name in engines:
            raise SystemExit(f"model {name!r} served twice ({ckpt})")
        engines[name] = engine
    for bundle in bundles:
        from dfu_multimodal_tpu.serve.engine import ServingEngine
        from dfu_multimodal_tpu.serve.export import load_bundle

        servable = load_bundle(bundle)
        name = servable.spec.name
        if name in engines:
            raise SystemExit(f"model {name!r} served twice ({bundle})")
        thr, temp = _resolve_deployment(Path(bundle), args)
        engines[name] = ServingEngine(
            servable, None, image_size=servable.image_size,
            buckets=servable.buckets, max_wait_ms=args.max_wait_ms,
            pipeline_depth=args.pipeline_depth, threshold=thr,
            temperature=temp, max_queue=args.max_queue,
            drift_monitor=_drift_monitor(Path(bundle), args))
    router = ModelRouter(engines)

    shadows = []
    for sh in (args.shadow or []):
        import copy

        from dfu_multimodal_tpu.serve.engine import ServingEngine
        from dfu_multimodal_tpu.serve.shadow import attach_shadow

        # shadows serve full-fidelity with their OWN deployment.json:
        # the comparison is candidate-as-it-would-deploy vs the live
        # primary, independent of the primary's --int8/--threshold flags
        sh_args = copy.copy(args)
        sh_args.int8 = False
        sh_args.token_merge = None
        sh_args.threshold = None
        sh_args.temperature = None
        name, trainer, state = restore_trainer(sh, None, sh_args, cfg,
                                               modalities)
        thr, temp = _resolve_deployment(sh, sh_args)
        # shadow traffic is fire-and-forget with no client backpressure,
        # and the full-fidelity shadow may be slower than an int8/ToMe
        # primary: an unbounded queue would grow (holding uint8 samples
        # in host memory) without limit under sustained load.  Bound it
        # small regardless of the primary's --max-queue; overflow is
        # counted as sampling (ShadowTracker.dropped_overloaded), not
        # failure.
        eng = ServingEngine(
            trainer, state, image_size=args.image_size,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            threshold=thr, temperature=temp,
            max_queue=max(32, 4 * args.max_batch))
        try:
            tracker = attach_shadow(router, eng)
        except KeyError as exc:
            raise SystemExit(f"--shadow {sh}: {exc}")
        print(f"{sh.name}: {name} shadowing {tracker.primary_name}")
        shadows.append(tracker)

    if not args.no_warmup:
        for name, engine in engines.items():
            print(f"warming {name}: buckets {list(engine.buckets)} ...",
                  flush=True)
        router.warmup()
        for tracker in shadows:
            tracker.warmup()
    router.start()
    for tracker in shadows:
        tracker.start()

    server = make_server(router, args.host, args.port)
    # SIGTERM (the orchestrator's stop signal) drains like Ctrl-C: stop
    # accepting, finish in-flight batches, then exit 0.  shutdown() must
    # run off the serve_forever thread, hence the helper thread.
    import signal
    import threading

    signal.signal(signal.SIGTERM,
                  lambda *_: threading.Thread(target=server.shutdown,
                                              daemon=True).start())

    mode = "int8" if args.int8 else args.compute_dtype
    served = ", ".join(f"{n}{list(e.inputs)}" for n, e in engines.items())
    print(f"serving {served} ({mode}) on "
          f"http://{args.host}:{server.server_address[1]}  "
          f"[max_batch={args.max_batch}, wait={args.max_wait_ms}ms]",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        router.stop()
        for tracker in shadows:
            tracker.stop()
        print(f"shutdown: {router.stats()}", flush=True)
    return router.stats()


if __name__ == "__main__":
    main()
