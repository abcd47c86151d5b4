"""Benchmark: fused RGB+thermal inference throughput (images/sec/chip).

The reference publishes no throughput numbers (BASELINE.md), so the
comparison baseline is the CPU throughput of the same fused model, measured
once via ``python bench.py --measure-cpu`` and stored in BASELINE_CPU.json
(BASELINE.json target: >=10x CPU baseline on fused RGB+thermal inference).

Default run: flagship multimodal model (ResNet50 ⊕ ViT-B/16, bf16 on TPU,
Pallas flash attention), steady-state jitted inference on device-resident
uint8 batches including on-device normalization.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

CPU_BASELINE_FILE = REPO_ROOT / "BASELINE_CPU.json"


def build_forward(batch_size: int, image_size: int = 224,
                  int8: bool = False, token_merge=None,
                  tome_prop_attn: bool = False):
    import jax
    import jax.numpy as jnp

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.transforms import eval_normalize
    from dfu_multimodal_tpu.models import zoo

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    attention_impl = "pallas" if on_tpu else "xla"

    module, spec = zoo.build("multimodal", dtype=dtype,
                             attention_impl=attention_impl)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=image_size)
    if int8:
        # int8 serving path: quantize BOTH trunks once at load — the ViT
        # with DYNAMIC per-row activation quantization (fused_q8 Pallas
        # block kernels; measured equal to the calibrated-static variant,
        # see below), the ResNet via int8 XLA convs with STATIC activation
        # scales calibrated here on a random batch — real deployments
        # calibrate on their data (predict --int8 does).
        from dfu_multimodal_tpu.models.resnet_q8 import quantize_rgb_trunks
        from dfu_multimodal_tpu.models.vit import quantize_variables
        calib = jax.random.normal(
            jax.random.PRNGKey(42), (8, image_size, image_size, 3), dtype)
        # dynamic per-row ViT activation quant: measured equal to the
        # calibrated-static variant (fused_q8s, 4092 vs 4125 img/s —
        # noise band; the absmax reductions hide under the MXU ops), so
        # the calibration-free path stays the default here
        variables = quantize_rgb_trunks(quantize_variables(variables),
                                        [calib], dtype=dtype)
        module, spec = zoo.build(
            "multimodal", dtype=dtype, attention_impl=attention_impl,
            block_impl="fused_q8" if on_tpu else "fused_q8_interpret",
            rgb_impl="int8")
    if token_merge is not None:
        # ToMe serving path (models/vit.py token_merge): split the ViT
        # branch's stacked encoder params and run two scans around one
        # bipartite merge (measured 1.33-1.47x on the encoder chain,
        # scripts_dev/bench_tome.py). Composes with int8: the split is
        # purely structural, so it applies to the quantized tree too.
        from dfu_multimodal_tpu.models.vit import split_encoder_variables
        merge_at, keep = token_merge
        variables = split_encoder_variables(variables, merge_at)
        extra = ({"block_impl": "fused_q8" if on_tpu
                  else "fused_q8_interpret", "rgb_impl": "int8"}
                 if int8 else {})
        module, spec = zoo.build("multimodal", dtype=dtype,
                                 attention_impl=attention_impl,
                                 token_merge=(merge_at, keep),
                                 tome_prop_attn=tome_prop_attn, **extra)
    rgb_mod = config.rgb_modality()
    th_mod = config.thermal_modality()

    @jax.jit
    def forward(variables, rgb_u8, thermal_u8):
        rgb = eval_normalize(rgb_u8, rgb_mod, dtype)
        thermal = eval_normalize(thermal_u8, th_mod, dtype)
        logits = module.apply(variables, rgb, thermal, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    key = jax.random.PRNGKey(1)
    rgb = jax.random.randint(key, (batch_size, image_size, image_size, 3),
                             0, 256, dtype=jnp.int32).astype(jnp.uint8)
    th = jax.random.randint(key, (batch_size, image_size, image_size, 3),
                            0, 256, dtype=jnp.int32).astype(jnp.uint8)
    return forward, variables, rgb, th, platform


def _tunnel_rtt_ms(repeats: int = 7) -> float:
    """Host<->device round-trip latency of a trivial fetched program.

    Under the axon TPU tunnel ``block_until_ready`` returns without waiting
    for device completion; only a device->host fetch synchronizes.  All
    timings therefore fetch a scalar and subtract this RTT."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def trivial(x):
        return x + 1

    x = jnp.zeros((2, 2))
    np.asarray(trivial(x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(trivial(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def measure(batch_size: int, iters: int, chain: int = 10,
            int8: bool = False, token_merge=None,
            tome_prop_attn: bool = False):
    """Steady-state throughput via a chained-scan program.

    ``chain`` forwards are serialized inside ONE device program by a
    data-dependent perturbation of BOTH inputs (defeats loop-invariant
    hoisting and dead-code batch narrowing), and the scalar outputs are
    fetched once; per-iteration time = (total - tunnel RTT) / chain.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    forward, variables, rgb, th, platform = build_forward(
        batch_size, int8=int8, token_merge=token_merge,
        tome_prop_attn=tome_prop_attn)
    rtt_ms = _tunnel_rtt_ms()

    def chained(variables, rgb, th):
        def body(carry, _):
            r, t = carry
            out = forward(variables, r, t)
            s = jnp.sum(out)                     # consume the WHOLE batch
            bump = (s > 0).astype(jnp.uint8)
            return (r ^ bump, t ^ bump), s
        _, outs = jax.lax.scan(body, (rgb, th), None, length=chain)
        return outs

    run = jax.jit(chained)
    np.asarray(run(variables, rgb, th))          # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(variables, rgb, th))
        times.append(time.perf_counter() - t0)
    times.sort()
    p50_total_ms = times[len(times) // 2] * 1e3
    per_iter_ms = max((p50_total_ms - rtt_ms) / chain, 1e-6)
    return {"platform": platform, "batch_size": batch_size,
            "images_per_sec_per_chip": batch_size / (per_iter_ms / 1e3),
            "p50_batch_latency_ms": per_iter_ms,
            "tunnel_rtt_ms": rtt_ms, "chain": chain, "iters": iters}


def measure_training(batch_size: int, iters: int, chain: int = 8,
                     model: str = "rgb_only", **cfg_overrides):
    """Steady-state TRAIN-step throughput: ``chain`` full steps (device-side
    augmentation + fwd + bwd + AdamW) scanned inside one program.
    ``cfg_overrides`` set extra TrainConfig fields (e.g. ema_decay) for
    A/B measurements of opt-in features (scripts_dev/bench_ema.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer

    platform = jax.devices()[0].platform
    cfg = config.TrainConfig(
        batch_size=batch_size,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
        **cfg_overrides)
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer(model, cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    step = trainer.build_train_step(jit=False)
    rtt_ms = _tunnel_rtt_ms()

    rng = np.random.default_rng(0)
    batch = {m: rng.integers(0, 255, (batch_size, 224, 224, 3), np.uint8)
             for m in trainer.spec.inputs}
    batch["label"] = rng.integers(0, 2, batch_size).astype(np.int32)
    batch["valid"] = np.ones(batch_size, np.float32)
    batch = jax.device_put(batch, trainer.batch_sharding)

    @jax.jit
    def many_steps(state, batch, rng):
        def body(s, i):
            s, m = step(s, batch, jax.random.fold_in(rng, i))
            return s, m["loss"]
        _, losses = jax.lax.scan(body, state,
                                 jnp.arange(chain, dtype=jnp.int32))
        return losses

    key = jax.random.PRNGKey(1)
    np.asarray(many_steps(state, batch, key))     # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(many_steps(state, batch, key))
        times.append(time.perf_counter() - t0)
    times.sort()
    per_step_ms = max((times[len(times) // 2] * 1e3 - rtt_ms) / chain, 1e-6)
    return {"platform": platform, "batch_size": batch_size, "model": model,
            "train_images_per_sec_per_chip": batch_size / (per_step_ms / 1e3),
            "p50_step_ms": per_step_ms, "chain": chain}


def measure_ssl_pretrain(batch_size: int, iters: int, chain: int = 6):
    """Steady-state SimCLR PRETRAIN-step throughput over the fused ViT
    trunk (two augmented views through one concatenated forward, NT-Xent,
    AdamW — train/ssl.py). images/sec counts dataset images (each costs
    2 view forwards+backwards), so it compares 1:1 with the supervised
    thermal train rate."""
    import jax
    import numpy as np

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.ssl import PretrainConfig, SSLTrainer

    platform = jax.devices()[0].platform
    cfg = PretrainConfig(
        method="simclr", batch_size=batch_size,
        compute_dtype="bfloat16" if platform == "tpu" else "float32")
    trainer = SSLTrainer("vit", cfg, config.thermal_modality(blur=False))
    state = trainer.init_state(jax.random.PRNGKey(0), steps_per_epoch=10)
    step = trainer.build_train_step()
    rtt_ms = _tunnel_rtt_ms()

    rng = np.random.default_rng(0)
    batch = {"thermal": rng.integers(0, 255, (batch_size, 224, 224, 3),
                                     np.uint8),
             "valid": np.ones(batch_size, np.float32)}
    batch = jax.device_put(batch, trainer.batch_sharding)

    def many_steps(state, batch, rng):
        def body(s, i):
            s, loss = step(s, batch, jax.random.fold_in(rng, i))
            return s, loss
        import jax.numpy as jnp
        _, losses = jax.lax.scan(body, state,
                                 jnp.arange(chain, dtype=jnp.int32))
        return losses

    # no donation: the same state re-runs every iteration (state size is
    # ~1 GB headroom on a 16 GB chip; re-initializing per iter would put
    # host-side init work between the timed fetches instead)
    run = jax.jit(many_steps)
    key = jax.random.PRNGKey(1)
    np.asarray(run(state, batch, key))            # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(state, batch, key))
        times.append(time.perf_counter() - t0)
    times.sort()
    per_step_ms = max((times[len(times) // 2] * 1e3 - rtt_ms) / chain, 1e-6)
    return {"platform": platform, "batch_size": batch_size,
            "ssl_images_per_sec_per_chip": batch_size / (per_step_ms / 1e3),
            "p50_step_ms": per_step_ms, "chain": chain}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--measure-cpu", action="store_true",
                        help="measure + store the CPU baseline instead")
    parser.add_argument("--train", action="store_true",
                        help="measure training-step throughput instead")
    parser.add_argument("--model", default="rgb_only",
                        help="model for --train mode")
    parser.add_argument("--int8", action="store_true",
                        help="measure the int8 ViT serving path")
    parser.add_argument("--token-merge", default=None, metavar="L:K",
                        help="measure the ToMe serving path: L full-token "
                             "encoder blocks, bipartite-merge to K tokens")
    parser.add_argument("--tome-prop-attn", action="store_true",
                        help="with --token-merge: ToMe proportional "
                             "attention (log-size key bias)")
    # Accepted no-op for one round: the warmup count became adaptive in
    # round 3, but the flag is part of the driver-facing contract.
    parser.add_argument("--warmup", type=int, default=None,
                        help=argparse.SUPPRESS)
    args = parser.parse_args()
    if args.token_merge:
        args.token_merge = tuple(
            int(v) for v in args.token_merge.split(":"))

    if args.train:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO_ROOT / ".jax_cache"))
        on_tpu = jax.devices()[0].platform == "tpu"
        result = measure_training(
            args.batch_size or (32 if on_tpu else 4),
            args.iters or (5 if on_tpu else 2),
            chain=8 if on_tpu else 2, model=args.model)
        print(json.dumps({
            "metric": f"{args.model}_train_images_per_sec_per_chip",
            "value": round(result["train_images_per_sec_per_chip"], 2),
            "unit": "images/sec/chip",
            "p50_step_ms": round(result["p50_step_ms"], 2),
            "batch_size": result["batch_size"],
            "platform": result["platform"],
        }))
        return

    if args.measure_cpu:
        import os
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        # the axon sitecustomize pre-set jax_platforms="axon,cpu", which
        # overrides the env var — reset it so this really measures CPU
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO_ROOT / ".jax_cache"))
        result = measure(args.batch_size or 4, args.iters or 2, chain=2)
        CPU_BASELINE_FILE.write_text(json.dumps(result, indent=2))
        print(json.dumps(result))
        return

    import os

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    on_tpu = jax.devices()[0].platform == "tpu"
    result = measure(args.batch_size or (128 if on_tpu else 4),
                     args.iters or (7 if on_tpu else 2),
                     chain=10 if on_tpu else 2, int8=args.int8,
                     token_merge=args.token_merge,
                     tome_prop_attn=args.tome_prop_attn)

    vs_baseline = None
    if CPU_BASELINE_FILE.exists():
        cpu = json.loads(CPU_BASELINE_FILE.read_text())
        vs_baseline = (result["images_per_sec_per_chip"]
                       / cpu["images_per_sec_per_chip"])

    # Also record flagship TRAIN-step throughput and the int8 serving path
    # in the same artifact line (full train step: device-side augmentation
    # + fwd + bwd + AdamW). Guarded: the headline inference metric survives
    # any secondary-measurement failure.
    train_ips = {}
    if (on_tpu and not args.int8 and not args.token_merge
            and not os.environ.get("DFU_BENCH_SKIP_TRAIN")):
        for model in ("multimodal", "thermal_only", "rgb_only"):
            try:
                t = measure_training(32, 3, chain=8, model=model)
                train_ips[model] = round(
                    t["train_images_per_sec_per_chip"], 2)
            except Exception as exc:                  # pragma: no cover
                print(f"train-throughput measurement failed ({model}): "
                      f"{exc}", file=sys.stderr)
    ssl_ips = None
    if (on_tpu and not args.int8 and not args.token_merge
            and not os.environ.get("DFU_BENCH_SKIP_SSL")):
        try:
            s = measure_ssl_pretrain(32, 3, chain=6)
            ssl_ips = round(s["ssl_images_per_sec_per_chip"], 2)
        except Exception as exc:                      # pragma: no cover
            print(f"ssl-throughput measurement failed: {exc}",
                  file=sys.stderr)
    int8_ips = None
    if (on_tpu and not args.int8 and not args.token_merge
            and not os.environ.get("DFU_BENCH_SKIP_INT8")):
        try:
            q = measure(args.batch_size or 128, args.iters or 7, chain=10,
                        int8=True)
            int8_ips = round(q["images_per_sec_per_chip"], 2)
        except Exception as exc:                      # pragma: no cover
            print(f"int8-throughput measurement failed: {exc}",
                  file=sys.stderr)
    # opt-in serving optimizations, recorded alongside the parity-path
    # headline: token merging (L=2 K=128, docs/DESIGN.md) and its int8
    # composition — the measured serving ceiling
    tome_ips = int8_tome_ips = None
    if (on_tpu and not args.int8 and not args.token_merge
            and not os.environ.get("DFU_BENCH_SKIP_TOME")):
        try:
            t = measure(args.batch_size or 128, args.iters or 7, chain=10,
                        token_merge=(2, 128))
            tome_ips = round(t["images_per_sec_per_chip"], 2)
            t = measure(args.batch_size or 128, args.iters or 7, chain=10,
                        int8=True, token_merge=(2, 128))
            int8_tome_ips = round(t["images_per_sec_per_chip"], 2)
        except Exception as exc:                      # pragma: no cover
            print(f"token-merge measurement failed: {exc}",
                  file=sys.stderr)

    # Clinical serving is batch-1-to-8: record small-batch p50 device
    # latency of the same fused bf16 path (chained-scan method, RTT
    # subtracted — device compute latency, not tunnel latency).
    b1_ms = b8_ms = None
    if (on_tpu and not args.int8 and not args.token_merge
            and not os.environ.get("DFU_BENCH_SKIP_LATENCY")):
        try:
            # sub-ms per-iteration latencies need chains long enough to
            # dominate the tunnel RTT jitter (±10 ms, CLAUDE.md): at
            # chain=100 a b1 run is ~60 ms of device time against a
            # 30±10 ms RTT — one high RTT sample collapses the
            # subtraction to ~0 (observed).  chain=500 puts ~320 ms of
            # device time behind the fetch, so the jitter is <4% noise.
            b1_ms = round(measure(1, 5,
                                  chain=500)["p50_batch_latency_ms"], 3)
            b8_ms = round(measure(8, 5,
                                  chain=100)["p50_batch_latency_ms"], 3)
        except Exception as exc:                      # pragma: no cover
            print(f"latency measurement failed: {exc}", file=sys.stderr)

    # Approximate serving MFU against the ACTUAL chip's peak dense bf16
    # rate and the ACTUAL model config's analytic flops (incl. the
    # reduced token count under --token-merge) — utils/flops.py; null on
    # unknown chips rather than silently wrong.  Analytic because XLA's
    # cost_analysis cannot see inside the Pallas block kernels that carry
    # most of the ViT's work.  For --int8 the bf16-relative MFU stays
    # suppressed (wrong peak) and the artifact instead reports
    # ``int8_serving_utilization_pct`` = ops/sec over the chip's int8
    # peak (device_peak_int8_tops; null on chips without published int8
    # rates).  The int8 path is mixed precision — attention/LN/softmax
    # stay bf16/fp32 — so this is a lower bound on int8-work scheduling
    # quality; docs/DESIGN.md "int8 roofline" carries the structural
    # attribution of the remainder.
    from dfu_multimodal_tpu.utils import flops as flops_mod
    peak_tflops = flops_mod.device_peak_tflops() if on_tpu else None
    peak_int8 = flops_mod.device_peak_int8_tops() if on_tpu else None
    serving_mfu = None
    int8_util = None
    if on_tpu and not args.int8:
        serving_mfu = flops_mod.mfu_pct(
            result["images_per_sec_per_chip"],
            flops_mod.model_forward_flops(
                "multimodal", token_merge=args.token_merge),
            peak_tflops)
    int8_headline_ips = (result["images_per_sec_per_chip"] if args.int8
                         else int8_ips)
    if on_tpu and int8_headline_ips:
        int8_util = flops_mod.mfu_pct(
            int8_headline_ips,
            flops_mod.model_forward_flops(
                "multimodal",
                token_merge=args.token_merge if args.int8 else None),
            peak_int8)
    # train MFU per model (3x-forward rule, utils/flops.py): the honest
    # denominator includes device-side augmentation + AdamW time that
    # adds no counted flops
    train_mfu = {
        m: flops_mod.mfu_pct(ips, flops_mod.train_step_flops(m),
                             peak_tflops)
        for m, ips in train_ips.items()}

    print(json.dumps({
        "metric": ("fused_rgb_thermal_int8_inference_images_per_sec_per_chip"
                   if args.int8 else
                   "fused_rgb_thermal_tome_inference_images_per_sec_per_chip"
                   if args.token_merge else
                   "fused_rgb_thermal_inference_images_per_sec_per_chip"),
        "token_merge": (list(args.token_merge)
                        if args.token_merge else None),
        "value": round(result["images_per_sec_per_chip"], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "p50_batch_latency_ms": round(result["p50_batch_latency_ms"], 2),
        "batch_size": result["batch_size"],
        "platform": result["platform"],
        "multimodal_train_images_per_sec_per_chip":
            train_ips.get("multimodal"),
        "thermal_train_images_per_sec_per_chip":
            train_ips.get("thermal_only"),
        "rgb_train_images_per_sec_per_chip": train_ips.get("rgb_only"),
        "ssl_simclr_pretrain_images_per_sec_per_chip": ssl_ips,
        "int8_serving_images_per_sec_per_chip": int8_ips,
        "tome_serving_images_per_sec_per_chip": tome_ips,
        "int8_tome_serving_images_per_sec_per_chip": int8_tome_ips,
        "b1_p50_latency_ms": b1_ms,
        "b8_p50_latency_ms": b8_ms,
        "device_kind": (jax.devices()[0].device_kind if on_tpu else None),
        "peak_bf16_tflops": peak_tflops,
        "peak_int8_tops": peak_int8,
        "approx_serving_mfu_pct": serving_mfu,
        "int8_serving_utilization_pct": int8_util,
        "multimodal_train_mfu_pct": train_mfu.get("multimodal"),
        "thermal_train_mfu_pct": train_mfu.get("thermal_only"),
        "rgb_train_mfu_pct": train_mfu.get("rgb_only"),
    }))


if __name__ == "__main__":
    main()
