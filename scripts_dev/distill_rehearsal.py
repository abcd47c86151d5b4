"""Distillation rehearsal on real TPU at reference scale.

Trains a ViT-B/16 thermal teacher on reference-sized synthetic data
(BASELINE.md thermal split: 1227/422/217), distills it into the
ResNet-18 student (`dfu distill`), and measures what the compression
buys at serving time: student vs teacher test F1, bf16 b128 throughput,
and b1 p50 latency (chained-scan method from bench.py — fetch-timed,
tunnel RTT subtracted).

    python scripts_dev/distill_rehearsal.py --workdir /tmp/dfu_distill
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import _tunnel_rtt_ms  # noqa: E402

# BASELINE.md thermal split sizes (healthy, ulcer)
THERMAL_COUNTS = {
    "rgb": {"train": (8, 8), "val": (2, 2), "test": (2, 2)},  # unused
    "thermal": {"train": (612, 615), "val": (170, 252), "test": (108, 109)},
}


def measure_forward(model_name: str, batch_size: int, iters: int = 7,
                    chain: int = 10):
    """Steady-state eval-forward throughput of one zoo model (bf16 on
    TPU), inputs device-resident, normalization on device."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.transforms import eval_normalize
    from dfu_multimodal_tpu.models import zoo

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    module, spec = zoo.build(model_name, dtype=dtype)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=224)
    mod = config.thermal_modality()

    def forward(variables, x_u8):
        x = eval_normalize(x_u8, mod, dtype)
        logits = module.apply(variables, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    x = jax.random.randint(jax.random.PRNGKey(1),
                           (batch_size, 224, 224, 3), 0, 256,
                           dtype=jnp.int32).astype(jnp.uint8)
    rtt_ms = _tunnel_rtt_ms()

    def chained(variables, x):
        def body(carry, _):
            out = forward(variables, carry)
            s = jnp.sum(out)
            return carry ^ (s > 0).astype(jnp.uint8), s
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs

    run = jax.jit(chained)
    np.asarray(run(variables, x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(variables, x))
        times.append(time.perf_counter() - t0)
    times.sort()
    per_iter_ms = max((times[len(times) // 2] * 1e3 - rtt_ms) / chain, 1e-6)
    return {"model": model_name, "batch_size": batch_size,
            "images_per_sec_per_chip": round(
                batch_size / (per_iter_ms / 1e3), 2),
            "p50_batch_latency_ms": round(per_iter_ms, 3)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=Path,
                        default=Path("/tmp/dfu_distill"))
    parser.add_argument("--teacher-epochs", type=int, default=3)
    parser.add_argument("--student-epochs", type=int, default=5)
    args = parser.parse_args()

    data = args.workdir / "data"
    logs = args.workdir / "logs"
    report = {}

    if not (data / "thermal" / "train").exists():
        print("Generating reference-sized synthetic thermal dataset ...")
        t0 = time.time()
        from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
        make_synthetic_dataset(data, counts=THERMAL_COUNTS, size=224, seed=7)
        print(f"  done in {time.time() - t0:.0f}s")

    teacher_ckpt = logs / "checkpoints_thermal_only"
    if not (teacher_ckpt / "best_model.msgpack").exists():
        from dfu_multimodal_tpu.cli.train_thermal_only import main as th_main
        t0 = time.time()
        res = th_main(["--data-dir", str(data), "--checkpoint-root",
                       str(logs), "--epochs", str(args.teacher_epochs),
                       "--batch-size", "16"])
        report["teacher_train"] = {**res, "seconds": round(time.time() - t0)}
        print(f"[teacher] {res} ({time.time() - t0:.0f}s)")

    from dfu_multimodal_tpu.cli.distill import main as distill_main
    t0 = time.time()
    rc = distill_main(["--teacher-checkpoint", str(teacher_ckpt),
                       "--student", "resnet18_thermal",
                       "--data-dir", str(data),
                       "--checkpoint-root", str(logs),
                       "--epochs", str(args.student_epochs),
                       "--batch-size", "32"])
    report["distill_seconds"] = round(time.time() - t0)
    print(f"[distill] rc={rc} ({time.time() - t0:.0f}s)")

    import torch
    res = torch.load(logs / "checkpoints_resnet18_thermal_distilled"
                     / "test_results.pt", weights_only=False)
    report["teacher_test_f1"] = float(res["teacher_test_f1"])
    report["student_test_f1"] = float(res["test_f1"])
    report["student_test_acc"] = float(res["test_acc"])

    print("Measuring serving throughput/latency (bf16, chained scan) ...")
    report["student_b128"] = measure_forward("resnet18_thermal", 128)
    report["student_b1"] = measure_forward("resnet18_thermal", 1, chain=20)
    report["teacher_b128"] = measure_forward("thermal_only", 128)
    report["teacher_b1"] = measure_forward("thermal_only", 1, chain=20)

    out = args.workdir / "distill_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
