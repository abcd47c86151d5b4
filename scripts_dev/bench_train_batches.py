"""Train-throughput batch-scaling study (round 3, VERDICT item 3).

Measures steady-state train-step throughput for all three models at
b32/b64/b128 plus the --grad-accum composition (b64 as 2 microbatches of
32 — the memory-constrained route to an effective 64 batch), using
bench.py's chained-scan methodology on whatever backend is live.  Prints
one JSON line per row; results + analytic MFU go into docs/DESIGN.md's
batch-scaling table.

    python scripts_dev/bench_train_batches.py [--models rgb_only ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="*",
                        default=["rgb_only", "thermal_only", "multimodal"])
    parser.add_argument("--batches", nargs="*", type=int,
                        default=[32, 64, 128])
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--skip-grad-accum", action="store_true")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))

    from bench import measure_training
    from dfu_multimodal_tpu.utils import flops as flops_mod

    peak = flops_mod.device_peak_tflops()
    rows = []
    for model in args.models:
        for b in args.batches:
            try:
                r = measure_training(b, args.iters, chain=8, model=model)
            except Exception as exc:
                print(json.dumps({"model": model, "batch": b,
                                  "error": str(exc)}))
                continue
            row = {"model": model, "batch": b, "grad_accum": 1,
                   "ips": round(r["train_images_per_sec_per_chip"], 1),
                   "p50_step_ms": round(r["p50_step_ms"], 2),
                   "train_mfu_pct": flops_mod.mfu_pct(
                       r["train_images_per_sec_per_chip"],
                       flops_mod.train_step_flops(model), peak)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        if not args.skip_grad_accum:
            # --grad-accum composition: effective batch 64 as 2x32
            # microbatches (one scanned program; train/engine.py
            # train_step_accum)
            try:
                r = measure_training(64, args.iters, chain=8, model=model,
                                     grad_accum=2)
            except Exception as exc:
                print(json.dumps({"model": model, "batch": 64,
                                  "grad_accum": 2, "error": str(exc)}))
                continue
            row = {"model": model, "batch": 64, "grad_accum": 2,
                   "ips": round(r["train_images_per_sec_per_chip"], 1),
                   "p50_step_ms": round(r["p50_step_ms"], 2),
                   "train_mfu_pct": flops_mod.mfu_pct(
                       r["train_images_per_sec_per_chip"],
                       flops_mod.train_step_flops(model), peak)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": rows, "peak_tflops": peak,
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
