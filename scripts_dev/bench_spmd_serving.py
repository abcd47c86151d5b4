"""Validate + measure the fused serving step inside jax.shard_map on TPU.

Multi-chip hardware is unavailable (one v5e chip over the axon tunnel), so
the multi-device fused-SPMD serving path (train/engine.py build_eval_step,
docs/DESIGN.md "Kernels under SPMD") is certified in two halves:

- CPU 8-device mesh: interpret-mode kernels under shard_map, row parity vs
  the jit/XLA path (tests/test_spmd_fused.py, __graft_entry__ dryrun);
- THIS script, on the real chip: the REAL Mosaic kernels inside a
  1-device shard_map — proves the compile/execute path jax requires for
  multi-device meshes ("wrap the call in a shard_map") and measures the
  wrapper's overhead vs the plain jit program that bench.py reports.

Run (claims the TPU grant — never concurrently with another TPU python):
    python scripts_dev/bench_spmd_serving.py [--batch-size 128] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    from bench import _tunnel_rtt_ms

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer

    platform = jax.devices()[0].platform
    cfg = config.TrainConfig(
        batch_size=args.batch_size,
        compute_dtype="bfloat16" if platform == "tpu" else "float32")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer("multimodal", cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    variables = trainer.variables(state)

    rng = np.random.default_rng(0)
    batch = {m: rng.integers(0, 255, (args.batch_size, 224, 224, 3),
                             np.uint8)
             for m in trainer.spec.inputs}
    batch["label"] = rng.integers(0, 2, args.batch_size).astype(np.int32)
    batch["valid"] = np.ones(args.batch_size, np.float32)
    batch = jax.device_put(batch, trainer.batch_sharding)

    steps = {
        "jit": trainer.build_eval_step(),
        "shard_map": trainer.build_eval_step(force_shard_map=True),
    }

    # numerics first: the wrapped program must reproduce the plain one
    outs = {k: fn(variables, batch) for k, fn in steps.items()}
    d_prob = float(np.max(np.abs(
        np.asarray(outs["jit"]["probs"], np.float64)
        - np.asarray(outs["shard_map"]["probs"], np.float64))))
    flips = int(np.sum(np.asarray(outs["jit"]["preds"])
                       != np.asarray(outs["shard_map"]["preds"])))
    print(f"parity: max|dprob|={d_prob:.3e}  pred flips={flips}")

    rtt_ms = _tunnel_rtt_ms()
    results = {}
    for name, fn in steps.items():
        def chained(variables, batch):
            def body(b, _):
                out = fn(variables, b)
                s = jnp.sum(out["probs"])
                bump = (s > 0).astype(jnp.uint8)
                b = dict(b)
                for m in trainer.spec.inputs:
                    b[m] = b[m] ^ bump
                return b, s
            _, outs = jax.lax.scan(body, batch, None, length=args.chain)
            return outs

        run = jax.jit(chained)
        np.asarray(run(variables, batch))            # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(run(variables, batch))
            times.append(time.perf_counter() - t0)
        times.sort()
        per_ms = max((times[len(times) // 2] * 1e3 - rtt_ms) / args.chain,
                     1e-6)
        results[name] = {
            "p50_batch_ms": round(per_ms, 3),
            "images_per_sec_per_chip": round(
                args.batch_size / (per_ms / 1e3), 1)}
        print(name, results[name])

    overhead = (results["shard_map"]["p50_batch_ms"]
                / results["jit"]["p50_batch_ms"] - 1.0)
    print(json.dumps({"platform": platform,
                      "batch_size": args.batch_size,
                      "parity_max_dprob": d_prob,
                      "parity_pred_flips": flips,
                      "jit": results["jit"],
                      "shard_map": results["shard_map"],
                      "shard_map_overhead_pct": round(100 * overhead, 2)}))


if __name__ == "__main__":
    main()
