"""Validate + measure the SimCLR pretrain step inside jax.shard_map on TPU.

Round-5 counterpart of bench_spmd_serving.py for the SSL engine
(train/ssl.py::_build_simclr_spmd_step): multi-chip hardware is
unavailable, so the path is certified in two halves —

- CPU 8-device mesh: interpret-mode kernels under shard_map with the
  all_gather'd global NT-Xent pool, loss/param parity vs the jit path
  (tests/test_spmd_fused.py, __graft_entry__ dryrun stage 8);
- THIS script, on the real chip: the REAL Mosaic fused ViT fwd+bwd
  kernels inside a 1-device shard_map — proves the compile/execute path
  jax requires for multi-device meshes and measures the wrapper +
  all_gather overhead vs the plain jit SimCLR step (which on one TPU
  device also resolves "auto" to the fused kernels, so this isolates
  exactly the wrapper delta).

Run (claims the TPU grant — never concurrently with another TPU python):
    python scripts_dev/bench_ssl_spmd.py [--batch-size 32] [--iters 5]
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
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    from bench import _tunnel_rtt_ms

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.ssl import PretrainConfig, SSLTrainer

    platform = jax.devices()[0].platform
    cfg = PretrainConfig(
        method="simclr", batch_size=args.batch_size,
        compute_dtype="bfloat16" if platform == "tpu" else "float32")
    trainer = SSLTrainer("vit", cfg, config.thermal_modality(blur=False),
                         image_size=args.image_size)
    state0 = trainer.init_state(jax.random.PRNGKey(0), steps_per_epoch=10)

    rng = np.random.default_rng(0)
    batch = {"thermal": rng.integers(
                 0, 255, (args.batch_size, args.image_size,
                          args.image_size, 3), np.uint8),
             "valid": np.ones(args.batch_size, np.float32)}
    batch = jax.device_put(batch, trainer.batch_sharding)

    steps = {
        "jit": trainer.build_train_step(),
        "shard_map": trainer.build_train_step(force_shard_map=True),
    }

    # numerics first: one step from the same init must agree (both run
    # the fused kernels on TPU; the only differences are the wrapper,
    # the trivial 1-device all_gather, and fp reduction order)
    copy = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    losses = {k: float(np.asarray(
        fn(copy(state0), batch, jax.random.PRNGKey(1))[1]))
        for k, fn in steps.items()}
    d_loss = abs(losses["jit"] - losses["shard_map"])
    print(f"parity: loss jit={losses['jit']:.6f} "
          f"shard_map={losses['shard_map']:.6f}  |d|={d_loss:.2e}")

    rtt_ms = _tunnel_rtt_ms()
    results = {}
    for name, fn in steps.items():
        def chained(state, batch):
            def body(s, _):
                s, loss = fn(s, batch, jax.random.PRNGKey(2))
                return s, loss
            _, out = jax.lax.scan(body, state, None, length=args.chain)
            return out

        run = jax.jit(chained, donate_argnums=(0,))
        np.asarray(run(copy(state0), batch))         # compile + warm
        times = []
        for _ in range(args.iters):
            st = copy(state0)
            t0 = time.perf_counter()
            np.asarray(run(st, batch))
            times.append(time.perf_counter() - t0)
        times.sort()
        per_ms = max((times[len(times) // 2] * 1e3 - rtt_ms) / args.chain,
                     1e-6)
        results[name] = {
            "p50_step_ms": round(per_ms, 3),
            "images_per_sec_per_chip": round(
                args.batch_size / (per_ms / 1e3), 1)}
        print(name, results[name])

    overhead = (results["shard_map"]["p50_step_ms"]
                / results["jit"]["p50_step_ms"] - 1.0)
    print(json.dumps({"platform": platform,
                      "batch_size": args.batch_size,
                      "parity_dloss": d_loss,
                      "jit": results["jit"],
                      "shard_map": results["shard_map"],
                      "shard_map_overhead_pct": round(100 * overhead, 2)}))


if __name__ == "__main__":
    main()
