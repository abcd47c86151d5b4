"""Load test for the dynamic-batching serving engine on the live backend.

Closed-loop: ``--clients`` threads each fire ``--requests`` sequential
single-image requests through ``ServingEngine.submit`` (pre-decoded uint8
arrays — isolates the batcher+device path; HTTP adds ~1 ms/req of host
JSON/base64 work on top).  Reports requests/s, end-to-end latency
percentiles, and the coalesced batch-size histogram.

Axon-tunnel caveat (docs/DESIGN.md "Benchmarking under the axon tunnel"):
every batch result fetch pays the ~30 ms host<->TPU RTT, so per-request
LATENCY through the tunnel is RTT-dominated and NOT what a TPU-attached
host would see (device compute is the b1/b8 rows in DESIGN.md: 0.63 /
3.66 ms).  THROUGHPUT is meaningful: deep concurrency amortizes the RTT
over full buckets.

    env PALLAS_AXON_REMOTE_COMPILE=1 python scripts_dev/bench_serve.py \
        --model multimodal --clients 256 --requests 8 [--int8]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="multimodal",
                    choices=["rgb_only", "thermal_only", "multimodal"])
    ap.add_argument("--clients", type=int, default=256)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=128)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--pipeline-depth", type=int, default=1)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.config import TrainConfig
    from dfu_multimodal_tpu.serve.engine import (ServingEngine,
                                                 quantize_for_serving)
    from dfu_multimodal_tpu.train.engine import Trainer

    cfg = TrainConfig(batch_size=args.max_batch,
                      eval_batch_size=args.max_batch,
                      compute_dtype="bfloat16",
                      mesh=cfg_mod.MeshConfig(data=-1))
    modalities = {"rgb": cfg_mod.rgb_modality(),
                  "thermal": cfg_mod.thermal_modality()}
    trainer = Trainer(args.model, cfg, modalities)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               image_size=args.image_size)
    rng = np.random.default_rng(0)
    if args.int8:
        calib = rng.integers(0, 256, (8, args.image_size, args.image_size, 3),
                             dtype=np.uint8)
        trainer, state = quantize_for_serving(
            trainer, state, image_size=args.image_size,
            calib_u8=calib if "rgb" in trainer.spec.inputs else None)

    engine = ServingEngine(trainer, state, image_size=args.image_size,
                           max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms,
                           pipeline_depth=args.pipeline_depth)
    print(f"model={args.model} int8={args.int8} buckets={engine.buckets}",
          flush=True)
    t0 = time.monotonic()
    engine.warmup()
    print(f"warmup (all buckets compiled + run): "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    imgs = {m: rng.integers(
        0, 256, (args.clients, args.image_size, args.image_size, 3),
        dtype=np.uint8) for m in trainer.spec.inputs}

    def client(i, out):
        sample = {m: imgs[m][i] for m in trainer.spec.inputs}
        for _ in range(args.requests):
            prob, pred = engine.submit(sample).result(timeout=300)
        out[i] = prob

    with engine:
        # one priming round so thread startup doesn't skew the timing
        engine.predict([{m: imgs[m][0] for m in trainer.spec.inputs}])
        probs = [None] * args.clients
        threads = [threading.Thread(target=client, args=(i, probs))
                   for i in range(args.clients)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        stats = engine.stats()

    total = args.clients * args.requests
    print(f"\n{total} requests / {args.clients} concurrent clients "
          f"in {wall:.2f}s  ->  {total / wall:.0f} req/s")
    print(f"latency end-to-end (incl. tunnel RTT): {stats['latency_ms']}")
    hist = stats["batch_size_hist"]
    mean_b = (sum(int(k) * v for k, v in hist.items())
              / max(1, sum(hist.values())))
    print(f"batches: {sum(hist.values())}  mean size {mean_b:.1f}  "
          f"hist {hist}")
    assert all(p is not None and 0.0 <= p <= 1.0 for p in probs)


if __name__ == "__main__":
    main()
