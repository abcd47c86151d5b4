"""Op-level device attribution of the thermal train step via jax.profiler.

The chained-scan wall-clock decomposition (profile_trainstep.py) bounds
aug/fwd/bwd/opt, but cannot attribute the backward's interior.  The
profiler's trace.json.gz carries per-op device durations even under the
axon tunnel — this script runs one traced train step and prints the
device-op ranking.

Usage: python scripts_dev/profile_ops.py [batch] [model]
(model in {thermal_only, rgb_only, multimodal}; default thermal_only)
"""
from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
MODEL = sys.argv[2] if len(sys.argv) > 2 else "thermal_only"


def main():
    cfg = config.TrainConfig(batch_size=B, compute_dtype="bfloat16")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer(MODEL, cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    rng0 = np.random.default_rng(0)
    batch = {m: rng0.integers(0, 255, (B, 224, 224, 3), np.uint8)
             for m in trainer.spec.inputs}
    batch["label"] = rng0.integers(0, 2, B).astype(np.int32)
    batch["valid"] = np.ones(B, np.float32)
    batch = jax.device_put(batch, trainer.batch_sharding)
    step = trainer.train_step
    rng = jax.random.PRNGKey(1)

    state, m = step(state, batch, rng)           # compile + warm
    np.asarray(m["loss"])

    tracedir = "/tmp/trainstep_trace"
    with jax.profiler.trace(tracedir):
        state, m = step(state, batch, rng)
        np.asarray(m["loss"])

    files = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))
    d = json.load(gzip.open(files[-1]))
    evs = d["traceEvents"]
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name"))}
    # Trace events nest (program -> while -> scan body -> fusion); summing
    # everything double-counts envelopes.  Keep only LEAF events: within a
    # thread, an event with no other event starting inside its interval.
    by_tid = defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_tid[e.get("tid")].append(e)
    total = 0.0
    by_name = defaultdict(lambda: [0.0, 0])
    for tid, lst in by_tid.items():
        lst.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        for i, e in enumerate(lst):
            end = e["ts"] + e.get("dur", 0.0)
            is_leaf = not (i + 1 < len(lst) and lst[i + 1]["ts"] < end)
            if not is_leaf:
                continue
            dur = e.get("dur", 0.0) / 1e3      # us -> ms
            total += dur
            base = re.sub(r"[.\d]+$", "", e["name"]) or e["name"]
            rec = by_name[base]
            rec[0] += dur
            rec[1] += 1
    print(f"b={B}  device leaf-op total: {total:.2f} ms  "
          f"({len(by_name)} distinct op groups)")
    for name, (ms, cnt) in sorted(by_name.items(),
                                  key=lambda kv: -kv[1][0])[:40]:
        print(f"  {ms:8.3f} ms  x{cnt:<5d} {name}")


if __name__ == "__main__":
    main()
