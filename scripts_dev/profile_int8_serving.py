"""Op-level device attribution of the int8 serving forward (bench --int8).

Closes round-3 VERDICT weak #4's attribution half: bench reports the int8
path's utilization against the chip's int8 peak
(utils/flops.py::device_peak_int8_tops), and THIS script says where the
rest of the batch time goes — int8 block kernels vs bf16 attention work
vs the int8 ResNet convs vs everything XLA schedules between them.  Same
leaf-event methodology as profile_ops.py (nested trace events are
envelopes; only leaves are summed).

Usage: python scripts_dev/profile_int8_serving.py [batch]
(claims the TPU grant — never run concurrently with another TPU python)
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from bench import build_forward

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def main():
    forward, variables, rgb, th, platform = build_forward(B, int8=True)
    np.asarray(forward(variables, rgb, th))      # compile + warm

    tracedir = "/tmp/int8_serving_trace"
    with jax.profiler.trace(tracedir):
        np.asarray(forward(variables, rgb, th))

    files = sorted(glob.glob(
        f"{tracedir}/plugins/profile/*/*.trace.json.gz"))
    d = json.load(gzip.open(files[-1]))
    evs = d["traceEvents"]
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name"))}
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
    print(f"int8 serving b={B} ({platform})  device leaf-op total: "
          f"{total:.2f} ms  ({len(by_name)} distinct op groups)")
    for name, (ms, cnt) in sorted(by_name.items(),
                                  key=lambda kv: -kv[1][0])[:40]:
        print(f"  {ms:8.3f} ms  x{cnt:<5d} {name}")


if __name__ == "__main__":
    main()
