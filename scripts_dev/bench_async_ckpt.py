"""Measure sync vs async best-model checkpoint save at thermal scale.

The save cost = device→host fetch of model + optimizer state (~0.9 GB for
ViT-B/16 with bf16 mu) over the axon tunnel (30-60 MB/s, docs/DESIGN.md)
plus the msgpack disk write. AsyncCheckpointer moves both off the epoch
loop behind an on-device snapshot; this script reports what the loop pays
in each mode.

Run ON TPU (no env overrides): python scripts_dev/bench_async_ckpt.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod


def main():
    print(f"backend: {jax.devices()[0].platform}")
    cfg = config.TrainConfig(batch_size=16)
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0))
    nbytes = sum(x.dtype.itemsize * x.size
                 for x in jax.tree_util.tree_leaves(
                     (state.params, state.opt_state)))
    print(f"state size: {nbytes / 1e9:.2f} GB (params + opt)")

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        kw = dict(epoch=1, val_f1=0.5, history={"val_f1": [0.5]},
                  model_state=trainer.variables(state),
                  opt_state=state.opt_state)

        t0 = time.perf_counter()
        ckpt_mod.save_checkpoint(td / "sync", **kw)
        sync_s = time.perf_counter() - t0

        saver = ckpt_mod.AsyncCheckpointer()
        saver.save(td / "warm", **kw)       # compile the snapshot program
        saver.wait()

        t0 = time.perf_counter()
        saver.save(td / "async", **kw)
        submit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        saver.wait()
        drain_s = time.perf_counter() - t0

        a = (td / "async" / ckpt_mod.CKPT_NAME).stat().st_size
        s = (td / "sync" / ckpt_mod.CKPT_NAME).stat().st_size
        assert a == s, (a, s)

    print(f"sync save (epoch loop blocks):    {sync_s:8.2f} s")
    print(f"async submit (epoch loop blocks): {submit_s:8.3f} s")
    print(f"async drain (overlapped):         {drain_s:8.2f} s")
    print(f"epoch-loop cost removed per save: {sync_s - submit_s:.2f} s "
          f"({100 * (1 - submit_s / max(sync_s, 1e-9)):.1f}%)")


if __name__ == "__main__":
    main()
