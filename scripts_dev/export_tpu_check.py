"""On-chip validation of jax.export serving bundles (serve/export.py).

Answers the two questions CPU tests cannot: (1) do Mosaic TPU kernel
custom-calls (`tpu_custom_call`) serialize into an export and replay on
the chip with row-for-row parity (the `_CUSTOM_CALL_ALLOWLIST` claim),
for both the bf16 Pallas path and the full int8 path; and (2) how much
startup time does replaying a frozen bundle save over rebuilding the
model and re-tracing (the point of the feature).

Run under the axon TPU tunnel: `python scripts_dev/export_tpu_check.py`.
Timings fetch results with np.asarray (block_until_ready does not block
through the tunnel, docs/DESIGN.md).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

BUCKET = 8
SIZE = 224


def rand_batch(inputs, n, seed=0):
    rng = np.random.default_rng(seed)
    batch = {m: rng.integers(0, 255, (n, SIZE, SIZE, 3)).astype(np.uint8)
             for m in inputs}
    batch["label"] = np.zeros(n, np.int32)
    batch["valid"] = np.ones(n, np.float32)
    return batch


def fetch(tree):
    return jax.tree.map(np.asarray, tree)


def check(tag, trainer, state, out_dir, tol=1e-5):
    from dfu_multimodal_tpu.serve.export import export_bundle, load_bundle

    batch = rand_batch(trainer.spec.inputs, BUCKET, seed=1)

    t0 = time.perf_counter()
    live = fetch(trainer.eval_step(trainer.variables(state), batch))
    t_live_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    export_bundle(trainer, state, out_dir, image_size=SIZE,
                  buckets=(BUCKET,))
    t_export = time.perf_counter() - t0

    t0 = time.perf_counter()
    servable = load_bundle(out_dir)
    frozen = fetch(servable.eval_step(servable.variables(), batch))
    t_frozen_first = time.perf_counter() - t0

    dp = float(np.max(np.abs(live["probs"].astype(np.float64)
                             - frozen["probs"].astype(np.float64))))
    same = bool(np.array_equal(live["preds"], frozen["preds"]))
    size_mb = sum(p.stat().st_size for p in out_dir.iterdir()) / 1e6
    print(f"[{tag}] max|dprob|={dp:.3e} preds_equal={same} "
          f"bundle={size_mb:.1f}MB export={t_export:.1f}s "
          f"live_first_call={t_live_first:.1f}s "
          f"frozen_load+first_call={t_frozen_first:.1f}s")
    assert same and dp < tol, f"{tag}: parity FAILED (dp={dp}, same={same})"
    return dp


def main():
    from dfu_multimodal_tpu import config as cfg_mod
    from dfu_multimodal_tpu.serve.engine import quantize_for_serving
    from dfu_multimodal_tpu.train.engine import Trainer

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({len(jax.devices())} devices)")
    assert platform == "tpu", "this check must run on the TPU"

    cfg = cfg_mod.TrainConfig(batch_size=BUCKET, eval_batch_size=BUCKET,
                              compute_dtype="bfloat16",
                              mesh=cfg_mod.MeshConfig(data=1, model=1))
    mods = {"rgb": cfg_mod.rgb_modality(),
            "thermal": cfg_mod.thermal_modality()}

    t0 = time.perf_counter()
    trainer = Trainer("multimodal", cfg, mods, attention_impl="pallas")
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    print(f"build+init: {time.perf_counter() - t0:.1f}s")

    out = Path("/tmp/export_tpu")
    check("bf16+pallas", trainer, state, out / "mm_bf16")

    t0 = time.perf_counter()
    calib = np.random.default_rng(42).integers(
        0, 255, (8, SIZE, SIZE, 3)).astype(np.uint8)
    q_trainer, q_state = quantize_for_serving(
        trainer, state, image_size=SIZE, calib_u8=calib,
        attention_impl="pallas")
    print(f"quantize_for_serving: {time.perf_counter() - t0:.1f}s")
    # int8: preds must be identical; probs tolerate ±1-LSB requantize
    # rounding differences between the two independently-compiled programs
    # (measured max 4.6e-3 on-chip, 2026-08-18).
    check("int8", q_trainer, q_state, out / "mm_int8", tol=1e-2)
    print("EXPORT_TPU_OK")


if __name__ == "__main__":
    main()
