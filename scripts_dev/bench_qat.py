"""QAT train-step cost: thermal_only b32 with/without cfg.qat on the live
backend (bench.py chained-scan method, RTT subtracted).

The fake-quant transform adds one absmax-reduce + round/clip per encoder
Dense kernel per microstep (fwd; the STE backward is free — identity).
Expected to be small vs the 85.8M-param fwd+bwd; this records the real
number for DESIGN.md.

    python scripts_dev/bench_qat.py [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
CHAIN, ITERS = 8, 5


def rtt_ms():
    @jax.jit
    def trivial(x):
        return x + 1
    x = jnp.zeros((2, 2))
    np.asarray(trivial(x))
    ts = sorted(_t(lambda: np.asarray(trivial(x))) for _ in range(7))
    return ts[len(ts) // 2]


def _t(f):
    t0 = time.perf_counter()
    f()
    return (time.perf_counter() - t0) * 1e3


def measure(qat: bool, rtt: float) -> float:
    platform = jax.devices()[0].platform
    cfg = config.TrainConfig(
        batch_size=B, qat=qat,
        compute_dtype="bfloat16" if platform == "tpu" else "float32")
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality(blur=False)},
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    step = trainer.build_train_step(jit=False)
    rng = np.random.default_rng(0)
    batch = {"thermal": rng.integers(0, 255, (B, 224, 224, 3), np.uint8),
             "label": rng.integers(0, 2, B).astype(np.int32),
             "valid": np.ones(B, np.float32)}
    batch = jax.device_put(batch, trainer.batch_sharding)

    @jax.jit
    def many(state, batch, rng):
        def body(s, i):
            s, m = step(s, batch, jax.random.fold_in(rng, i))
            return s, m["loss"]
        _, losses = jax.lax.scan(body, state,
                                 jnp.arange(CHAIN, dtype=jnp.int32))
        return losses

    key = jax.random.PRNGKey(1)
    np.asarray(many(state, batch, key))
    times = sorted(_t(lambda: np.asarray(many(state, batch, key)))
                   for _ in range(ITERS))
    per = max((times[len(times) // 2] - rtt) / CHAIN, 1e-6)
    print(f"qat={qat}: {per:.2f} ms/step  {B / per * 1e3:.0f} img/s/chip")
    return per


def main():
    rtt = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={rtt:.1f}ms b={B}")
    base = measure(False, rtt)
    q = measure(True, rtt)
    print(f"QAT overhead: {q - base:+.2f} ms ({(q / base - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
