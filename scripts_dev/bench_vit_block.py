"""Dev microbenchmark: ViT-B/16 forward (b128) — flax vs fused block kernels.

Run on the TPU chip:  python scripts_dev/bench_vit_block.py [--train]
"""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.models.vit import ViTClassifier


def rtt_ms():
    @jax.jit
    def trivial(x):
        return x + 1
    x = jnp.zeros((2, 2))
    np.asarray(trivial(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(trivial(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def bench(block_impl, attention_impl, batch=128, chain=10, iters=5,
          train=False):
    dtype = jnp.bfloat16
    model = ViTClassifier(dtype=dtype, attention_impl=attention_impl,
                          block_impl=block_impl)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                          jnp.float32).astype(dtype)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    if train:
        def one(v, x):
            def loss(p):
                out = model.apply({"params": p}, x, train=False)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            g = jax.grad(loss)(v["params"])
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(g))
    else:
        def one(v, x):
            return jnp.sum(model.apply(v, x, train=False)
                           .astype(jnp.float32))

    # Serialize iterations with a data-dependent single-bit perturbation of
    # the INPUT (defeats loop-invariant hoisting — without this, XLA
    # computes the forward once and the timing is chain-times too good).
    u16 = jnp.uint16
    def chained(v, x):
        def body(carry_x, _):
            s = one(v, carry_x)
            bump = (s > 0).astype(u16)
            xu = jax.lax.bitcast_convert_type(carry_x, u16) ^ bump
            return jax.lax.bitcast_convert_type(xu, x.dtype), s
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs

    run = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(run(v, x))
    print(f"  compile: {time.perf_counter() - t0:.1f}s")
    rtt = rtt_ms()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(v, x))
        times.append(time.perf_counter() - t0)
    times.sort()
    ms = max((times[len(times) // 2] * 1e3 - rtt) / chain, 1e-6)
    print(f"  {block_impl}/{attention_impl} b{batch} "
          f"{'train' if train else 'fwd'}: {ms:.2f} ms/iter  "
          f"({batch / ms * 1e3:.0f} img/s)")
    return ms


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    print("backend:", jax.default_backend())
    bench("flax", "pallas", batch=args.batch, train=args.train)
    bench("fused", "xla", batch=args.batch, train=args.train)
