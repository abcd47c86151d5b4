"""Dev microbenchmark: standalone fused block kernels vs rooflines."""

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.ops.vit_block import attn_block, mlp_block


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


def timeit(fn, args, chain=20, iters=5, label=""):
    u16 = jnp.uint16

    def chained(x, *rest):
        def body(carry_x, _):
            out = fn(carry_x, *rest)
            s = jnp.sum(out.astype(jnp.float32))
            bump = (s > 0).astype(u16)
            xu = jax.lax.bitcast_convert_type(carry_x, u16) ^ bump
            return jax.lax.bitcast_convert_type(xu, carry_x.dtype), s
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs

    run = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(run(*args))
    compile_s = time.perf_counter() - t0
    rtt = rtt_ms()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = max((ts[len(ts) // 2] * 1e3 - rtt) / chain, 1e-6)
    print(f"  {label}: {ms:.3f} ms  (compile {compile_s:.1f}s)")
    return ms


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    print("backend:", jax.default_backend())
    b, n, c, heads = 128, 197, 768, 12
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (b, n, c), jnp.float32) * 0.1).astype(dt)
    f = lambda i, shape: jax.random.normal(  # noqa: E731
        jax.random.fold_in(key, i), shape, jnp.float32) * 0.02
    g1, b1 = f(1, (c,)) + 1, f(2, (c,))
    wqkv, bqkv = f(3, (c, 3 * c)).astype(dt), f(4, (3 * c,))
    wproj, bproj = f(5, (c, c)).astype(dt), f(6, (c,))
    w1, bb1 = f(7, (c, 4 * c)).astype(dt), f(8, (4 * c,))
    w2, bb2 = f(9, (4 * c, c)).astype(dt), f(10, (c,))

    # rooflines (v5e ~394 bf16 TFLOPs):
    attn_flops = 2 * b * n * c * (3 * c + c) + 4 * b * n * n * c
    mlp_flops = 4 * b * n * c * 4 * c
    print(f"attn_block roofline: {attn_flops / 394e12 * 1e3:.3f} ms")
    print(f"mlp_block roofline:  {mlp_flops / 394e12 * 1e3:.3f} ms")

    timeit(lambda x_, *r: attn_block(x_, *r, num_heads=heads),
           (x, g1, b1, wqkv, bqkv, wproj, bproj), label="attn_block b128")
    timeit(lambda x_, *r: mlp_block(x_, *r),
           (x, g1, b1, w1, bb1, w2, bb2), label="mlp_block  b128")
    timeit(lambda x_, *r: mlp_block(x_, *r, hidden_chunks=1),
           (x, g1, b1, w1, bb1, w2, bb2), label="mlp_block  b128 chunks=1")
    timeit(lambda x_, *r: mlp_block(x_, *r, hidden_chunks=2),
           (x, g1, b1, w1, bb1, w2, bb2), label="mlp_block  b128 chunks=2")
