"""Throughput ceiling probe for token merging (ops/token_merge.py).

Times the 12-block fused ViT-B/16 encoder chain at b128 in three
configurations before committing to the full integration:

  base   : 12 blocks at N=197
  tome KL: L blocks at N=197, bipartite_merge to N=K, (12-L) blocks at K

Random weights (throughput is weight-independent), bench.py chained-scan
methodology (fetch + RTT subtraction). Run on TPU:

    python scripts_dev/bench_tome.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dfu_multimodal_tpu.ops.token_merge import bipartite_merge
from dfu_multimodal_tpu.ops.vit_block import attn_block, mlp_block

B, N, C, H = 128, 197, 768, 12
DTYPE = jnp.bfloat16


def block_weights(key):
    ks = jax.random.split(key, 6)
    s = lambda k, *sh: (jax.random.normal(k, sh, jnp.float32) * 0.02)
    return dict(
        g1=jnp.ones((C,)), b1=jnp.zeros((C,)),
        wqkv=s(ks[0], C, 3 * C).astype(DTYPE), bqkv=jnp.zeros((3 * C,)),
        wproj=s(ks[1], C, C).astype(DTYPE), bproj=jnp.zeros((C,)),
        g2=jnp.ones((C,)), b2=jnp.zeros((C,)),
        w1=s(ks[2], C, 4 * C).astype(DTYPE), bm1=jnp.zeros((4 * C,)),
        w2=s(ks[3], 4 * C, C).astype(DTYPE), bm2=jnp.zeros((C,)),
    )


def run_blocks(x, w, n_blocks):
    def body(carry, _):
        y = attn_block(carry, w["g1"], w["b1"], w["wqkv"], w["bqkv"],
                       w["wproj"], w["bproj"], num_heads=H)
        y = mlp_block(y, w["g2"], w["b2"], w["w1"], w["bm1"],
                      w["w2"], w["bm2"])
        return y, None
    y, _ = jax.lax.scan(body, x, None, length=n_blocks)
    return y


def encoder(x, w, merge_at=None, keep=None):
    if merge_at is None:
        return run_blocks(x, w, 12)
    x = run_blocks(x, w, merge_at)
    sizes = jnp.ones(x.shape[:2], jnp.float32)
    x, _ = bipartite_merge(x, sizes, x.shape[1] - keep)
    return run_blocks(x, w, 12 - merge_at)


def encoder_multi(x, w, schedule):
    """schedule: ((L0, K0), (L1, K1), ...) — merge to Ki after block Li."""
    sizes = jnp.ones(x.shape[:2], jnp.float32)
    done = 0
    for at, keep in schedule:
        x = run_blocks(x, w, at - done)
        done = at
        x, sizes = bipartite_merge(x, sizes, x.shape[1] - keep)
    return run_blocks(x, w, 12 - done)


def rtt_ms():
    f = jax.jit(lambda v: v + 1)
    z = jnp.zeros((2, 2))
    np.asarray(f(z))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[3] * 1e3


def timeit(fn, w, x, chain=10, iters=5):
    def chained(w, x):
        def body(carry, _):
            out = fn(carry, w)
            s = jnp.sum(out[:, 0].astype(jnp.float32))
            bump = (s > jnp.inf).astype(x.dtype)      # always 0, data-dep
            return x + bump, s
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs
    run = jax.jit(chained)
    np.asarray(run(w, x))
    rtt = rtt_ms()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(w, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return (ts[len(ts) // 2] * 1e3 - rtt) / chain


def main():
    key = jax.random.PRNGKey(0)
    w = block_weights(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, C), DTYPE)

    base = timeit(lambda v, ww: encoder(v, ww), w, x)
    print(f"base 12x197:           {base:7.2f} ms  "
          f"({B / base * 1e3:7.0f} img/s)")
    for merge_at, keep in ((4, 128), (4, 99), (6, 128), (2, 128)):
        t = timeit(lambda v, ww, m=merge_at, k=keep:
                   encoder(v, ww, merge_at=m, keep=k), w, x)
        print(f"tome L={merge_at} K={keep}:{'':8s}{t:7.2f} ms  "
              f"({B / t * 1e3:7.0f} img/s)  "
              f"speedup {base / t:4.2f}x")
    for sched in (((2, 128), (6, 64)), ((2, 128), (7, 96)),
                  ((2, 160), (5, 128), (8, 96))):
        t = timeit(lambda v, ww, s=sched: encoder_multi(v, ww, s), w, x)
        print(f"tome multi {sched}: {t:7.2f} ms  "
              f"({B / t * 1e3:7.0f} img/s)  speedup {base / t:4.2f}x")


if __name__ == "__main__":
    main()
