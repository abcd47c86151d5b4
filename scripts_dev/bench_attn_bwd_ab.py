"""A/B: attn_block backward v1 (default: chain-rule XLA matmuls around
the qkv_attention_fwdbwd kernel) vs v2 (fully-fused one-kernel backward,
`_attn_block_bwd_fused`).

Times jax.grad of a 12-deep scanned attn_block chain at the production
shape (b128 or b32, 197 tok, C=768, bf16), chained-scan + RTT-subtracted.

Measured (v5e, 2026-08-17): v2 SLOWER at both batches —
  b32 : v1 12.91 ms vs v2 15.93 ms (12-block grad chain)
  b128: v1 54.07 ms vs v2 65.88 ms
Analysis in docs/DESIGN.md (fused-backward negative result).

Round-2b (compute-dtype matmul operands in the bwd kernels):
  b32 v1: 12.91 -> 12.30 (bf16 gradient-matmul operands)
             -> 11.44 ms (bf16-operand score matmul, scale-after)

Usage: python scripts_dev/bench_attn_bwd_ab.py [batch]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from dfu_multimodal_tpu.ops import vit_block

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N, C, HEADS, DEPTH = 197, 768, 12, 12
DT = jnp.bfloat16


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def attn_block_v2(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads):
    return vit_block._attn_block_call(
        x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads, False)


def _v2_fwd(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads):
    out = vit_block._attn_block_call(
        x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads, False)
    return out, (x, g1, b1, wqkv, bqkv, wproj, bproj)


attn_block_v2.defvjp(
    _v2_fwd,
    lambda nh, res, g: vit_block._attn_block_bwd_fused(nh, False, res, g))


def make_params(key):
    ks = jax.random.split(key, 2)
    s = 0.02
    return {
        "g1": jnp.ones((DEPTH, C), jnp.float32),
        "b1": jnp.zeros((DEPTH, C), jnp.float32),
        "wqkv": jax.random.normal(ks[0], (DEPTH, C, 3 * C), DT) * s,
        "bqkv": jnp.zeros((DEPTH, 3 * C), jnp.float32),
        "wproj": jax.random.normal(ks[1], (DEPTH, C, C), DT) * s,
        "bproj": jnp.zeros((DEPTH, C), jnp.float32),
    }


def rtt_ms(repeats=7):
    @jax.jit
    def trivial(x):
        return x + 1
    xx = jnp.zeros((2, 2))
    np.asarray(trivial(xx))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(trivial(xx))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def loss_with(block_fn, p, x):
    def body(x, blk):
        return block_fn(x, blk["g1"], blk["b1"], blk["wqkv"], blk["bqkv"],
                        blk["wproj"], blk["bproj"], HEADS), None
    out, _ = jax.lax.scan(body, x, p)
    return jnp.sum(out.astype(jnp.float32))


def time_grad(name, block_fn, p, x, base, chain_len=4, iters=5):
    gfn = jax.grad(functools.partial(loss_with, block_fn), argnums=(0, 1))

    @jax.jit
    def run(p, x):
        def body(x, _):
            gp, gx = gfn(p, x)
            return x + 0.0 * gx.astype(x.dtype), gp["g1"][0, 0]
        _, ss = jax.lax.scan(body, x, jnp.arange(chain_len))
        return ss
    np.asarray(run(p, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(p, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = (ts[len(ts) // 2] * 1e3 - base) / chain_len
    print(f"{name:20s} {ms:8.2f} ms  ({ms / DEPTH:.3f} ms/block)")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    p = make_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 9), (B, N, C), DT)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={base:.1f}ms "
          f"b={B} depth={DEPTH}")
    time_grad("grad v1 (default)", lambda *a: vit_block.attn_block(
        *a[:7], num_heads=a[7]), p, x, base)
    time_grad("grad v2 (fused)", attn_block_v2, p, x, base)


if __name__ == "__main__":
    main()
