"""Round-2 profiling: where does the ViT train-step backward time go?

Times (b128, bf16, TPU) via the chained-scan + RTT-subtraction method of
bench.py:
  fwd            - 12 fused blocks, forward only
  grad_full      - current custom-VJP backward (remat jnp oracle)
  grad_attn_only - chain of 12 attn_blocks only, grad
  grad_mlp_only  - chain of 12 mlp_blocks only, grad
  grad_attn_v2   - attn backward = vjp of composition using the Pallas
                   qkv_attention op (fused attn fwd+bwd kernels, XLA matmuls)
  grad_mlp_flax  - plain jnp mlp chain grad (no remat double-compute)

Usage: python scripts_dev/profile_bwd.py            (TPU claimant)
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
from dfu_multimodal_tpu.ops.attention import qkv_attention

import os

B = int(os.environ.get("PROFILE_BWD_B", "128"))
N, C, H, HEADS = 197, 768, 3072, 12
DEPTH = 12
DT = jnp.bfloat16


def rtt_ms(repeats=7):
    @jax.jit
    def trivial(x):
        return x + 1
    x = jnp.zeros((2, 2))
    np.asarray(trivial(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(trivial(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def make_params(key):
    ks = jax.random.split(key, 8)
    s = 0.02
    return {
        "g1": jnp.ones((DEPTH, C), jnp.float32),
        "b1": jnp.zeros((DEPTH, C), jnp.float32),
        "wqkv": jax.random.normal(ks[0], (DEPTH, C, 3 * C), jnp.float32) * s,
        "bqkv": jnp.zeros((DEPTH, 3 * C), jnp.float32),
        "wproj": jax.random.normal(ks[1], (DEPTH, C, C), jnp.float32) * s,
        "bproj": jnp.zeros((DEPTH, C), jnp.float32),
        "g2": jnp.ones((DEPTH, C), jnp.float32),
        "b2": jnp.zeros((DEPTH, C), jnp.float32),
        "w1": jax.random.normal(ks[2], (DEPTH, C, H), jnp.float32) * s,
        "bh": jnp.zeros((DEPTH, H), jnp.float32),
        "w2": jax.random.normal(ks[3], (DEPTH, H, C), jnp.float32) * s,
        "b2b": jnp.zeros((DEPTH, C), jnp.float32),
    }


def attn_ref_v2(x, g1, b1, wqkv, bqkv, wproj, bproj):
    """Remat oracle routing attention through the fused Pallas op."""
    b, n, c = x.shape
    y = vit_block._layernorm_f32(x, g1, b1).astype(x.dtype)
    qkv = (jnp.einsum("bnc,cm->bnm", y, wqkv.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    attn = qkv_attention(qkv, HEADS)
    o = (jnp.einsum("bnc,cm->bnm", attn, wproj.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + bproj.astype(jnp.float32)).astype(x.dtype)
    return x + o


def chain(p, x, step_fn):
    def body(x, blk):
        return step_fn(x, blk), None
    out, _ = jax.lax.scan(body, x, p)
    return out


def attn_step(x, blk):
    return vit_block.attn_block(
        x, blk["g1"], blk["b1"], blk["wqkv"].astype(DT), blk["bqkv"],
        blk["wproj"].astype(DT), blk["bproj"], num_heads=HEADS)


def attn_step_v2(x, blk):
    return attn_ref_v2(x, blk["g1"], blk["b1"], blk["wqkv"], blk["bqkv"],
                       blk["wproj"], blk["bproj"])


def mlp_step(x, blk):
    return vit_block.mlp_block(
        x, blk["g2"], blk["b2"], blk["w1"].astype(DT), blk["bh"],
        blk["w2"].astype(DT), blk["b2b"])


def mlp_step_ref(x, blk):
    return vit_block._mlp_block_ref(
        x, blk["g2"], blk["b2"], blk["w1"].astype(DT), blk["bh"],
        blk["w2"].astype(DT), blk["b2b"])


def full_step(x, blk):
    return mlp_step(attn_step(x, blk), blk)


def time_fn(name, fn, p, x, base_rtt, chain_len=4, iters=4):
    @jax.jit
    def run(p, x):
        def body(x, i):
            out = fn(p, x)
            if isinstance(out, tuple):   # (loss-ish, grads) -> scalar bump
                s = out[0]
            else:
                s = jnp.sum(out.astype(jnp.float32))
            return x * (1.0 + 0.0 * s.astype(x.dtype)), s
        _, ss = jax.lax.scan(body, x, jnp.arange(chain_len))
        return ss
    np.asarray(run(p, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(p, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = (ts[len(ts) // 2] * 1e3 - base_rtt) / chain_len
    print(f"{name:18s} {ms:8.2f} ms   ({ms / DEPTH:6.3f} ms/block)")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    p = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, C), DT)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform}  rtt={base:.1f} ms  "
          f"B={B} depth={DEPTH}")

    def fwd(p, x):
        return chain(p, x, full_step)

    def loss_of(step_fn):
        def loss(p, x):
            out = chain(p, x, step_fn)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        def vg(p, x):
            l, g = jax.value_and_grad(loss)(p, x)
            leaves = jax.tree.leaves(g)
            # consume every grad leaf so nothing is DCE'd
            return l + 1e-20 * sum(
                jnp.sum(jnp.abs(t).astype(jnp.float32)) for t in leaves), g
        return vg

    cases = {
        "fwd": lambda: time_fn("fwd", fwd, p, x, base),
        "grad_full": lambda: time_fn("grad_full", loss_of(full_step), p, x,
                                     base),
        "grad_attn_only": lambda: time_fn("grad_attn_only",
                                          loss_of(attn_step), p, x, base),
        "grad_mlp_only": lambda: time_fn("grad_mlp_only", loss_of(mlp_step),
                                         p, x, base),
        "grad_attn_v2": lambda: time_fn("grad_attn_v2",
                                        loss_of(attn_step_v2), p, x, base),
        "grad_mlp_ref": lambda: time_fn("grad_mlp_ref",
                                        loss_of(mlp_step_ref), p, x, base),
    }
    wanted = sys.argv[1:] or list(cases)
    for name in wanted:
        cases[name]()


if __name__ == "__main__":
    main()
