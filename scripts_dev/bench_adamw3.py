"""Pallas AdamW v2: single-pass streaming kernel over native-sized leaves.

bench_adamw2.py showed XLA's fused update loop sits at ~60% of HBM
bandwidth (mu16 4.23 ms vs 2.51 ms roofline) and that a naive per-leaf
Pallas kernel with per-step pad/reshape copies is 2.4x WORSE.  This
variant fixes the two flaws:

  - leaves whose size divides 1024 are VIEWED as (n/1024, 1024) — a
    free row-major reshape, no pad, no concat; the few ragged leaves
    (pos-embed, cls token, head) fall back to the fused-XLA update,
    they carry <0.3% of the bytes;
  - one grid step per 256-row block (256x1024 fp32 = 1 MB/buffer; p,g,v
    fp32 + m bf16 in, p,v fp32 + m bf16 out = 6.5 MB live, double-buffers
    inside the 16 MB VMEM budget), p/m/v aliased in-place.

MEASURED (v5e, quiet host, 2026-08-17): NEGATIVE RESULT —
  pallas2 mu16   6.59 ms   (bit-exact vs optax at step 1, 99.8% coverage)
  optax  mu16    3.46 ms
Even with free reshapes, 256x1024 blocks and full in-place aliasing, the
per-leaf pallas_call stream loses to XLA's fused update loop: 20 separate
kernel launches with cold DMA pipelines vs one XLA loop nest that keeps
the HBM pipeline saturated across leaves.  (The earlier 4.23 ms optax
reading in bench_adamw2.py was taken while the CPU test suite hogged the
single host core — host-side dispatch jitter, not device time.)  The
production update stays optax.adamw(mu_dtype=bf16).

Usage: python scripts_dev/bench_adamw3.py
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
import optax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer

LR, WD, B1, B2, EPS = 1e-4, 1e-4, 0.9, 0.999, 1e-8
CH = 8
COLS = 1024
ROWS = 256


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


def time_fn(name, run, args, base, chain=CH, iters=5):
    np.asarray(jax.tree.leaves(run(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(*args))[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = (ts[len(ts) // 2] * 1e3 - base) / chain
    print(f"{name:14s} {ms:8.2f} ms")
    return ms


def _adamw_kernel(c_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref):
    g = g_ref[...]
    m = B1 * m_ref[...].astype(jnp.float32) + (1.0 - B1) * g
    v = B2 * v_ref[...] + (1.0 - B2) * (g * g)
    upd = (m * c_ref[0]) / (jnp.sqrt(v * c_ref[1]) + EPS)
    p = p_ref[...]
    po_ref[...] = p - LR * (upd + WD * p)
    mo_ref[...] = m.astype(mo_ref.dtype)
    vo_ref[...] = v


def pallas_leaf_update(p, m, v, g, c):
    """p,v,g fp32 leaves with size % COLS == 0, m bf16.  c: (2,) fp32 =
    (1/c1, 1/c2) bias-correction reciprocals.  Update math matches
    optax.adamw exactly (m-hat / (sqrt(v-hat) + eps); verified bit-exact
    in main())."""
    n = p.size
    rows_total = n // COLS
    shape2 = (rows_total, COLS)
    blk = min(ROWS, rows_total)
    grid = (pl.cdiv(rows_total, blk),)

    def spec(dtype=jnp.float32):
        return pl.BlockSpec((blk, COLS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    po, mo, vo = pl.pallas_call(
        _adamw_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec(), spec(m.dtype), spec(), spec()],
        out_specs=(spec(), spec(m.dtype), spec()),
        out_shape=(jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct(shape2, m.dtype),
                   jax.ShapeDtypeStruct(shape2, jnp.float32)),
        input_output_aliases={1: 0, 2: 1, 3: 2},
    )(c, p.reshape(shape2), m.reshape(shape2), v.reshape(shape2),
      g.reshape(shape2))
    return po.reshape(p.shape), mo.reshape(p.shape), vo.reshape(p.shape)


def xla_leaf_update(p, m, v, g, c):
    mf = B1 * m.astype(jnp.float32) + (1.0 - B1) * g
    vf = B2 * v + (1.0 - B2) * (g * g)
    upd = (mf * c[0]) / (jnp.sqrt(vf * c[1]) + EPS)
    return p - LR * (upd + WD * p), mf.astype(m.dtype), vf


def fused_update(params, m, v, grads, count):
    c1 = 1.0 - B1 ** count
    c2 = 1.0 - B2 ** count
    c = jnp.stack([1.0 / c1, 1.0 / c2]).astype(jnp.float32)

    def leaf(p, mi, vi, g):
        if p.size % COLS == 0 and p.size >= COLS * 8:
            return pallas_leaf_update(p, mi, vi, g, c)
        return xla_leaf_update(p, mi, vi, g, c)

    out = jax.tree.map(leaf, params, m, v, grads)
    istup = lambda t: isinstance(t, tuple)
    p = jax.tree.map(lambda t: t[0], out, is_leaf=istup)
    m = jax.tree.map(lambda t: t[1], out, is_leaf=istup)
    v = jax.tree.map(lambda t: t[2], out, is_leaf=istup)
    return p, m, v


def main():
    cfg = config.TrainConfig(batch_size=32, compute_dtype="bfloat16")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer("thermal_only", cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    params = state.params
    nparams = sum(x.size for x in jax.tree.leaves(params))
    covered = sum(x.size for x in jax.tree.leaves(params)
                  if x.size % COLS == 0 and x.size >= COLS * 8)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={base:.1f}ms "
          f"params={nparams/1e6:.1f}M pallas-covered={covered/nparams:.1%}")

    # correctness vs optax (one step, fp32 mu for exact comparison)
    tx = optax.adamw(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD)
    ost = tx.init(params)
    u, _ = tx.update(grads, ost, params)
    p_ref = optax.apply_updates(params, u)
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)
    p_new, _, _ = jax.jit(fused_update)(params, m0, v0, grads, 1.0)
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_new)))
    print(f"max |p - optax_p| after step 1: {err:.3e}")

    m0 = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
    v0 = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def chain(params, m, v, grads):
        def body(carry, i):
            p, m, v = carry
            return fused_update(p, m, v, grads, i + 1.0), None
        (p, m, v), _ = jax.lax.scan(body, (params, m, v),
                                    jnp.arange(CH, dtype=jnp.float32))
        return p
    time_fn("pallas2 mu16", lambda *a: chain(*a), (params, m0, v0, grads),
            base)

    tx = optax.adamw(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD,
                     mu_dtype=jnp.bfloat16)
    ost = tx.init(params)

    @jax.jit
    def opt_chain(params, ost, grads):
        def body(carry, _):
            p, s = carry
            u, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, u), s), None
        (p, s), _ = jax.lax.scan(body, (params, ost), jnp.arange(CH))
        return p
    time_fn("optax mu16", lambda *a: opt_chain(*a), (params, ost, grads),
            base)


if __name__ == "__main__":
    main()
