"""A/B the AdamW update variants at production shapes (thermal, 85.8 M).

Baseline (bench_adamw.py): optax.adamw tree 4.78 ms vs 2.93 ms HBM
roofline (28 fp32 B/param).  Variants here:

  optax      - optax.adamw, fp32 m/v (baseline re-measure)
  mu16       - optax.adamw(mu_dtype=bf16): 24 B/param roofline 2.51
  hand       - hand-fused single tree.map update, fp32 m/v
  hand16     - hand-fused, bf16 m (v stays fp32: squares need the range)
  pallas     - single-pass Pallas kernel per leaf, fp32 m/v

Usage: python scripts_dev/bench_adamw2.py
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


# ---- hand-fused adamw: one tree.map, everything in one elementwise pass
def hand_update(params, m, v, grads, step, mu_dtype):
    c1 = 1.0 - B1 ** step
    c2 = 1.0 - B2 ** step

    def leaf(p, mi, vi, g):
        mf = mi.astype(jnp.float32)
        m_new = B1 * mf + (1 - B1) * g
        v_new = B2 * vi + (1 - B2) * (g * g)
        upd = (m_new / c1) / (jnp.sqrt(v_new / c2) + EPS)
        p_new = p - LR * (upd + WD * p)
        return p_new, m_new.astype(mu_dtype), v_new

    out = jax.tree.map(leaf, params, m, v, grads)
    p = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    m = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    v = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
    return p, m, v


# ---- pallas single-pass kernel over a flattened leaf
def _adamw_kernel(p_ref, m_ref, v_ref, g_ref, c1_ref, c2_ref,
                  po_ref, mo_ref, vo_ref):
    p = p_ref[...]
    g = g_ref[...]
    m = B1 * m_ref[...] + (1 - B1) * g
    v = B2 * v_ref[...] + (1 - B2) * (g * g)
    upd = (m / c1_ref[0]) / (jnp.sqrt(v / c2_ref[0]) + EPS)
    po_ref[...] = p - LR * (upd + WD * p)
    mo_ref[...] = m
    vo_ref[...] = v


def pallas_leaf_update(p, m, v, g, c1, c2):
    n = p.size
    cols = 1024
    rows = -(-n // cols)
    pad = rows * cols - n

    def flat(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(rows, cols)

    blk = min(rows, 128)   # (128,1024) fp32 × 7 bufs × 2 (dbl-buffer) = 7 MB
    grid = (-(-rows // blk),)
    spec = pl.BlockSpec((blk, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, cols), jnp.float32)
    po, mo, vo = pl.pallas_call(
        _adamw_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec, sspec, sspec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
    )(flat(p), flat(m), flat(v), flat(g), c1, c2)

    def unflat(x):
        return x.reshape(-1)[:n].reshape(p.shape)

    return unflat(po), unflat(mo), unflat(vo)


def main():
    cfg = config.TrainConfig(batch_size=32, compute_dtype="bfloat16")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer("thermal_only", cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    params = state.params
    nparams = sum(x.size for x in jax.tree.leaves(params))
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={base:.1f}ms "
          f"params={nparams/1e6:.1f}M")

    for name, mu_dtype in (("optax", None), ("mu16", jnp.bfloat16)):
        tx = optax.adamw(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD,
                         mu_dtype=mu_dtype)
        opt_state = tx.init(params)

        @jax.jit
        def upd_chain(params, opt_state, grads, tx=tx):
            def body(carry, _):
                p, s = carry
                u, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, u), s), None
            (p, s), _ = jax.lax.scan(body, (params, opt_state),
                                     jnp.arange(CH))
            return p
        time_fn(name, lambda *a: upd_chain(*a), (params, opt_state, grads),
                base)

    for name, mu_dtype in (("hand", jnp.float32), ("hand16", jnp.bfloat16)):
        m0 = jax.tree.map(lambda p: jnp.zeros_like(p, mu_dtype), params)
        v0 = jax.tree.map(jnp.zeros_like, params)

        @jax.jit
        def hand_chain(params, m, v, grads, mu_dtype=mu_dtype):
            def body(carry, i):
                p, m, v = carry
                return hand_update(p, m, v, grads, i + 1.0, mu_dtype), None
            (p, m, v), _ = jax.lax.scan(body, (params, m, v),
                                        jnp.arange(CH, dtype=jnp.float32))
            return p
        time_fn(name, lambda *a: hand_chain(*a), (params, m0, v0, grads),
                base)

    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def pallas_chain(params, m, v, grads):
        def body(carry, i):
            p, m, v = carry
            c1 = (1.0 - B1 ** (i + 1.0))[None]
            c2 = (1.0 - B2 ** (i + 1.0))[None]
            out = jax.tree.map(
                lambda pp, mm, vv, gg: pallas_leaf_update(pp, mm, vv, gg,
                                                          c1, c2),
                p, m, v, grads)
            istup = lambda t: isinstance(t, tuple)
            p = jax.tree.map(lambda t: t[0], out, is_leaf=istup)
            m = jax.tree.map(lambda t: t[1], out, is_leaf=istup)
            v = jax.tree.map(lambda t: t[2], out, is_leaf=istup)
            return (p, m, v), None
        (p, m, v), _ = jax.lax.scan(body, (params, m, v),
                                    jnp.arange(CH, dtype=jnp.float32))
        return p
    time_fn("pallas", lambda *a: pallas_chain(*a), (params, m0, v0, grads),
            base)


if __name__ == "__main__":
    main()
