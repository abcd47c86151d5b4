"""Standalone cost of the optimizer update at production shapes.

The thermal b32 train step spends ~4.6 ms in the update
(profile_trainstep.py full vs no_opt).  This times optax.adamw's
update+apply alone on the real thermal param tree to separate HBM
roofline from fusion/launch overhead, and A/Bs a flat-buffer variant.

Usage: python scripts_dev/bench_adamw.py
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
import optax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer


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


def time_fn(name, run, args, base, chain=8, iters=5):
    np.asarray(jax.tree.leaves(run(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(run(*args))[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = (ts[len(ts) // 2] * 1e3 - base) / chain
    print(f"{name:22s} {ms:8.2f} ms")
    return ms


def main():
    cfg = config.TrainConfig(batch_size=32, compute_dtype="bfloat16")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer("thermal_only", cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    params = state.params
    nparams = sum(x.size for x in jax.tree.leaves(params))
    nleaves = len(jax.tree.leaves(params))
    print(f"params: {nparams / 1e6:.1f} M in {nleaves} leaves")

    tx = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, params)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={base:.1f}ms")

    CH = 8

    @jax.jit
    def upd_chain(params, opt_state, grads):
        def body(carry, _):
            p, s = carry
            u, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, u)
            return (p, s), None
        (p, s), _ = jax.lax.scan(body, (params, opt_state),
                                 jnp.arange(CH))
        return p

    time_fn("optax.adamw tree", lambda *a: upd_chain(*a),
            (params, opt_state, grads), base, chain=CH)

    # flat-buffer variant: one fused elementwise pass over a single array
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    fs = tx.init(flat)

    @jax.jit
    def upd_flat_chain(flat, fs, gflat):
        def body(carry, _):
            p, s = carry
            u, s = tx.update(gflat, s, p)
            return (p + u, s), None
        (p, s), _ = jax.lax.scan(body, (flat, fs), jnp.arange(CH))
        return p

    time_fn("optax.adamw flat", lambda *a: upd_flat_chain(*a),
            (flat, fs, gflat), base, chain=CH)

    # HBM roofline reference: p,m,v,g fp32 read + p,m,v write
    bytes_step = nparams * 4 * (4 + 3)
    print(f"roofline @819GB/s: {bytes_step / 819e9 * 1e3:.2f} ms "
          f"({bytes_step / 1e9:.2f} GB/step)")


if __name__ == "__main__":
    main()
