"""Round-2: decompose the thermal train step at b32 (full step 53.2 ms).

Variants (chained-scan, RTT-subtracted):
  full       - the production train step (aug + fwd + bwd + AdamW)
  no_opt     - aug + fwd + bwd only
  no_aug     - eval-normalize instead of augment, fwd + bwd + AdamW
  fwd_only   - aug + fwd only

Usage: python scripts_dev/profile_trainstep.py [variants...]
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

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.train.engine import Trainer

ARGS = sys.argv[1:]
B = next((int(a) for a in ARGS if a.isdigit()), 32)
MODEL = "thermal_only"


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


def main():
    cfg = config.TrainConfig(batch_size=B, compute_dtype="bfloat16")
    modalities = {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer(MODEL, cfg, modalities,
                      class_weights=np.array([1.0, 1.0], np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=224)
    base = rtt_ms()
    print(f"platform={jax.devices()[0].platform} rtt={base:.1f}ms b={B}")

    rng0 = np.random.default_rng(0)
    batch = {m: rng0.integers(0, 255, (B, 224, 224, 3), np.uint8)
             for m in trainer.spec.inputs}
    batch["label"] = rng0.integers(0, 2, B).astype(np.int32)
    batch["valid"] = np.ones(B, np.float32)
    batch = jax.device_put(batch, trainer.batch_sharding)

    step = trainer.build_train_step(jit=False)

    def full(state, batch, rng, i):
        s, m = step(state, batch, jax.random.fold_in(rng, i))
        return s, m["loss"]

    def no_opt(state, batch, rng, i):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, i))
        inputs = trainer._preprocess_train(aug_rng, batch)
        labels = batch["label"]
        weights = trainer._sample_weights(labels, batch["valid"])

        def loss_fn(params):
            logits = trainer.module.apply(
                {"params": params}, *inputs, train=True,
                rngs={"dropout": drop_rng})
            from dfu_multimodal_tpu.train.engine import weighted_ce
            return weighted_ce(logits, labels, weights)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gsum = sum(jnp.sum(jnp.abs(t).astype(jnp.float32))
                   for t in jax.tree.leaves(grads))
        return state, loss + 1e-20 * gsum

    def no_aug(state, batch, rng, i):
        drop_rng = jax.random.fold_in(rng, i)
        inputs = trainer._preprocess_eval(batch)
        labels = batch["label"]
        weights = trainer._sample_weights(labels, batch["valid"])

        def loss_fn(params):
            logits = trainer.module.apply(
                {"params": params}, *inputs, train=True,
                rngs={"dropout": drop_rng})
            from dfu_multimodal_tpu.train.engine import weighted_ce
            return weighted_ce(logits, labels, weights)

        import optax
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = trainer.tx.update(grads, state.opt_state,
                                             state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=new_opt), loss

    def fwd_only(state, batch, rng, i):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, i))
        inputs = trainer._preprocess_train(aug_rng, batch)
        labels = batch["label"]
        weights = trainer._sample_weights(labels, batch["valid"])
        logits = trainer.module.apply(
            {"params": state.params}, *inputs, train=True,
            rngs={"dropout": drop_rng})
        from dfu_multimodal_tpu.train.engine import weighted_ce
        return state, weighted_ce(logits, labels, weights)

    variants = {"full": full, "no_opt": no_opt, "no_aug": no_aug,
                "fwd_only": fwd_only}
    chain = 8

    for name in ([a for a in ARGS if not a.isdigit()] or list(variants)):
        fn = variants[name]

        @jax.jit
        def many(state, batch, rng, fn=fn):
            def body(s, i):
                s, l = fn(s, batch, rng, i)
                return s, l
            _, ls = jax.lax.scan(body, state,
                                 jnp.arange(chain, dtype=jnp.int32))
            return ls
        key = jax.random.PRNGKey(1)
        np.asarray(many(state, batch, key))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(many(state, batch, key))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        ms = (ts[len(ts) // 2] * 1e3 - base) / chain
        print(f"{name:10s} {ms:7.2f} ms/step")


if __name__ == "__main__":
    main()
