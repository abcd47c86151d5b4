"""SSL-pretraining rehearsal: does `dfu pretrain` actually buy anything?

Runs on whatever backend is live (the real TPU under axon; CPU with
JAX_PLATFORMS=cpu).  Uses the HARD synthetic variant (subtle class signal
+ distractor blobs — the easy variant saturates from scratch and would
mask any initialization effect) at the reference's RGB split sizes.

Stages (all in ONE process — two TPU-claiming pythons deadlock):
  1. hard synthetic data, reference split sizes
  2. SimCLR-pretrain ResNet50 on the unlabeled rgb train split
  3. probe: cosine 1-NN accuracy of val embeddings against train
     embeddings, SSL trunk vs random-init trunk (representation quality
     with NO supervised training at all)
  4. low-label fine-tune: K labeled images/class, rgb_only training from
     scratch vs --init-from the SSL checkpoint, test F1
  5. (--mae) same low-label comparison for the thermal ViT with MAE

Usage:  python scripts_dev/ssl_rehearsal.py [--epochs 30] [--labels 8 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COUNTS = {
    "rgb": {"train": (380, 358), "val": (81, 77), "test": (82, 77)},
    "thermal": {"train": (612, 615), "val": (170, 252), "test": (108, 109)},
}


def subset_per_class(ds, per_class: int, seed: int = 0):
    """First ``per_class`` images of each class (deterministic)."""
    from dfu_multimodal_tpu.data.loader import ArrayDataset
    rng = np.random.default_rng(seed)
    keep = []
    for c in (0, 1):
        idx = np.where(ds.labels == c)[0]
        keep.extend(rng.permutation(idx)[:per_class].tolist())
    keep = np.asarray(sorted(keep))
    return ArrayDataset(
        arrays={m: a[keep] for m, a in ds.arrays.items()},
        labels=ds.labels[keep],
        paths={m: [p[i] for i in keep] for m, p in ds.paths.items()})


def trunk_embeddings(trunk_variables, images_u8, modality_cfg, batch=64):
    """Mean-pooled trunk features for uint8 images (normalized on device)."""
    import jax
    import jax.numpy as jnp
    from dfu_multimodal_tpu.data.transforms import eval_normalize
    from dfu_multimodal_tpu.models.resnet import ResNet50

    model = ResNet50(dtype=jnp.bfloat16)

    @jax.jit
    def fwd(variables, x):
        xn = eval_normalize(x, modality_cfg, jnp.bfloat16)
        return model.apply(variables, xn, train=False)

    outs = []
    n = len(images_u8)
    for s in range(0, n, batch):
        chunk = images_u8[s:s + batch]
        if len(chunk) < batch:    # fixed shapes: pad, slice after
            pad = np.repeat(chunk[-1:], batch - len(chunk), axis=0)
            out = fwd(trunk_variables, jnp.asarray(
                np.concatenate([chunk, pad])))[:len(chunk)]
        else:
            out = fwd(trunk_variables, jnp.asarray(chunk))
        outs.append(np.asarray(out, np.float32))
    return np.concatenate(outs)[:n]


def knn_accuracy(train_emb, train_y, val_emb, val_y):
    tr = train_emb / np.maximum(
        np.linalg.norm(train_emb, axis=1, keepdims=True), 1e-9)
    va = val_emb / np.maximum(
        np.linalg.norm(val_emb, axis=1, keepdims=True), 1e-9)
    nn_idx = (va @ tr.T).argmax(axis=1)
    return float(np.mean(train_y[nn_idx] == val_y))


def finetune_f1(model_name, mod_key, modality_cfg, train_ds, val_ds,
                test_ds, init_from, epochs, batch_size, tmp, tag):
    import jax
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import (Trainer,
                                                 class_weights_from_labels)

    cfg = config.TrainConfig(batch_size=batch_size, num_epochs=epochs,
                             save_best_after_epoch=1, seed=0,
                             lr_schedule="cosine", warmup_epochs=0.5,
                             steps_per_epoch=max(
                                 1, len(train_ds) // batch_size))
    tr = Trainer(model_name, cfg, {mod_key: modality_cfg},
                 class_weights=class_weights_from_labels(train_ds.labels))
    ckpt = tmp / f"ft_{tag}"
    state, history, best = tr.fit(
        train_ds, val_ds, checkpoint_dir=ckpt, log=lambda s: None,
        init_from=init_from)
    # evaluate the best checkpoint (falls back to final state if no save)
    try:
        state = tr.restore(ckpt, state=state)
    except FileNotFoundError:
        pass
    m, _ = tr.run_eval_epoch(state, test_ds)
    return m.f1, m.accuracy, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/ssl_rehearsal"))
    ap.add_argument("--epochs", type=int, default=30,
                    help="SSL pretraining epochs")
    ap.add_argument("--ft-epochs", type=int, default=10)
    ap.add_argument("--labels", type=int, nargs="+", default=[8, 32],
                    help="labeled images per class for the fine-tune stage")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--mae", action="store_true",
                    help="also run the thermal ViT MAE comparison")
    ap.add_argument("--scale", type=int, default=1,
                    help="divide every split size by this (CPU smoke)")
    ap.add_argument("--no-color-jitter", action="store_true",
                    help="SimCLR views without color jitter (the variant "
                         "for chromatic class signals)")
    ap.add_argument("--self-train", action="store_true",
                    help="stage 6: semi-supervised self-training at the "
                         "smallest label budget, scratch-init vs SSL-init")
    args = ap.parse_args()
    if args.scale > 1:
        for m in COUNTS:
            for s in COUNTS[m]:
                COUNTS[m][s] = tuple(max(2, c // args.scale)
                                     for c in COUNTS[m][s])

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.loader import load_single_modality
    from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
    from dfu_multimodal_tpu.train.ssl import PretrainConfig, SSLTrainer

    work = args.workdir
    data = work / "data"
    if not (data / "rgb" / "train").exists():
        print("[1] generating HARD synthetic dataset (reference sizes)...")
        t0 = time.time()
        make_synthetic_dataset(data, counts=COUNTS, size=224, seed=7,
                               difficulty="hard")
        print(f"    done in {time.time() - t0:.0f}s")

    rgb_train = load_single_modality(data / "rgb", "train", 224, "rgb")
    rgb_val = load_single_modality(data / "rgb", "val", 224, "rgb")
    rgb_test = load_single_modality(data / "rgb", "test", 224, "rgb")

    # ---- [2] SimCLR pretrain the ResNet trunk --------------------------
    pre_dir = work / ("pre_rgb_nocj" if args.no_color_jitter else "pre_rgb")
    cfg = PretrainConfig(method="simclr", batch_size=args.batch_size,
                         num_epochs=args.epochs, learning_rate=1e-3,
                         warmup_epochs=2.0, seed=0,
                         simclr_color_jitter=not args.no_color_jitter)
    ssl = SSLTrainer("resnet", cfg, config.rgb_modality())
    t0 = time.time()
    if (pre_dir / "best_model.msgpack").exists():
        print("[2] reusing existing SimCLR checkpoint")
        state = ssl.init_state(jax.random.PRNGKey(0), 1)
        state, _, _ = ssl.restore(pre_dir, state)
    else:
        print(f"[2] SimCLR pretraining ResNet50: {len(rgb_train)} images, "
              f"{args.epochs} epochs, b{args.batch_size}")
        state, history = ssl.fit(rgb_train, pre_dir)
        dt = time.time() - t0
        print(f"    wall {dt:.0f}s  "
              f"({len(rgb_train) * args.epochs / dt:.0f} img/s incl. "
              f"compile; loss {history['loss'][0]:.3f} -> "
              f"{history['loss'][-1]:.3f})")

    # ---- [3] representation probe: 1-NN val accuracy -------------------
    import jax.numpy as jnp
    ssl_vars = {"params": state.params["ResNet_0"],
                "batch_stats": state.batch_stats["ResNet_0"]}
    from dfu_multimodal_tpu.models.resnet import ResNet50
    rnd = ResNet50(dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
    results = {}
    for name, variables in (("random-init", rnd), ("simclr", ssl_vars)):
        tr_emb = trunk_embeddings(variables, rgb_train.arrays["rgb"],
                                  config.rgb_modality())
        va_emb = trunk_embeddings(variables, rgb_val.arrays["rgb"],
                                  config.rgb_modality())
        acc = knn_accuracy(tr_emb, rgb_train.labels, va_emb, rgb_val.labels)
        results[name] = acc
        print(f"[3] 1-NN val accuracy ({name} trunk): {acc:.4f}")

    # ---- [4] low-label fine-tune: scratch vs SSL init ------------------
    print("[4] low-label fine-tune (rgb_only, test F1):")
    suffix = "_nocj" if args.no_color_jitter else ""
    table = []
    for k in args.labels:
        sub = subset_per_class(rgb_train, k, seed=3)
        bs = min(16, 2 * k)
        f1_s, acc_s, _ = finetune_f1("rgb_only", "rgb",
                                     config.rgb_modality(), sub, rgb_val,
                                     rgb_test, None, args.ft_epochs, bs,
                                     work, f"scratch_{k}")
        f1_p, acc_p, _ = finetune_f1("rgb_only", "rgb",
                                     config.rgb_modality(), sub, rgb_val,
                                     rgb_test, pre_dir, args.ft_epochs, bs,
                                     work, f"ssl_{k}{suffix}")
        print(f"    {k:>3}/class: scratch F1 {f1_s:.4f} (acc {acc_s:.4f})"
              f"  |  simclr-init F1 {f1_p:.4f} (acc {acc_p:.4f})")
        table.append((k, f1_s, f1_p))

    # ---- [6] optional self-training at the smallest label budget --------
    if args.self_train:
        from dfu_multimodal_tpu.data.loader import ArrayDataset
        from dfu_multimodal_tpu.train.self_train import (SelfTrainConfig,
                                                         self_train)
        k = min(args.labels)
        rng = np.random.default_rng(3)   # same subset as stage 4
        keep = np.concatenate([
            rng.permutation(np.where(rgb_train.labels == c)[0])[:k]
            for c in (0, 1)])
        keep_sorted = np.asarray(sorted(keep.tolist()))
        rest = np.setdiff1d(np.arange(len(rgb_train)), keep_sorted)

        def take(ds, ix):
            return ArrayDataset(
                arrays={m: a[ix] for m, a in ds.arrays.items()},
                labels=ds.labels[ix],
                paths={m: [p[i] for i in ix]
                       for m, p in ds.paths.items()})

        labeled, pool = take(rgb_train, keep_sorted), take(rgb_train, rest)
        print(f"[6] self-training (rgb_only, {k} labels/class + "
              f"{len(pool)} unlabeled pool, 3 rounds @ 0.9):")
        tcfg = config.TrainConfig(batch_size=min(16, 2 * k),
                                  num_epochs=args.ft_epochs,
                                  save_best_after_epoch=1, seed=0,
                                  lr_schedule="cosine", warmup_epochs=0.5)
        for tag, init in (("scratch-init", None), ("ssl-init", pre_dir)):
            st = SelfTrainConfig(rounds=3, threshold=0.9)
            trainer, state, report = self_train(
                "rgb_only", st, tcfg, {"rgb": config.rgb_modality()},
                labeled, pool, rgb_val,
                work / f"st_{tag}", init_from=init, log=lambda s: None)
            m, _ = trainer.run_eval_epoch(state, rgb_test)
            adopted = [r.get("adopted") for r in report]
            print(f"    {tag}: test F1 {m.f1:.4f} (acc {m.accuracy:.4f}) "
                  f"best round {max(report, key=lambda r: r['val_f1'])['round']}"
                  f" adopted={adopted}")

    # ---- [5] optional MAE thermal ---------------------------------------
    if args.mae:
        th_train = load_single_modality(data / "thermal", "train", 224,
                                        "thermal")
        th_val = load_single_modality(data / "thermal", "val", 224,
                                      "thermal")
        th_test = load_single_modality(data / "thermal", "test", 224,
                                       "thermal")
        pre_th = work / "pre_thermal"
        mcfg = PretrainConfig(method="mae", batch_size=args.batch_size,
                              num_epochs=args.epochs, learning_rate=1e-3,
                              warmup_epochs=2.0, seed=0)
        mae = SSLTrainer("vit", mcfg, config.thermal_modality())
        if not (pre_th / "best_model.msgpack").exists():
            print(f"[5] MAE pretraining ViT-B/16: {len(th_train)} images")
            t0 = time.time()
            _, h = mae.fit(th_train, pre_th)
            print(f"    wall {time.time() - t0:.0f}s  "
                  f"(loss {h['loss'][0]:.3f} -> {h['loss'][-1]:.3f})")
        for k in args.labels:
            sub = subset_per_class(th_train, k, seed=3)
            bs = min(16, 2 * k)
            f1_s, acc_s, _ = finetune_f1(
                "thermal_only", "thermal", config.thermal_modality(), sub,
                th_val, th_test, None, args.ft_epochs, bs, work,
                f"th_scratch_{k}")
            f1_p, acc_p, _ = finetune_f1(
                "thermal_only", "thermal", config.thermal_modality(), sub,
                th_val, th_test, pre_th, args.ft_epochs, bs, work,
                f"th_mae_{k}")
            print(f"    {k:>3}/class: scratch F1 {f1_s:.4f} "
                  f"(acc {acc_s:.4f})  |  mae-init F1 {f1_p:.4f} "
                  f"(acc {acc_p:.4f})")

    print("done.")


if __name__ == "__main__":
    main()
