"""Test-time augmentation — vmapped over (sample × augmentation) on device.

The reference runs a pathological triple loop: batches × samples × 5 augs,
one single-image forward per iteration with host-side PIL augmentation
(reference notebooks/test_time_augmentation.py:191-258).  Here each test
batch is expanded to (B·T) images, augmented with per-replica PRNG keys and
forwarded in ONE device program — the O(N·5) serial forwards become a
handful of large MXU batches (the BASELINE.json north star explicitly calls
for this).

TTA augmentation parameters match ``get_light_augmentation_transforms``
(:145-167): rotation ±15°, h/v flip p=0.5, affine ±10°/translate 0.05
(always applied, no scale).

Aggregation parity (:212-237): per-aug pred = prob > 0.5; final pred =
majority (mean of per-aug preds > 0.5); final prob = mean of per-aug probs.
Note the reference's TTA file uses 1-logit sigmoid heads, inconsistent with
the 2-class softmax used everywhere else in the reference (SURVEY.md §2 #15);
we standardize on the 2-class contract and use softmax P(ulcer).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.config import AugmentConfig, ModalityConfig
from dfu_multimodal_tpu.data import loader as data_loader
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.data.transforms import (augment_and_normalize,
                                                eval_normalize)
from dfu_multimodal_tpu.eval import metrics as metrics_mod


def tta_augment_config() -> AugmentConfig:
    """Light TTA augmentation (reference :145-167)."""
    return AugmentConfig(
        horizontal_flip_prob=0.5, vertical_flip_prob=0.5,
        rotation_degrees=15.0,
        aug_prob=1.0,                      # affine is unconditional in TTA
        color_jitter=False,
        affine=True, affine_degrees=10.0, affine_translate=0.05,
        affine_scale=(1.0, 1.0),
        gaussian_blur=False)


def tta_modality(base: ModalityConfig) -> ModalityConfig:
    return dataclasses.replace(base, augment=tta_augment_config())


def tta_predictions(trainer, state, dataset: ArrayDataset,
                    num_tta: int = 5, use_augmentation: bool = True,
                    seed: int = 0):
    """TTA inference core: ``(majority_preds, mean_probs)`` numpy arrays
    over ``dataset`` — used by :func:`evaluate_with_tta` (labeled eval)
    and by ``predict --tta`` (robust unlabeled inference)."""
    module, spec = trainer.module, trainer.spec
    variables = trainer.variables(state)
    tta_mods = {m: tta_modality(cfg) for m, cfg in trainer.modalities.items()}
    T = num_tta if use_augmentation else 1

    @jax.jit
    def tta_step(variables, batch, rng):
        inputs = []
        for i, m in enumerate(spec.inputs):
            imgs = batch[m]                                   # (B, H, W, C)
            tiled = jnp.repeat(imgs, T, axis=0)               # (B*T, H, W, C)
            if use_augmentation:
                key = jax.random.fold_in(rng, i)
                x = augment_and_normalize(key, tiled, tta_mods[m],
                                          trainer.compute_dtype)
            else:
                x = eval_normalize(tiled, tta_mods[m], trainer.compute_dtype)
            inputs.append(x)
        logits = module.apply(variables, *inputs, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
        probs = probs.reshape(-1, T)                          # (B, T)
        per_aug_preds = (probs > 0.5).astype(jnp.float32)
        avg_prob = probs.mean(axis=1)
        maj_pred = (per_aug_preds.mean(axis=1) > 0.5).astype(jnp.int32)
        return maj_pred, avg_prob

    rng = jax.random.PRNGKey(seed)
    # Same data path as the Trainer: mesh-padded batches, batch-sharded
    # over the data axis, depth-2 async device prefetch.
    from dfu_multimodal_tpu.parallel import mesh as mesh_mod
    bs = mesh_mod.pad_batch_to_mesh(max(trainer.cfg.eval_bs, 1),
                                    trainer.mesh)
    preds, probs = [], []
    for bi, batch in enumerate(data_loader.device_prefetch(
            data_loader.batch_slices(dataset, np.arange(len(dataset)), bs),
            trainer.batch_sharding)):
        p, pr = tta_step(variables, batch, jax.random.fold_in(rng, bi))
        preds.append(np.asarray(p))
        probs.append(np.asarray(pr))

    n = len(dataset)
    if n == 0:
        # same informative failure as Trainer.run_eval_epoch — a bare
        # np.concatenate([]) would crash with no hint about the data dir
        raise ValueError(
            "cannot run TTA on an empty dataset: the split directory "
            "has no images (check the data-dir layout)")
    return np.concatenate(preds)[:n], np.concatenate(probs)[:n]


def evaluate_with_tta(trainer, state, dataset: ArrayDataset,
                      num_tta: int = 5, use_augmentation: bool = True,
                      seed: int = 0) -> Dict:
    """Returns the reference's TTA metrics dict (:241-258 keys)."""
    all_preds, all_probs = tta_predictions(
        trainer, state, dataset, num_tta=num_tta,
        use_augmentation=use_augmentation, seed=seed)
    all_labels = np.asarray(dataset.labels)

    cm = metrics_mod.binary_confusion(all_labels, all_preds)
    tn, fp, fn, tp = (float(x) for x in cm.ravel())
    return {
        "accuracy": metrics_mod.accuracy_from_counts(
            np.array([tn, fp, fn, tp])),
        "f1": metrics_mod.f1_from_counts(np.array([tn, fp, fn, tp])),
        "auc": metrics_mod.roc_auc_score(all_labels, all_probs),
        "sensitivity": tp / (tp + fn) if (tp + fn) > 0 else 0.0,
        "specificity": tn / (tn + fp) if (tn + fp) > 0 else 0.0,
        "confusion_matrix": cm,
        "predictions": all_preds,
        "probabilities": all_probs,
        "labels": all_labels,
    }


def print_tta_comparison(clean: Dict, tta: Dict, model_name: str) -> str:
    """Reference comparison report incl. robustness verdict (:404-441).
    Returns the verdict string."""
    print("\n" + "=" * 70)
    print(f"TEST-TIME AUGMENTATION EVALUATION: {model_name}")
    print("=" * 70)
    for title, m in (("CLEAN EVALUATION (No Augmentation)", clean),
                     ("TTA EVALUATION (5x Augmented)", tta)):
        print(f"\n{title}:")
        print(f"  Accuracy:    {m['accuracy']:.4f}")
        print(f"  F1-Score:    {m['f1']:.4f}")
        print(f"  AUC-ROC:     {m['auc']:.4f}")
        print(f"  Sensitivity: {m['sensitivity']:.4f}")
        print(f"  Specificity: {m['specificity']:.4f}")

    acc_drop = clean["accuracy"] - tta["accuracy"]
    f1_drop = clean["f1"] - tta["f1"]
    print("\nROBUSTNESS COMPARISON:")
    print(f"  Accuracy drop:  {acc_drop:.4f} ({acc_drop * 100:.2f}%)")
    print(f"  F1-Score drop:  {f1_drop:.4f}")
    if abs(acc_drop) < 0.05:
        verdict = "ROBUST"
        print("\n  ROBUST: Model generalizes well to variations")
    elif abs(acc_drop) < 0.15:
        verdict = "MODERATE"
        print("\n  MODERATE: Some performance drop with augmentation")
    else:
        verdict = "NOT ROBUST"
        print("\n  NOT ROBUST: Large performance drop suggests overfitting")
    print("\nCONFUSION MATRICES:")
    print("\nClean:")
    print(clean["confusion_matrix"])
    print("\nTTA:")
    print(tta["confusion_matrix"])
    return verdict
