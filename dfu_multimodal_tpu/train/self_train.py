"""Semi-supervised self-training: confident pseudo-labeling over an
unlabeled image pool.

Completes the label-efficient toolkit (with `dfu pretrain` SSL init and
`dfu embed --rank-uncertainty` active-learning triage): a clinic with few
labeled images and a directory of unlabeled ones iterates

    train on labeled -> predict the pool -> adopt confident predictions
    as pseudo-labels -> retrain on labeled + pseudo -> repeat

Classic self-training (Yarowsky-style; the modern FixMatch family reduces
to this under a hard confidence threshold when the model already applies
strong train-time augmentation, which ours does device-side).  Each round
retrains FROM the same initialization rather than continuing — re-fitting
on the grown set resists the confirmation-bias spiral of fine-tuning on
your own early mistakes.

No reference counterpart (the reference assumes fully-labeled splits);
this is a beyond-reference opt-in, `dfu self-train`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.config import ModalityConfig, TrainConfig
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.data.transforms import eval_normalize
from dfu_multimodal_tpu.train.engine import Trainer, class_weights_from_labels


@dataclass(frozen=True)
class SelfTrainConfig:
    rounds: int = 3
    # adopt a pool image when max-class probability >= threshold
    threshold: float = 0.9
    # per-round, per-class cap on adopted pseudo-labels; None = no cap.
    # Balanced adoption (the min of the two classes' confident counts)
    # guards against the majority-class snowball that sinks naive
    # self-training on imbalanced pools.
    max_per_class: Optional[int] = None
    balance: bool = True


def predict_pool_probs(trainer: Trainer, state, images_u8: np.ndarray,
                       modality: ModalityConfig,
                       batch_size: int = 64) -> np.ndarray:
    """(n, 2) softmax probabilities for a uint8 image pool (fixed-shape
    batches, pool padded with repeats and sliced back) — callers derive
    argmax/confidence over the last axis (select_confident)."""
    variables = trainer.variables(state)
    module = trainer.module
    dtype = trainer.compute_dtype

    @jax.jit
    def fwd(vs, x):
        logits = module.apply(vs, eval_normalize(x, modality, dtype),
                              train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    outs = []
    n = len(images_u8)
    for s in range(0, n, batch_size):
        chunk = images_u8[s:s + batch_size]
        if len(chunk) < batch_size:
            pad = np.repeat(chunk[-1:], batch_size - len(chunk), axis=0)
            out = fwd(variables, jnp.asarray(
                np.concatenate([chunk, pad])))[:len(chunk)]
        else:
            out = fwd(variables, jnp.asarray(chunk))
        outs.append(np.asarray(out, np.float32))
    return np.concatenate(outs)[:n]


def select_confident(probs: np.ndarray, threshold: float,
                     max_per_class: Optional[int] = None,
                     balance: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(indices, labels) of pool rows whose max-class probability clears
    ``threshold``, most-confident first per class, optionally capped and
    class-balanced."""
    preds = probs.argmax(axis=-1)
    conf = probs.max(axis=-1)
    chosen: List[np.ndarray] = []
    per_class = []
    for c in (0, 1):
        idx = np.where((preds == c) & (conf >= threshold))[0]
        idx = idx[np.argsort(-conf[idx])]
        if max_per_class is not None:
            idx = idx[:max_per_class]
        per_class.append(idx)
    if balance:
        k = min(len(per_class[0]), len(per_class[1]))
        per_class = [idx[:k] for idx in per_class]
    chosen = per_class
    indices = np.concatenate(chosen) if chosen else np.zeros(0, np.int64)
    return indices.astype(np.int64), preds[indices].astype(np.int32)


def combine(labeled: ArrayDataset, pool_images: Dict[str, np.ndarray],
            pool_paths: Dict[str, List], indices: np.ndarray,
            labels: np.ndarray) -> ArrayDataset:
    if len(indices) == 0:
        return labeled
    arrays = {m: np.concatenate([labeled.arrays[m], pool_images[m][indices]])
              for m in labeled.arrays}
    paths = {m: list(labeled.paths.get(m, [])) +
             [pool_paths.get(m, [None] * (indices.max() + 1))[i]
              for i in indices]
             for m in labeled.arrays}
    return ArrayDataset(
        arrays=arrays,
        labels=np.concatenate([labeled.labels, labels]).astype(np.int32),
        paths=paths)


def self_train(model_name: str, st_cfg: SelfTrainConfig,
               train_cfg: TrainConfig,
               modalities: Dict[str, ModalityConfig],
               labeled: ArrayDataset, pool: ArrayDataset,
               val_ds: ArrayDataset, checkpoint_dir: Path,
               init_from: Optional[Path] = None,
               image_size: int = 224,
               log: Callable[[str], None] = print):
    """Run the self-training loop for a SINGLE-modality model.  ``pool``'s
    labels are ignored (treated as unlabeled).  Returns
    (best_trainer, best_state, report): the round with the best val F1
    wins, and its checkpoint is what ``checkpoint_dir/best_model`` holds.
    """
    if len(labeled.modalities) != 1:
        raise ValueError("self_train supports single-modality models "
                         f"(got modalities {labeled.modalities})")
    mod_key = labeled.modalities[0]
    modality = modalities[mod_key]
    checkpoint_dir = Path(checkpoint_dir)

    report: List[Dict] = []
    current = labeled
    best = (-1.0, None, None, None)      # (val_f1, round, trainer, state)
    for rnd in range(1, st_cfg.rounds + 1):
        cw = class_weights_from_labels(current.labels)
        # ceil, matching run_train_epoch's actual step count (the
        # codebase-wide form, cli/_train_common.py): floor would hand
        # the cosine schedule a too-short horizon and the tail of every
        # round would train at LR 0
        cfg = dataclasses.replace(
            train_cfg, steps_per_epoch=max(
                1, -(-len(current) // train_cfg.batch_size)))
        trainer = Trainer(model_name, cfg, modalities, class_weights=cw)
        rdir = checkpoint_dir / f"round_{rnd}"
        state, history, val_f1 = trainer.fit(
            current, val_ds, checkpoint_dir=rdir, image_size=image_size,
            log=lambda s: None, init_from=init_from)
        try:                             # evaluate the round's best save
            state = trainer.restore(rdir, state=state,
                                    image_size=image_size)
        except FileNotFoundError:
            pass
        n_pseudo = len(current) - len(labeled)
        log(f"[self-train round {rnd}/{st_cfg.rounds}] "
            f"trained on {len(labeled)} labeled + {n_pseudo} pseudo "
            f"-> val F1 {val_f1:.4f}")
        report.append({"round": rnd, "n_labeled": int(len(labeled)),
                       "n_pseudo": int(n_pseudo),
                       "val_f1": float(val_f1)})
        if val_f1 > best[0]:
            best = (val_f1, rnd, trainer, state)
        if rnd == st_cfg.rounds:
            break
        probs = predict_pool_probs(trainer, state,
                                   pool.arrays[mod_key], modality)
        idx, pseudo = select_confident(probs, st_cfg.threshold,
                                       st_cfg.max_per_class,
                                       st_cfg.balance)
        report[-1]["adopted"] = {"healthy": int(np.sum(pseudo == 0)),
                                 "ulcer": int(np.sum(pseudo == 1))}
        log(f"  adopted {len(idx)} pseudo-labels "
            f"(h {int(np.sum(pseudo == 0))} / u {int(np.sum(pseudo == 1))}"
            f", threshold {st_cfg.threshold})")
        current = combine(labeled, pool.arrays, pool.paths, idx, pseudo)

    val_f1, rnd, trainer, state = best
    log(f"[self-train] best round: {rnd} (val F1 {val_f1:.4f})")
    # promote the winning round's checkpoint to the canonical location
    import shutil
    src = checkpoint_dir / f"round_{rnd}"
    promoted = False
    for name in ("best_model.msgpack", "best_model.meta.json"):
        if (src / name).exists():
            shutil.copy2(src / name, checkpoint_dir / name)
            promoted = True
    if not promoted:
        # a degenerate winning round (val F1 0.0 every epoch) never
        # passed fit's best-save gate — the promised best_model.* must
        # exist regardless, or a later `dfu predict/serve` on this
        # directory dies with a bare FileNotFoundError
        from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod
        ckpt_mod.save_checkpoint(
            checkpoint_dir, epoch=train_cfg.num_epochs,
            model_state=trainer.variables(state),
            opt_state={}, val_f1=float(val_f1), history={},
            extra_meta={"model": model_name, "self_train_round": rnd,
                        "degenerate_round": True})
        log("  (round never beat F1 0.0 — saved its final state as "
            "best_model)")
    return trainer, state, report
