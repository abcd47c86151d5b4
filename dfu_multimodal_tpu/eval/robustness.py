"""Corruption-robustness sweep (`dfu robustness`).

No reference counterpart — the reference's only robustness probe is TTA
(notebooks/test_time_augmentation.py:404-441: clean-vs-TTA F1 with
robust/moderate verdicts at 0.05/0.15 drops).  Deployment cameras
degrade in specific, *parametric* ways (sensor noise, defocus blur,
exposure drift, contrast loss); this module measures F1 as a function
of corruption type × severity, per input modality — an ImageNet-C-style
sweep on the model's own test split.

TPU-native: each modality-subset is ONE jitted program with the
corruption as a traced ``lax.switch`` branch index and the severity as
a traced scalar — the WHOLE corruption×severity grid replays a single
compiled program, and the corruption math (noise add, separable blur,
brightness/contrast in float-[0,255] space) fuses into the
normalize+forward program.  This matters in production: a ViT-B/16
eval is ~0.25 s of device time but each re-jit over the remote-compile
tunnel costs minutes, so per-corruption jits made the sweep
compile-bound (4 corruptions ≈ 30 min measured; one switch program
≈ 1/4 of that).  Verdicts reuse the reference's TTA thresholds so the
two robustness reports read on one scale.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.data import loader as data_loader
from dfu_multimodal_tpu.data.transforms import eval_normalize
from dfu_multimodal_tpu.eval import metrics as metrics_mod
from dfu_multimodal_tpu.parallel import mesh as mesh_mod

# severity 1-5 parameter grids (uint8-scale units where applicable)
SEVERITY_PARAMS: Dict[str, Tuple[float, ...]] = {
    "gaussian_noise": (4.0, 8.0, 16.0, 24.0, 32.0),      # noise sigma
    "gaussian_blur": (0.5, 1.0, 1.5, 2.0, 3.0),          # blur sigma
    "brightness": (8.0, 16.0, 32.0, 48.0, 64.0),         # +delta
    "contrast": (0.85, 0.70, 0.55, 0.40, 0.30),          # scale factor
}
CORRUPTIONS = tuple(SEVERITY_PARAMS)

_BLUR_RADIUS = 5        # 11-tap separable kernel; sigma stays traced


def _blur(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) separable Gaussian blur with a TRACED sigma."""
    offs = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    kern = kern / jnp.sum(kern)

    def conv_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (_BLUR_RADIUS, _BLUR_RADIUS)
        padded = jnp.pad(img, pad, mode="edge")
        out = jnp.zeros_like(img)
        for i in range(2 * _BLUR_RADIUS + 1):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + kern[i] * padded[tuple(sl)]
        return out

    return conv_axis(conv_axis(x, 1), 2)


def _noise(x, param, key):
    return x + param * jax.random.normal(key, x.shape, jnp.float32)


def _brightness(x, param, key):
    return x + param


def _contrast(x, param, key):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return mean + param * (x - mean)


_CORRUPTION_FNS = {"gaussian_noise": _noise,
                   "gaussian_blur": lambda x, p, k: _blur(x, p),
                   "brightness": _brightness,
                   "contrast": _contrast}
assert tuple(_CORRUPTION_FNS) == CORRUPTIONS


def apply_corruption(name: str, images_f: jnp.ndarray, param: jnp.ndarray,
                     key: jax.Array) -> jnp.ndarray:
    """Corrupt float-[0,255] images; returns clipped float [0,255]."""
    if name not in _CORRUPTION_FNS:
        raise ValueError(f"unknown corruption {name!r} "
                         f"(choose from {sorted(SEVERITY_PARAMS)})")
    return jnp.clip(_CORRUPTION_FNS[name](images_f, param, key), 0.0, 255.0)


def apply_corruption_switch(cidx: jnp.ndarray, images_f: jnp.ndarray,
                            param: jnp.ndarray, key: jax.Array
                            ) -> jnp.ndarray:
    """`lax.switch`-dispatched :func:`apply_corruption` with the
    corruption as a TRACED branch index into ``CORRUPTIONS`` order —
    one compiled program serves the whole corruption grid."""
    branches = [
        lambda x, p, k, f=_CORRUPTION_FNS[n]: jnp.clip(f(x, p, k), 0., 255.)
        for n in CORRUPTIONS]
    return jax.lax.switch(cidx, branches, images_f, param, key)


def make_step(trainer, corrupt_inputs: Iterable[str]):
    """One jitted eval step for a modality subset.  The corruption is a
    traced ``lax.switch`` index and the severity a traced scalar, so a
    single compile serves every (corruption, severity) cell — the sweep
    is compile-bound over the remote-compile tunnel otherwise."""
    corrupt_set = frozenset(corrupt_inputs)
    unknown = corrupt_set - set(trainer.spec.inputs)
    if unknown:
        raise ValueError(f"model {trainer.spec.name!r} has no input(s) "
                         f"{sorted(unknown)}")
    module, spec, mods = trainer.module, trainer.spec, trainer.modalities
    dtype = trainer.compute_dtype

    @jax.jit
    def step(variables, batch, cidx, param, key):
        inputs = []
        for i, m in enumerate(spec.inputs):
            x = batch[m].astype(jnp.float32)
            if m in corrupt_set:
                x = apply_corruption_switch(cidx, x, param,
                                            jax.random.fold_in(key, i))
            # eval_normalize handles float [0,255] directly
            inputs.append(eval_normalize(x, mods[m], dtype))
        logits = module.apply(variables, *inputs, train=False)
        preds = jnp.argmax(logits, axis=-1)
        return metrics_mod.confusion_counts(preds, batch["label"],
                                            batch["valid"])

    return step


def corrupted_counts(trainer, state, dataset, name: str,
                     corrupt_inputs: Iterable[str], severities: List[int],
                     seed: int = 0, step=None) -> List[np.ndarray]:
    """Confusion counts per severity level, streaming the dataset once
    per level.  Pass ``step`` (from :func:`make_step`) to reuse one
    compiled program across corruptions, as :func:`sweep` does."""
    if name not in SEVERITY_PARAMS:
        raise ValueError(f"unknown corruption {name!r} "
                         f"(choose from {sorted(SEVERITY_PARAMS)})")
    if step is None:
        step = make_step(trainer, corrupt_inputs)
    cidx = jnp.int32(CORRUPTIONS.index(name))

    bs = mesh_mod.pad_batch_to_mesh(trainer.cfg.eval_bs, trainer.mesh)
    variables = trainer.variables(state)
    params_grid = SEVERITY_PARAMS[name]
    bad = [s for s in severities if not 1 <= int(s) <= len(params_grid)]
    if bad:
        # severity 0 would silently negative-index to the HARSHEST level
        raise ValueError(
            f"severities must be in 1..{len(params_grid)}, got {bad}")
    out = []
    for sev in severities:
        param = jnp.float32(params_grid[sev - 1])
        counts = []
        for bi, batch in enumerate(data_loader.device_prefetch(
                data_loader.batch_slices(dataset,
                                         np.arange(len(dataset)), bs),
                trainer.batch_sharding)):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), bi)
            counts.append(step(variables, batch, cidx, param, key))
        out.append(np.sum(np.asarray(jnp.stack(counts)), axis=0))
    return out


def verdict(clean_f1: float, f1: float) -> str:
    """The reference's TTA robustness thresholds
    (test_time_augmentation.py:404-441): drop <0.05 robust, <0.15
    moderate, else fragile."""
    drop = clean_f1 - f1
    if drop < 0.05:
        return "robust"
    if drop < 0.15:
        return "moderate"
    return "fragile"


def sweep(trainer, state, dataset, corruptions: Iterable[str],
          severities: List[int], modality_subsets: List[Tuple[str, ...]],
          seed: int = 0, log=print) -> Dict:
    """Full sweep -> report dict (also the robustness_report.json
    payload)."""
    clean_m, _ = trainer.run_eval_epoch(state, dataset)
    report = {"model": trainer.spec.name, "n": len(dataset),
              "clean_f1": clean_m.f1, "clean_acc": clean_m.accuracy,
              "severities": list(severities), "results": []}
    log(f"clean: F1 {clean_m.f1:.4f}, acc {clean_m.accuracy:.4f}")
    for subset in modality_subsets:
        step = make_step(trainer, subset)     # ONE compile per subset
        for name in corruptions:
            rows = corrupted_counts(trainer, state, dataset, name, subset,
                                    severities, seed=seed, step=step)
            f1s = [metrics_mod.f1_from_counts(c) for c in rows]
            accs = [metrics_mod.accuracy_from_counts(c) for c in rows]
            worst = min(f1s)
            entry = {"corruption": name, "modalities": list(subset),
                     "f1": [round(float(v), 4) for v in f1s],
                     "acc": [round(float(v), 4) for v in accs],
                     "worst_f1": round(float(worst), 4),
                     "verdict": verdict(clean_m.f1, float(worst))}
            report["results"].append(entry)
            log(f"{'+'.join(subset):>12s} {name:<15s} "
                + " ".join(f"{v:.3f}" for v in f1s)
                + f"  [{entry['verdict']}]")
    return report
