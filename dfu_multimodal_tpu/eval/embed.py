"""Trunk-embedding extraction and nearest-neighbor case retrieval.

Beyond-reference, opt-in surface (``dfu embed``).  The reference's models
compute 2048-d ResNet / 768-d ViT feature vectors on every forward pass but
throw them away after the classifier head (reference
notebooks/train_multimodal_fusion.py:285-326 keeps only the logits); the
features themselves are clinically useful:

- **Similar-case retrieval**: for a new image, show the most similar
  training cases (cosine similarity in trunk-embedding space) so a
  clinician can ground the model's probability in precedent.
- **Active-learning triage**: rank unlabeled images by decision-boundary
  proximity to spend labeling budget where the model is least certain.
- **Dataset auditing**: near-duplicate detection beyond exact SHA-256
  (the organizer's dedup — tools/organize.py — catches only bit-identical
  files), outlier screening, embedding-space visualization.

The extraction step is a single jitted forward per batch with Flax
``capture_intermediates`` filtered to exactly the trunk output scopes —
no second forward, no O(activations) capture of every conv/block output.
Retrieval is exact cosine top-k: at reference scale (≤ a few thousand
rows × ≤ 2816 dims) one matmul, milliseconds on host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from dfu_multimodal_tpu.data.loader import ArrayDataset

# zoo model name -> {embedding name: top-level trunk scope}.  The scope's
# ``__call__`` output is the (B, D) feature vector feeding the classifier
# head.  TinyCNN has no trunk submodule; its sown spatial 'features' map is
# pooled instead (zoo.py:62).
TRUNK_SCOPES: Dict[str, Dict[str, str]] = {
    "rgb_only": {"rgb": "ResNet_0"},                       # (B, 2048)
    "resnet18_rgb": {"rgb": "ResNet_0"},                   # (B, 512)
    "resnet18_thermal": {"thermal": "ResNet_0"},           # (B, 512)
    "thermal_only": {"thermal": "ViT_0"},                  # (B, 768)
    "multimodal": {"rgb": "rgb_branch",                    # (B, 2048)
                   "thermal": "thermal_branch"},           # (B, 768)
    "efficientnet_rgb": {"rgb": "EfficientNetB0_0"},       # (B, 1280)
    "efficientnet_thermal": {"thermal": "EfficientNetB0_0"},
    "legacy_gated_fusion": {"rgb": "rgb_encoder",
                            "thermal": "thermal_encoder"},
    "legacy_rgb_resnet_fusion": {"rgb": "rgb_encoder",
                                 "thermal": "thermal_encoder"},
    "tiny_fusion": {"rgb": "rgb_branch",                   # (B, 32) each
                    "thermal": "thermal_branch"},
}
_TINY = {"tiny_rgb": "rgb", "tiny_thermal": "thermal"}


def extract_features(trainer, state, dataset: ArrayDataset
                     ) -> Dict[str, np.ndarray]:
    """Run the model over ``dataset`` capturing trunk embeddings.

    Returns float32 arrays: ``feat_<name>`` per trunk (``(N, D)``),
    ``feat_fused`` (concat over trunks, the fusion head's input layout for
    multimodal models), ``probs`` (``(N,)`` P(ulcer)) and ``preds``.
    """
    import jax
    import jax.numpy as jnp

    from dfu_multimodal_tpu.parallel import mesh as mesh_mod

    model_name = trainer.spec.name
    tiny_mod = _TINY.get(model_name)
    scopes = TRUNK_SCOPES.get(model_name)
    if scopes is None and tiny_mod is None:
        raise ValueError(f"no trunk-scope mapping for model {model_name!r}; "
                         f"supported: {sorted(TRUNK_SCOPES) + sorted(_TINY)}")

    module = trainer.module
    variables = trainer.variables(state)
    want = set(scopes.values()) if scopes else set()

    # One compiled program per trainer, reused across calls — the 3-split
    # near-dup audit calls extract_features three times, and a fresh
    # jax.jit closure per call would re-trace/re-compile the identical
    # forward each time.
    cached = getattr(trainer, "_embed_step_cache", None)
    if cached is not None:
        embed_step = cached
        bs = mesh_mod.pad_batch_to_mesh(trainer.cfg.eval_bs, trainer.mesh)
        return _run_embed(trainer, embed_step, variables, dataset, bs)

    def capture_filter(mdl, method_name):
        return (method_name == "__call__" and len(mdl.path) == 1
                and mdl.path[0] in want)

    @jax.jit
    def embed_step(variables, batch):
        inputs = trainer._preprocess_eval(batch)
        logits, inter = module.apply(
            variables, *inputs, train=False,
            capture_intermediates=capture_filter,
            mutable=["intermediates"])
        inter = inter["intermediates"]
        feats = {}
        if tiny_mod is not None:
            # TinyCNN sows a spatial (B, H, W, C) map; pool to (B, C)
            fmap = inter["features"][0]
            feats[tiny_mod] = jnp.mean(fmap, axis=(1, 2))
        else:
            for name, scope in scopes.items():
                feats[name] = inter[scope]["__call__"][0]
        logits = logits.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        preds = jnp.argmax(logits, axis=-1)
        return ({k: v.astype(jnp.float32) for k, v in feats.items()},
                probs, preds)

    trainer._embed_step_cache = embed_step
    bs = mesh_mod.pad_batch_to_mesh(trainer.cfg.eval_bs, trainer.mesh)
    return _run_embed(trainer, embed_step, variables, dataset, bs)


def _run_embed(trainer, embed_step, variables, dataset: ArrayDataset,
               bs: int) -> Dict[str, np.ndarray]:
    from dfu_multimodal_tpu.data import loader as data_loader

    if len(dataset) == 0:
        # informative failure like Trainer.run_eval_epoch — a bare
        # np.concatenate([]) would crash with no hint about the data dir
        raise ValueError(
            "cannot embed an empty dataset: the split directory has no "
            "images (check the data-dir layout)")
    feat_parts: Dict[str, List[np.ndarray]] = {}
    prob_parts, pred_parts = [], []
    for batch in data_loader.device_prefetch(
            data_loader.batch_slices(dataset, np.arange(len(dataset)), bs),
            trainer.batch_sharding):
        feats, probs, preds = embed_step(variables, batch)
        for k, v in feats.items():
            feat_parts.setdefault(k, []).append(np.asarray(v))
        prob_parts.append(np.asarray(probs))
        pred_parts.append(np.asarray(preds))

    n = len(dataset)
    out: Dict[str, np.ndarray] = {
        "probs": np.concatenate(prob_parts)[:n],
        "preds": np.concatenate(pred_parts)[:n],
    }
    names = sorted(feat_parts)
    for k in names:
        out[f"feat_{k}"] = np.concatenate(feat_parts[k])[:n]
    if len(names) > 1:
        # trunk-concat order matches the fusion head's input layout
        # (models/fusion.py:101: [rgb | thermal])
        order = [m for m in trainer.spec.inputs if m in feat_parts]
        out["feat_fused"] = np.concatenate(
            [out[f"feat_{m}"] for m in order], axis=1)
    return out


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)


def cosine_topk(queries: np.ndarray, index: np.ndarray, k: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact cosine top-k: ``(indices, sims)`` each ``(Q, k)``, most
    similar first.  One (Q, D) @ (D, N) matmul."""
    k = min(int(k), index.shape[0])
    sims = l2_normalize(queries) @ l2_normalize(index).T       # (Q, N)
    top = np.argsort(-sims, axis=1)[:, :k]
    return top, np.take_along_axis(sims, top, axis=1)


def cross_split_near_duplicates(
        feats: Dict[str, np.ndarray],
        paths: Dict[str, List[str]],
        threshold: float = 0.99) -> List[Dict]:
    """Embedding-space leakage audit: pairs of images in DIFFERENT splits
    whose trunk embeddings exceed ``threshold`` cosine similarity.

    The SHA-256 leakage gate (data/leakage.py, mirroring reference
    notebooks/train_rgb_only.py:138-165) catches only bit-identical
    files; a re-encoded, resized, or lightly cropped copy of a training
    image sitting in the test split passes it and silently inflates every
    test metric.  Near-identical trunk embeddings are the standard signal
    for that.  Returns ``[{split_a, path_a, split_b, path_b, sim}]``
    sorted most-similar first; splits are compared pairwise in the given
    key order.

    Rows whose path is None (the aligned-pairing loader's black
    missing-modality placeholders, data/pairing.py) are excluded: every
    placeholder embeds to the same fixed vector, so any two splits
    containing one would otherwise report a meaningless sim=1.0
    "leak" between two images that don't exist.
    """
    names = list(feats)

    def real_rows(split):
        return np.array([p is not None and str(p) != "None"
                         for p in paths[split]], bool)

    keep = {split: real_rows(split) for split in names}
    feats = {split: np.asarray(feats[split])[keep[split]]
             for split in names}
    paths = {split: [p for p, k in zip(paths[split], keep[split]) if k]
             for split in names}
    best: Dict[tuple, Dict] = {}
    for ai in range(len(names)):
        for bi in range(ai + 1, len(names)):
            a, b = names[ai], names[bi]
            if not len(feats[a]) or not len(feats[b]):
                continue
            sims = l2_normalize(feats[a]) @ l2_normalize(feats[b]).T
            ii, jj = np.nonzero(sims >= threshold)
            for i, j in zip(ii, jj):
                # dedupe by path pair (pseudo-paired datasets repeat rows
                # via modulo cycling), keeping the max similarity
                key = (a, str(paths[a][i]), b, str(paths[b][j]))
                s = float(sims[i, j])
                if key not in best or s > best[key]["sim"]:
                    best[key] = {"split_a": a, "path_a": key[1],
                                 "split_b": b, "path_b": key[3], "sim": s}
    hits = sorted(best.values(), key=lambda h: -h["sim"])
    return hits


def uncertainty_order(probs: np.ndarray, center: float = 0.5) -> np.ndarray:
    """Indices sorted most-uncertain first (|P(ulcer) − center|
    ascending) — the active-learning triage ranking.  ``center`` is the
    operating decision boundary: 0.5 for argmax, the deployed threshold
    when one is configured (cases nearest the boundary that actually
    decides are the ones worth review)."""
    return np.argsort(np.abs(np.asarray(probs) - float(center)),
                      kind="stable")


def save_embeddings(path, out: Dict[str, np.ndarray], *,
                    paths: Optional[List[str]] = None,
                    labels: Optional[np.ndarray] = None,
                    model: str = "", embedding: str = "") -> None:
    """Write an ``.npz`` embedding index: features + probs/preds (+ paths,
    + labels when embedding a labeled split) + provenance strings."""
    arrays = dict(out)
    if paths is not None:
        arrays["paths"] = np.asarray([str(p) for p in paths])
    if labels is not None:
        arrays["labels"] = np.asarray(labels, np.int32)
    arrays["model"] = np.asarray(model)
    arrays["embedding"] = np.asarray(embedding)
    np.savez_compressed(path, **arrays)


def load_embeddings(path) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
