"""Checkpoint save/load with the reference's logical contract.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict,
val_f1, history}`` for the best-by-val-F1 epoch only, unlinking the previous
best (reference notebooks/train_rgb_only.py:310-328), and loads with
``backbone.*`` key remapping + shape-mismatch head skipping
(extended_metrics.py:40-92).

Here checkpoints are Orbax-style pytrees written via msgpack
(`flax.serialization`) — a single portable file per checkpoint — plus a JSON
metadata sidecar. ``load_flexible`` reproduces the reference's
skip-mismatched-head behavior for our own trees.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax import traverse_util

CKPT_NAME = "best_model.msgpack"
META_NAME = "best_model.meta.json"


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: Path, *, epoch: int, model_state: Dict,
                    opt_state: Any, val_f1: float, history: Dict,
                    extra_meta: Optional[Dict] = None,
                    extra_state: Optional[Dict] = None) -> Path:
    """Write the best-model checkpoint, replacing any previous one.

    ``extra_state`` adds top-level payload trees (e.g. the EMA trainer's
    ``raw_params`` for exact mid-train resume); absent keys simply aren't
    in the payload, keeping old checkpoints loadable."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    # to_state_dict converts optax namedtuple chains into plain nested
    # dicts that msgpack can serialize.
    payload = {
        "model_state": serialization.to_state_dict(_to_numpy(model_state)),
        "opt_state": serialization.to_state_dict(_to_numpy(opt_state)),
    }
    for key, tree in (extra_state or {}).items():
        payload[key] = serialization.to_state_dict(_to_numpy(tree))
    path = directory / CKPT_NAME
    if path.exists():
        path.unlink()                     # previous best unlinked, like the ref
    path.write_bytes(serialization.msgpack_serialize(payload))

    meta = {"epoch": epoch, "val_f1": float(val_f1), "history": history}
    if extra_meta:
        meta.update(extra_meta)
    (directory / META_NAME).write_text(json.dumps(meta, indent=2))
    return path


def load_checkpoint(directory: Path) -> Tuple[Dict, Dict]:
    """Return (payload, meta). ``payload['model_state']`` is a raw numpy
    pytree (dict), usable directly or via :func:`load_flexible`."""
    directory = Path(directory)
    payload = serialization.msgpack_restore(
        (directory / CKPT_NAME).read_bytes())
    meta_path = directory / META_NAME
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return payload, meta


def load_flexible(target: Dict, saved: Dict, verbose: bool = True
                  ) -> Tuple[Dict, int, int]:
    """Merge ``saved`` into ``target`` (both nested dict pytrees), skipping
    keys that are absent or shape-mismatched — mismatched classifier heads
    keep their fresh init, like the reference's flexible loader
    (extended_metrics.py:69-92). Returns (merged, n_loaded, n_skipped)."""
    flat_target = traverse_util.flatten_dict(target)
    flat_saved = traverse_util.flatten_dict(saved)
    loaded = skipped = 0
    merged = dict(flat_target)
    for key, value in flat_saved.items():
        if key not in flat_target:
            skipped += 1
            continue
        if tuple(np.shape(value)) != tuple(np.shape(flat_target[key])):
            skipped += 1
            continue
        merged[key] = value
        loaded += 1
    if verbose:
        print(f"  Loaded {loaded} arrays from checkpoint"
              + (f"; skipped {skipped}" if skipped else ""))
    return traverse_util.unflatten_dict(merged), loaded, skipped


def load_meta(directory: Path) -> Dict:
    meta_path = Path(directory) / META_NAME
    return json.loads(meta_path.read_text()) if meta_path.exists() else {}


def restore_opt_state(target_opt_state: Any, saved_opt_state: Dict) -> Any:
    """Rebuild a live optax state (namedtuple chain) from its saved
    state-dict form — enables true mid-train resume (a capability the
    reference lacks entirely: it saves optimizer state but never reads it,
    SURVEY.md §5 checkpoint row)."""
    return serialization.from_state_dict(target_opt_state, saved_opt_state)


def best_checkpoint_exists(directory: Path) -> bool:
    return (Path(directory) / CKPT_NAME).exists()
