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
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax import traverse_util

CKPT_NAME = "best_model.msgpack"
META_NAME = "best_model.meta.json"
LAST_BASENAME = "last_model"     # per-epoch resume checkpoint (--save-last)


def _names(basename: str) -> Tuple[str, str]:
    return f"{basename}.msgpack", f"{basename}.meta.json"


def _to_numpy(tree: Any) -> Any:
    """Fetch a state tree to host numpy.  Multi-host sharded arrays
    (FSDP/TP over a multi-process mesh) are not fully addressable, so
    ``np.asarray`` alone would raise — gather them first.  The gather is
    a COLLECTIVE: every process must reach this call (the engine keeps
    non-writer processes participating with ``write=False`` saves)."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)


def save_checkpoint(directory: Path, *, epoch: int, model_state: Dict,
                    opt_state: Any, val_f1: float, history: Dict,
                    extra_meta: Optional[Dict] = None,
                    extra_state: Optional[Dict] = None,
                    basename: str = "best_model",
                    write: bool = True) -> Optional[Path]:
    """Write the best-model checkpoint, replacing any previous one.

    ``extra_state`` adds top-level payload trees (e.g. the EMA trainer's
    ``raw_params`` for exact mid-train resume); absent keys simply aren't
    in the payload, keeping old checkpoints loadable.

    ``write=False`` performs only the device->host fetch (whose shard
    gather is a collective on multi-host meshes) and skips all file IO —
    non-writer processes of a multi-host run call it this way so the
    collective stays synchronized while exactly one process touches the
    shared filesystem."""
    # to_state_dict converts optax namedtuple chains into plain nested
    # dicts that msgpack can serialize.
    payload = {
        "model_state": serialization.to_state_dict(_to_numpy(model_state)),
        "opt_state": serialization.to_state_dict(_to_numpy(opt_state)),
    }
    for key, tree in (extra_state or {}).items():
        payload[key] = serialization.to_state_dict(_to_numpy(tree))
    if not write:
        return None
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    ckpt_name, meta_name = _names(basename)
    path = directory / ckpt_name
    # atomic replace: these are multi-hundred-MB writes (262 s over the
    # tunnel at ViT scale; the async saver's thread dies abruptly at
    # interpreter exit) — an unlink-then-write would leave NO (or a
    # truncated) checkpoint if the process dies mid-save.  tmp + rename
    # keeps the previous best intact until the new bytes are durable;
    # the rename still replaces the previous best, like the reference.
    # clear orphans from crashed/killed earlier saves first (a daemon
    # async-save thread dies abruptly at interpreter exit and can leave
    # a pid-suffixed tmp behind; later runs have different pids and
    # would otherwise accumulate multi-hundred-MB leftovers).  Only
    # files older than an hour: a CONCURRENT writer's in-flight tmp
    # (e.g. an accidental double launch sharing the directory) must not
    # be yanked out from under its os.replace.
    import time as _time
    cutoff = _time.time() - 3600.0
    for pattern in (f".{ckpt_name}.tmp*", f".{meta_name}.tmp*"):
        for stale in directory.glob(pattern):
            try:
                if stale.stat().st_mtime < cutoff:
                    stale.unlink()
            except OSError:
                pass
    # Stage BOTH files fully before either replace, then issue the two
    # renames back-to-back: the crash window where the payload and its
    # meta sidecar disagree (new weights + the previous epoch's meta —
    # which would mislead resume_basename's epoch comparison and the
    # model card) shrinks from "serialize + json-dump the meta" to the
    # gap between two rename syscalls.  (True two-file atomicity would
    # need a directory swap; not worth it for that window.)
    meta = {"epoch": epoch, "val_f1": float(val_f1), "history": history}
    if extra_meta:
        meta.update(extra_meta)
    tmp = directory / f".{ckpt_name}.tmp{os.getpid()}"
    meta_tmp = directory / f".{meta_name}.tmp{os.getpid()}"
    try:
        tmp.write_bytes(serialization.msgpack_serialize(payload))
        meta_tmp.write_text(json.dumps(meta, indent=2))
        os.replace(tmp, path)
        os.replace(meta_tmp, directory / meta_name)
    except BaseException:
        for t in (tmp, meta_tmp):
            try:
                t.unlink()
            except OSError:
                pass
        raise
    return path


def load_checkpoint(directory: Path,
                    basename: str = "best_model") -> Tuple[Dict, Dict]:
    """Return (payload, meta). ``payload['model_state']`` is a raw numpy
    pytree (dict), usable directly or via :func:`load_flexible`."""
    directory = Path(directory)
    ckpt_name, meta_name = _names(basename)
    payload = serialization.msgpack_restore(
        (directory / ckpt_name).read_bytes())
    meta_path = directory / meta_name
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


def load_meta(directory: Path, basename: str = "best_model") -> Dict:
    meta_path = Path(directory) / _names(basename)[1]
    return json.loads(meta_path.read_text()) if meta_path.exists() else {}


def restore_opt_state(target_opt_state: Any, saved_opt_state: Dict) -> Any:
    """Rebuild a live optax state (namedtuple chain) from its saved
    state-dict form — enables true mid-train resume (a capability the
    reference lacks entirely: it saves optimizer state but never reads it,
    SURVEY.md §5 checkpoint row)."""
    return serialization.from_state_dict(target_opt_state, saved_opt_state)


def best_checkpoint_exists(directory: Path,
                           basename: str = "best_model") -> bool:
    return (Path(directory) / _names(basename)[0]).exists()


def resume_basename(directory: Path) -> Optional[str]:
    """Pick the checkpoint to resume from: the per-epoch ``last_model``
    (--save-last) when it is at least as recent as the best, else
    ``best_model``; None when neither exists."""
    directory = Path(directory)
    have_best = best_checkpoint_exists(directory)
    have_last = best_checkpoint_exists(directory, LAST_BASENAME)
    if have_last:
        if not have_best:
            return LAST_BASENAME
        best_ep = int(load_meta(directory).get("epoch", 0))
        last_ep = int(load_meta(directory, LAST_BASENAME).get("epoch", 0))
        return LAST_BASENAME if last_ep >= best_ep else "best_model"
    return "best_model" if have_best else None


class AsyncCheckpointer:
    """Overlap checkpoint writes with training (orbax-style async save).

    A best-model save costs a device→host fetch of the whole model +
    optimizer state plus a msgpack disk write — under the axon tunnel the
    fetch alone is seconds (30-60 MB/s link, docs/DESIGN.md), and the
    reference-scale run saves on most early epochs while val F1 climbs.
    :meth:`save` makes that cost invisible to the epoch loop:

    1. SYNCHRONOUSLY snapshot every device leaf with one jitted
       ``jnp.copy`` program (a single dispatch; on-device copies are HBM
       bandwidth, ~ms) — the snapshot owns fresh buffers, so the donated
       train state can be consumed by the next step immediately;
    2. fetch + serialize + write in a daemon thread via
       :func:`save_checkpoint`.

    At most one save is in flight: a new :meth:`save` (and :meth:`wait`)
    joins the previous one first, and any background exception re-raises
    on the caller's thread there. Call :meth:`wait` after the epoch loop
    so the final checkpoint is durable before the run returns.
    """

    def __init__(self):
        self._thread = None
        self._error: Optional[BaseException] = None
        self._snapshot = None     # jitted copy, built lazily

    def _snapshot_device(self, tree):
        import jax
        import jax.numpy as jnp
        if self._snapshot is None:
            self._snapshot = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t))
        return self._snapshot(tree)

    def save(self, directory: Path, *, epoch: int, model_state: Dict,
             opt_state: Any, val_f1: float, history: Dict,
             extra_meta: Optional[Dict] = None,
             extra_state: Optional[Dict] = None,
             basename: str = "best_model", write: bool = True) -> None:
        import copy
        import threading

        import jax as _jax
        if _jax.process_count() > 1:
            # the background fetch would run the multi-host shard-gather
            # collective on an unsynchronized daemon thread — refuse
            # rather than risk a cross-process collective mismatch (the
            # engine already falls back to synchronous saves here)
            raise RuntimeError(
                "async checkpointing is single-process only: the "
                "device->host fetch is a collective on multi-host "
                "meshes. Use synchronous save_checkpoint.")

        self.wait()
        snap_model, snap_opt = self._snapshot_device(
            (model_state, opt_state))
        snap_extra = (self._snapshot_device(extra_state)
                      if extra_state else None)
        # history mutates in place each epoch — freeze this epoch's view
        history = copy.deepcopy(history)

        def _write():
            try:
                save_checkpoint(directory, epoch=epoch,
                                model_state=snap_model, opt_state=snap_opt,
                                val_f1=val_f1, history=history,
                                extra_meta=extra_meta,
                                extra_state=snap_extra, basename=basename)
            except BaseException as e:          # re-raised in wait()
                self._error = e

        self._thread = threading.Thread(target=_write, name="ckpt-writer",
                                        daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight save; re-raise its failure, if any."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err
