"""Host-side data loading: decode once, then feed HBM asynchronously.

The reference re-decodes and re-augments every JPEG in 4 DataLoader worker
processes every epoch (reference notebooks/train_rgb_only.py:191-195).  The
datasets here are small (≈10³ images, ≈300 MB at 224² uint8), so the
TPU-native design decodes + resizes each image exactly once into a pinned
uint8 numpy cache, samples index batches on host, and streams slices to the
device with a depth-``prefetch`` async queue (``jax.device_put`` is
asynchronous, so transfer overlaps the previous step's compute).
Augmentation happens on device (:mod:`dfu_multimodal_tpu.data.transforms`).

Multi-host ready: batches can be sharded by ``jax.process_index`` — each
process loads only its shard of every batch and ``device_put`` with a
``NamedSharding`` forms the global array (SURVEY.md §2.3).
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from dfu_multimodal_tpu.data import pairing as pairing_mod
from dfu_multimodal_tpu.data.layout import SplitIndex, scan_split


def load_image(path: Path, image_size: int) -> np.ndarray:
    """Decode -> RGB -> bilinear resize to (image_size, image_size), uint8.
    Matches torchvision ``Resize((S, S))`` + ``Image.convert('RGB')``
    (reference train_rgb_only.py:91, 102-103)."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


@dataclass
class ArrayDataset:
    """Fully-decoded in-memory dataset: ``arrays[modality]`` is
    (N, S, S, 3) uint8; one shared label vector."""

    arrays: Dict[str, np.ndarray]
    labels: np.ndarray
    paths: Dict[str, List[Optional[Path]]] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.labels)

    @property
    def modalities(self) -> List[str]:
        return list(self.arrays)

    @property
    def class_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=2)


def decode_all(paths: Sequence[Optional[Path]], image_size: int,
               cache_dir: Optional[Path] = None) -> np.ndarray:
    """Decode a path list into an (N, S, S, 3) uint8 cache.

    Fast path: the native threaded libjpeg decoder
    (``native.decode_jpegs_resized``) — bit-identical to the PIL path
    (its resize reproduces PIL's fixed-point BILINEAR resample; parity
    tested in tests/test_data.py) and parallel across files.  Any file
    the native decoder rejects (PNG, CMYK, corrupt) and any environment
    without g++/libjpeg falls back to :func:`load_image` per file.
    ``DFU_NATIVE_DECODE=0`` disables the native path entirely.

    With a cache directory (``cache_dir=`` or the ``DFU_CACHE_DIR`` env
    var / ``--cache-dir`` flag), decoding routes through the persistent
    mmap-backed cache (:mod:`dfu_multimodal_tpu.data.cache`): decode once
    across runs, bounded RAM, datasets larger than memory."""
    from dfu_multimodal_tpu.data import cache as cache_mod

    resolved = cache_mod.resolve_cache_dir(cache_dir)
    if resolved is not None:
        return cache_mod.cached_decode(paths, image_size, resolved)
    return decode_raw(paths, image_size)


def decode_raw(paths: Sequence[Optional[Path]],
               image_size: int) -> np.ndarray:
    """The uncached decode behind :func:`decode_all` (and the cache
    builder's chunk decoder — it must never re-enter the cache)."""
    import os

    out = np.zeros((len(paths), image_size, image_size, 3), np.uint8)
    todo = [i for i, p in enumerate(paths) if p is not None]
    # None = missing-modality black placeholder
    if todo and os.environ.get("DFU_NATIVE_DECODE", "1") != "0":
        try:
            from dfu_multimodal_tpu import native

            imgs, status = native.decode_jpegs_resized(
                [str(paths[i]) for i in todo], image_size)
            ok = status == 0
            out[np.asarray(todo)[ok]] = imgs[ok]
            todo = [i for i, good in zip(todo, ok) if not good]
        except (ImportError, OSError):
            pass                 # no compiler / no libjpeg: pure PIL
    for i in todo:
        out[i] = load_image(paths[i], image_size)
    return out


def load_single_modality(modality_dir: Path, split: str,
                         image_size: int = 224,
                         modality: str = "rgb",
                         cache_dir: Optional[Path] = None) -> ArrayDataset:
    """Single-modality dataset (RGBDataset/ThermalDataset contract,
    train_rgb_only.py:55-97)."""
    index: SplitIndex = scan_split(Path(modality_dir), split)
    return ArrayDataset(
        arrays={modality: decode_all(index.paths, image_size,
                                     cache_dir=cache_dir)},
        labels=np.asarray(index.labels, np.int32),
        paths={modality: list(index.paths)},
    )


def load_paired(data_dir: Path, split: str, image_size: int = 224,
                strategy: str = "aligned",
                seed: Optional[int] = None,
                cache_dir: Optional[Path] = None) -> ArrayDataset:
    """Paired dataset. ``strategy='aligned'`` = DFUPairedDataset semantics
    (truncate-to-min); ``'pseudo'`` = MultimodalDataset modulo cycling."""
    data_dir = Path(data_dir)
    rgb_by_class = scan_split(data_dir / "rgb", split).by_class()
    th_by_class = scan_split(data_dir / "thermal", split).by_class()
    rgb_counts = [len(rgb_by_class[c]) for c in (0, 1)]
    th_counts = [len(th_by_class[c]) for c in (0, 1)]

    if strategy == "aligned":
        pairs = pairing_mod.aligned_pairs(rgb_counts, th_counts)
    elif strategy == "pseudo":
        pairs = pairing_mod.pseudo_pairs(rgb_counts, th_counts, seed=seed)
    elif strategy == "random":
        pairs = pairing_mod.random_pairs(rgb_counts, th_counts, seed=seed)
    else:
        raise ValueError(f"unknown pairing strategy {strategy!r}")

    rgb_paths = [rgb_by_class[p.label][p.rgb] if p.rgb is not None else None
                 for p in pairs]
    th_paths = [th_by_class[p.label][p.thermal] if p.thermal is not None
                else None for p in pairs]
    labels = np.asarray([p.label for p in pairs], np.int32)

    return ArrayDataset(
        arrays={"rgb": decode_all(rgb_paths, image_size,
                                  cache_dir=cache_dir),
                "thermal": decode_all(th_paths, image_size,
                                      cache_dir=cache_dir)},
        labels=labels,
        paths={"rgb": rgb_paths, "thermal": th_paths},
    )


def get_dataloaders(data_dir: Path, batch_size: int = 12,
                    image_size: int = 224, strategy: str = "aligned",
                    seed: Optional[int] = None, modality: str = "both"):
    """Convenience: datasets + batch-iterator factories per split — the
    reference's ``get_dataloaders`` contract (scripts/dataloader.py:203-244)
    expressed as (datasets, make_batches(split, rng)).

    ``modality`` reproduces the early-files surface
    (scripts/early files/dataloader.py:210-262): ``"both"`` (default)
    pairs the modalities; ``"rgb"``/``"thermal"`` return single-modality
    datasets, and — as in that lineage — eval splits batch at
    ``max(16, batch_size // 2)``.

    ``make_batches`` yields fixed-shape masked batch dicts; training splits
    shuffle, eval splits are sequential.
    """
    if modality not in ("rgb", "thermal", "both"):
        raise ValueError(f"Unknown modality: {modality}")
    if modality == "both":
        datasets = {split: load_paired(data_dir, split, image_size,
                                       strategy=strategy, seed=seed)
                    for split in ("train", "val", "test")}
    else:
        datasets = {split: load_single_modality(
            Path(data_dir) / modality, split, image_size, modality)
            for split in ("train", "val", "test")}

    # ONE persistent generator across make_batches calls: the reference
    # DataLoader(shuffle=True) reshuffles every epoch, so consecutive
    # calls must advance the stream — re-seeding per call would hand
    # every epoch the identical batch order
    default_rng = np.random.default_rng(seed)

    def make_batches(split: str, rng: Optional[np.random.Generator] = None):
        ds = datasets[split]
        bs = batch_size
        if split == "train":
            rng = rng or default_rng
            order = rng.permutation(len(ds))
        else:
            order = np.arange(len(ds))
            if modality != "both":
                bs = max(16, batch_size // 2)
        return batch_slices(ds, order, bs)

    return datasets, make_batches


def sample_weights(labels: np.ndarray) -> np.ndarray:
    """Per-sample inverse-class-frequency weights — the reference's
    WeightedRandomSampler input (train_rgb_only.py:181-190)."""
    counts = np.bincount(labels, minlength=2).astype(np.float64)
    w = np.zeros(len(labels), np.float64)
    for c, n in enumerate(counts):
        if n > 0:
            w[labels == c] = 1.0 / n
    return w


def epoch_indices(labels: np.ndarray, rng: np.random.Generator,
                  weighted: bool = True) -> np.ndarray:
    """One epoch's sample order: weighted-with-replacement (reference
    sampler semantics, num_samples=len) or a plain shuffle."""
    n = len(labels)
    if weighted:
        w = sample_weights(labels)
        total = w.sum()
        if n == 0 or total <= 0:
            raise ValueError(
                f"cannot draw an epoch from {n} samples (weight sum "
                f"{total}): the dataset directory is empty or every class "
                "count is zero")
        return rng.choice(n, size=n, replace=True, p=w / total)
    return rng.permutation(n)


def batch_slices(dataset: ArrayDataset, order: np.ndarray, batch_size: int,
                 pad_to_batch: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Yield fixed-shape batch dicts with a ``valid`` mask.

    Fixed shapes keep the jitted step from recompiling on ragged final
    batches; invalid rows are masked out of loss and metrics.
    """
    n = len(order)
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        valid_n = len(idx)
        if valid_n < batch_size and pad_to_batch:
            idx = np.concatenate([idx, np.zeros(batch_size - valid_n,
                                                idx.dtype)])
        batch = {m: arr[idx] for m, arr in dataset.arrays.items()}
        batch["label"] = dataset.labels[idx].astype(np.int32)
        valid = np.zeros(len(idx), np.float32)
        valid[:valid_n] = 1.0
        batch["valid"] = valid
        yield batch


def device_prefetch(batches: Iterator[Dict[str, np.ndarray]],
                    sharding=None, depth: int = 2
                    ) -> Iterator[Dict[str, "np.ndarray"]]:
    """Double-buffered host->device transfer: keep ``depth`` batches in
    flight so the H2D DMA overlaps the previous step's compute.

    Multi-host: when ``jax.process_count() > 1`` each process feeds only
    its slice of the (identically-generated) host-global batch and the
    global array is stitched with ``jax.make_array_from_process_local_data``
    — every process must therefore iterate the SAME batch stream (same
    dataset + same epoch rng seed), which the Trainer guarantees by seeding
    from the config (SURVEY.md §2.3 multi-host row)."""
    import jax

    queue: collections.deque = collections.deque()
    multiproc = sharding is not None and jax.process_count() > 1

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if not multiproc:
            return jax.device_put(batch, sharding)
        from dfu_multimodal_tpu.parallel.mesh import process_shard
        n = len(batch["valid"])
        if n % jax.process_count():
            raise ValueError(
                f"global batch size {n} must divide evenly over "
                f"{jax.process_count()} processes — pick a batch size "
                "divisible by process_count (pad_batch_to_mesh already "
                "rounds to the data axis)")
        lo, hi = process_shard(n)
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(v[lo:hi]), v.shape)
                for k, v in batch.items()}

    for batch in batches:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
