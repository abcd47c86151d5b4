"""Result-artifact IO with reference-compatible formats.

The reference persists results as ``torch.save`` dicts (``test_results.pt``,
``results.pt``, ``tta_results.pt`` — reference notebooks/train_rgb_only.py:
372-379, extended_metrics.py:729-734, test_time_augmentation.py:535-539).
We keep the same file names and key layout so downstream consumers work
unchanged; torch (CPU) does the container IO only, and when torch is
absent the fallback writes torch's own ZIP container format (a zipfile
holding ``archive/data.pkl`` + ``archive/version``) so a downstream
``torch.load`` consumer — the reference ecosystem's tooling — can still
read the file.  No torch op ever touches the compute path.
"""

from __future__ import annotations

import pickle
import sys
import zipfile
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _to_saveable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_saveable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_saveable(v) for v in obj)
    if hasattr(obj, "__array__") and not np.isscalar(obj):
        return np.asarray(obj)
    return obj


def _save_torch_zip_without_torch(payload: Any, path: Path) -> None:
    """Write torch.save's ZIP container format directly: a zipfile with
    ``archive/data.pkl`` (an ordinary pickle — our payloads carry numpy
    arrays and plain Python values, never torch tensors, so no storage
    records are needed) plus the ``version``/``byteorder`` members
    torch's reader expects.  torch.load(..., weights_only=False) reads
    the result byte-for-byte like a torch-written file."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(payload, protocol=2))
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", sys.byteorder)


def _load_torch_zip_without_torch(path: Path) -> Any:
    """Read torch's ZIP container without torch: unpickle the archive's
    ``*/data.pkl``.  Only supports payloads without tensor storages (the
    kind this module writes); a tensor-bearing file raises so the caller
    knows torch is required for it."""
    with zipfile.ZipFile(path) as zf:
        names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if len(names) != 1:
            raise ValueError(f"{path}: not a torch ZIP archive "
                             f"(data.pkl candidates: {names})")

        class _NoStorageUnpickler(pickle.Unpickler):
            def persistent_load(self, pid):
                raise ValueError(
                    f"{path} contains torch tensor storages; loading "
                    "it requires torch")

        import io
        return _NoStorageUnpickler(io.BytesIO(zf.read(names[0]))).load()


def save_pt(payload: Dict, path: Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = _to_saveable(payload)
    try:
        import torch
        torch.save(payload, path)
    except ImportError:
        _save_torch_zip_without_torch(payload, path)
    return path


def load_pt(path: Path) -> Dict:
    # Pre-round-3 files were written as raw pickles (no ZIP container);
    # torch.load raises an invalid-magic RuntimeError on those even when
    # torch is installed, so route by container format first rather than
    # by torch availability.
    if not zipfile.is_zipfile(path):
        with open(path, "rb") as f:      # pre-round-3 raw-pickle files
            return pickle.load(f)
    try:
        import torch
        return torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:
        return _load_torch_zip_without_torch(path)
