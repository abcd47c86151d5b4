"""Result-artifact IO with reference-compatible formats.

The reference persists results as ``torch.save`` dicts (``test_results.pt``,
``results.pt``, ``tta_results.pt`` — reference notebooks/train_rgb_only.py:
372-379, extended_metrics.py:729-734, test_time_augmentation.py:535-539).
We keep the same file names and key layout so downstream consumers work
unchanged; torch (CPU) does the container IO only, with a pickle fallback
when torch is absent.  No torch op ever touches the compute path.
"""

from __future__ import annotations

import pickle
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


def save_pt(payload: Dict, path: Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = _to_saveable(payload)
    try:
        import torch
        torch.save(payload, path)
    except ImportError:
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    return path


def load_pt(path: Path) -> Dict:
    try:
        import torch
        return torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:
        with open(path, "rb") as f:
            return pickle.load(f)
