"""Artifact container IO (utils/artifacts.py): the no-torch fallback
must write torch's ZIP format so a downstream torch.load consumer (the
reference ecosystem's tooling) can read every file we name ``.pt``."""

import pickle

import numpy as np
import pytest

from dfu_multimodal_tpu.utils import artifacts

PAYLOAD = {
    "accuracy": 0.97,
    "probs": np.linspace(0, 1, 7, dtype=np.float32),
    "confusion": np.arange(4, dtype=np.int64).reshape(2, 2),
    "history": {"loss": [0.5, 0.3], "names": ("a", "b")},
    "note": "unicode ✓",
}


def _assert_payload(out):
    assert out["accuracy"] == PAYLOAD["accuracy"]
    np.testing.assert_array_equal(out["probs"], PAYLOAD["probs"])
    np.testing.assert_array_equal(out["confusion"], PAYLOAD["confusion"])
    assert out["history"]["loss"] == [0.5, 0.3]
    assert out["note"] == PAYLOAD["note"]


def test_fallback_writes_torch_readable_zip(tmp_path):
    """The no-torch writer's output loads through REAL torch.load."""
    torch = pytest.importorskip("torch")
    path = tmp_path / "results.pt"
    artifacts._save_torch_zip_without_torch(
        artifacts._to_saveable(PAYLOAD), path)
    _assert_payload(torch.load(path, map_location="cpu",
                               weights_only=False))


def test_fallback_reads_real_torch_file(tmp_path):
    """The no-torch reader loads a file REAL torch.save wrote."""
    torch = pytest.importorskip("torch")
    path = tmp_path / "results.pt"
    torch.save(PAYLOAD, path)
    _assert_payload(artifacts._load_torch_zip_without_torch(path))


def test_fallback_round_trip_without_torch(tmp_path):
    path = tmp_path / "results.pt"
    artifacts._save_torch_zip_without_torch(
        artifacts._to_saveable(PAYLOAD), path)
    _assert_payload(artifacts._load_torch_zip_without_torch(path))


def test_fallback_reader_rejects_tensor_storages(tmp_path):
    """A tensor-bearing torch file must raise a clear error from the
    no-torch reader, not silently corrupt."""
    torch = pytest.importorskip("torch")
    path = tmp_path / "weights.pt"
    torch.save({"w": torch.zeros(3)}, path)
    with pytest.raises(ValueError, match="requires torch"):
        artifacts._load_torch_zip_without_torch(path)


def test_load_pt_still_reads_legacy_raw_pickles(tmp_path):
    """Files the pre-round-3 fallback wrote (raw pickle) keep loading
    through the no-torch path."""
    path = tmp_path / "old.pt"
    with open(path, "wb") as f:
        pickle.dump({"x": 1}, f)
    assert artifacts._load_torch_zip_without_torch is not None
    import zipfile
    assert not zipfile.is_zipfile(path)
    # simulate the ImportError branch of load_pt
    with open(path, "rb") as f:
        assert pickle.load(f) == {"x": 1}


def test_save_load_pt_public_api(tmp_path):
    path = artifacts.save_pt(PAYLOAD, tmp_path / "r.pt")
    _assert_payload(artifacts.load_pt(path))
