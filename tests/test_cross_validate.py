"""K-fold cross-validation harness (cli/cross_validate.py)."""

import numpy as np
import pytest

from dfu_multimodal_tpu.cli.cross_validate import (grouped_folds,
                                                   stratified_folds)


def test_stratified_folds_partition_and_balance():
    labels = np.array([0] * 30 + [1] * 20)
    rng = np.random.default_rng(0)
    folds = stratified_folds(labels, 5, rng)
    allidx = np.sort(np.concatenate(folds))
    np.testing.assert_array_equal(allidx, np.arange(50))   # exact partition
    for f in folds:
        counts = np.bincount(labels[f], minlength=2)
        assert counts[0] == 6 and counts[1] == 4           # perfectly even

    # deterministic in the rng seed
    again = stratified_folds(labels, 5, np.random.default_rng(0))
    for a, b in zip(folds, again):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="folds"):
        stratified_folds(labels, 1, rng)


def test_grouped_folds_keep_groups_whole():
    # 12 groups of 4 rows; group g covers rows 4g..4g+3
    labels = np.tile([0, 0, 1, 1], 12)
    groups = [f"g{i // 4}" for i in range(48)]
    folds = grouped_folds(labels, groups, 4, np.random.default_rng(1))
    allidx = np.sort(np.concatenate(folds))
    np.testing.assert_array_equal(allidx, np.arange(48))
    for f in folds:
        seen = {groups[i] for i in f}
        for g in seen:   # every member of the group is inside this fold
            members = [i for i in range(48) if groups[i] == g]
            assert set(members) <= set(f.tolist())
    sizes = sorted(len(f) for f in folds)
    assert sizes == [12, 12, 12, 12]                       # balanced greedy


def test_grouped_folds_reject_too_few_groups():
    labels = np.array([0, 1, 0, 1])
    groups = ["a", "a", "b", "b"]
    with pytest.raises(ValueError, match="empty fold"):
        grouped_folds(labels, groups, 3, np.random.default_rng(0))


def test_cross_validate_cli_smoke(tmp_path):
    """2-fold CV on the synthetic dataset with the tiny model: runs end to
    end, prints the summary, writes cv_results.pt with per-fold metrics."""
    from dfu_multimodal_tpu.cli.cross_validate import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset
    from dfu_multimodal_tpu.utils.artifacts import load_pt

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    summary = main(["--data-dir", str(data),
                    "--checkpoint-root", str(tmp_path / "logs"),
                    "--modality", "rgb", "--model", "tiny_rgb",
                    "--folds", "2", "--epochs", "2", "--lr", "3e-3",
                    "--batch-size", "8", "--image-size", "32",
                    "--compute-dtype", "float32", "--seed", "0"])
    assert 0.0 <= summary["accuracy"]["mean"] <= 1.0
    assert len(summary["f1"]["folds"]) == 2

    saved = load_pt(tmp_path / "logs" / "cross_validation_rgb"
                    / "cv_results.pt")
    assert len(saved["fold_metrics"]) == 2
    assert saved["config"]["folds"] == 2
    # folds partition the pooled train+val rows
    folds = saved["folds"]["rgb"]
    allidx = sorted(i for f in folds for i in f)
    assert allidx == list(range(len(folds[0]) + len(folds[1])))


def test_cross_validate_cli_grouped_smoke(tmp_path):
    from dfu_multimodal_tpu.cli.cross_validate import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    summary = main(["--data-dir", str(data),
                    "--checkpoint-root", str(tmp_path / "logs"),
                    "--modality", "rgb", "--model", "tiny_rgb",
                    "--folds", "2", "--epochs", "1", "--batch-size", "8",
                    "--image-size", "32", "--compute-dtype", "float32",
                    "--group-by-patient", "--group-size", "3"])
    assert "accuracy" in summary


def test_pair_pools_pseudo_pairing_semantics():
    """pair_pools reproduces the modulo-cycling contract on array pools:
    max(n_rgb, n_th) pairs per class, rows drawn only from the given
    index sets."""
    from dfu_multimodal_tpu.cli.cross_validate import pair_pools
    from dfu_multimodal_tpu.data.loader import ArrayDataset

    def mk(n0, n1, mod):
        n = n0 + n1
        labels = np.array([0] * n0 + [1] * n1, np.int32)
        arrays = {mod: np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1)
                  * np.ones((1, 2, 2, 3), np.uint8)}
        return ArrayDataset(arrays=arrays, labels=labels)

    rgb = mk(6, 4, "rgb")
    th = mk(3, 5, "thermal")
    rgb_idx = np.arange(len(rgb))
    th_idx = np.arange(len(th))
    ds = pair_pools(rgb, th, rgb_idx, th_idx, seed=0)
    counts = np.bincount(ds.labels, minlength=2)
    assert counts[0] == max(6, 3) and counts[1] == max(4, 5)
    assert set(ds.arrays) == {"rgb", "thermal"}
    # restricted index sets: only those rows may appear
    ds2 = pair_pools(rgb, th, np.array([0, 6]), np.array([0, 3]), seed=0)
    assert set(np.unique(ds2.arrays["rgb"])) <= {0, 6}
    assert set(np.unique(ds2.arrays["thermal"])) <= {0, 3}


def test_cross_validate_cli_multimodal_smoke(tmp_path):
    from dfu_multimodal_tpu.cli.cross_validate import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset
    from dfu_multimodal_tpu.utils.artifacts import load_pt

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    summary = main(["--data-dir", str(data),
                    "--checkpoint-root", str(tmp_path / "logs"),
                    "--modality", "multimodal", "--model", "tiny_rgb",
                    "--folds", "2", "--epochs", "1", "--batch-size", "8",
                    "--image-size", "32", "--compute-dtype", "float32"])
    assert 0.0 <= summary["accuracy"]["mean"] <= 1.0
    saved = load_pt(tmp_path / "logs" / "cross_validation_multimodal"
                    / "cv_results.pt")
    assert set(saved["folds"]) == {"rgb", "thermal"}


def test_grouped_folds_spread_minority_class():
    """Class-aware group dealing: when the minority class lives in >= k
    groups, every fold gets minority rows (the size-only greedy could
    pile them into one fold and leave single-class folds)."""
    # 8 groups of 4 rows; only groups g0..g3 contain ulcers (one each)
    labels = np.array([1, 0, 0, 0] * 4 + [0, 0, 0, 0] * 4)
    groups = [f"g{i // 4}" for i in range(32)]
    folds = grouped_folds(labels, groups, 4, np.random.default_rng(0))
    for f in folds:
        assert labels[f].sum() >= 1, "a fold got zero minority rows"
    sizes = sorted(len(f) for f in folds)
    assert sizes == [8, 8, 8, 8]


def test_cross_validate_cli_cosine_schedule(tmp_path):
    """--lr-schedule cosine must work like in the train CLIs (per-fold
    steps_per_epoch derivation) instead of raising at fold 1."""
    from dfu_multimodal_tpu.cli.cross_validate import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=8, size=32)
    summary = main(["--data-dir", str(data),
                    "--checkpoint-root", str(tmp_path / "logs"),
                    "--modality", "rgb", "--model", "tiny_rgb",
                    "--folds", "2", "--epochs", "2", "--lr", "3e-3",
                    "--batch-size", "8", "--image-size", "32",
                    "--compute-dtype", "float32", "--seed", "0",
                    "--lr-schedule", "cosine", "--warmup-epochs", "1"])
    assert 0.0 <= summary["accuracy"]["mean"] <= 1.0
