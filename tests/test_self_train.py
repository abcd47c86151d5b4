"""Semi-supervised self-training (train/self_train.py + cli/self_train.py):
selection semantics, loop mechanics, CLI end-to-end on synthetic data."""

import json
from pathlib import Path

import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.train.self_train import (SelfTrainConfig, combine,
                                                 select_confident,
                                                 self_train)


# ------------------------------------------------------------- selection


def test_select_confident_threshold_and_order():
    probs = np.array([[0.95, 0.05],    # confident healthy
                      [0.30, 0.70],    # below threshold
                      [0.08, 0.92],    # confident ulcer
                      [0.99, 0.01],    # most-confident healthy
                      [0.05, 0.95]])   # most-confident ulcer
    idx, labels = select_confident(probs, threshold=0.9, balance=False)
    assert set(idx.tolist()) == {0, 2, 3, 4}
    # most-confident first within each class
    healthy = [i for i, l in zip(idx, labels) if l == 0]
    assert healthy == [3, 0]
    assert set(labels.tolist()) == {0, 1}


def test_select_confident_balanced_and_capped():
    probs = np.array([[0.99, 0.01], [0.98, 0.02], [0.97, 0.03],
                      [0.04, 0.96]])
    idx, labels = select_confident(probs, 0.9, balance=True)
    # 3 confident healthy vs 1 confident ulcer -> balanced to 1+1
    assert np.sum(labels == 0) == 1 and np.sum(labels == 1) == 1
    assert 0 in idx            # the MOST confident healthy survives
    idx, labels = select_confident(probs, 0.9, max_per_class=2,
                                   balance=False)
    assert np.sum(labels == 0) == 2 and np.sum(labels == 1) == 1


def test_select_confident_empty():
    probs = np.full((4, 2), 0.5)
    idx, labels = select_confident(probs, 0.9)
    assert len(idx) == 0 and len(labels) == 0


def test_combine_appends_pseudo_rows():
    labeled = ArrayDataset(
        arrays={"rgb": np.zeros((3, 8, 8, 3), np.uint8)},
        labels=np.array([0, 1, 0], np.int32),
        paths={"rgb": ["a", "b", "c"]})
    pool = {"rgb": np.ones((5, 8, 8, 3), np.uint8)}
    out = combine(labeled, pool, {"rgb": list("vwxyz")},
                  np.array([4, 1]), np.array([1, 0], np.int32))
    assert len(out) == 5
    assert out.labels.tolist() == [0, 1, 0, 1, 0]
    assert out.paths["rgb"] == ["a", "b", "c", "z", "w"]
    assert out.arrays["rgb"][3:].max() == 1
    # empty selection is the identity
    same = combine(labeled, pool, {"rgb": list("vwxyz")},
                   np.zeros(0, np.int64), np.zeros(0, np.int32))
    assert same is labeled


# ------------------------------------------------------------------ loop


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("selftrain_synth")
    make_synthetic_dataset(root, images_per_class=20, size=32)
    return root


def test_self_train_loop_learns_and_reports(synth_root, tmp_path):
    full = load_single_modality(synth_root / "rgb", "train", 32, "rgb")
    # 4 labeled images; the rest become the unlabeled pool
    rng = np.random.default_rng(0)
    keep = np.concatenate([rng.permutation(np.where(full.labels == c)[0])[:2]
                           for c in (0, 1)])
    rest = np.setdiff1d(np.arange(len(full)), keep)
    take = lambda ds, ix: ArrayDataset(
        arrays={m: a[ix] for m, a in ds.arrays.items()},
        labels=ds.labels[ix],
        paths={m: [p[i] for i in ix] for m, p in ds.paths.items()})
    labeled, pool = take(full, keep), take(full, rest)
    val = load_single_modality(synth_root / "rgb", "val", 32, "rgb")

    cfg = config.TrainConfig(batch_size=4, num_epochs=3,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    st = SelfTrainConfig(rounds=2, threshold=0.8)
    trainer, state, report = self_train(
        "tiny_rgb", st, cfg, {"rgb": config.rgb_modality()}, labeled,
        pool, val, tmp_path / "ck", log=lambda s: None)
    assert len(report) == 2
    assert report[0]["n_labeled"] == 4 and report[0]["n_pseudo"] == 0
    # round 1 adopted something and round 2 trained on it
    assert "adopted" in report[0]
    assert report[1]["n_pseudo"] == (report[0]["adopted"]["healthy"]
                                     + report[0]["adopted"]["ulcer"])
    # the winning round's checkpoint was promoted
    assert (tmp_path / "ck" / "best_model.msgpack").exists()
    m, _ = trainer.run_eval_epoch(state, val)
    assert np.isfinite(m.f1)


def test_self_train_rejects_multimodal():
    ds = ArrayDataset(arrays={"rgb": np.zeros((2, 8, 8, 3), np.uint8),
                              "thermal": np.zeros((2, 8, 8, 3), np.uint8)},
                      labels=np.zeros(2, np.int32))
    with pytest.raises(ValueError, match="single-modality"):
        self_train("multimodal", SelfTrainConfig(), config.TrainConfig(),
                   {"rgb": config.rgb_modality()}, ds, ds, ds,
                   Path("/tmp/x"))


# ------------------------------------------------------------------- CLI


def test_self_train_cli_smoke(synth_root, tmp_path):
    from dfu_multimodal_tpu.cli import self_train as cli

    # unlabeled pool dir = flat copies of some train images
    pool_dir = tmp_path / "pool"
    pool_dir.mkdir()
    import shutil
    src = list((synth_root / "rgb" / "train").rglob("*.jpg"))[:10]
    for i, f in enumerate(src):
        shutil.copy2(f, pool_dir / f"img_{i}.jpg")

    rc = cli.main(["--data-dir", str(synth_root),
                   "--unlabeled-dir", str(pool_dir),
                   "--modality", "rgb", "--model", "tiny_rgb",
                   "--image-size", "32", "--rounds", "2",
                   "--threshold", "0.8", "--epochs", "2",
                   "--batch-size", "4", "--compute-dtype", "float32",
                   "--checkpoint-root", str(tmp_path / "logs")])
    assert rc == 0
    rep = json.loads((tmp_path / "logs" /
                      "checkpoints_tiny_rgb_selftrain" /
                      "self_train_report.json").read_text())
    assert rep["model"] == "tiny_rgb" and len(rep["rounds"]) == 2
