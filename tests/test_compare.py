"""Paired model comparison (eval/compare.py + cli/compare.py):
McNemar exact oracle values, flip-table accounting, paired-bootstrap
delta semantics, and the CLI end-to-end incl. the cross-family
(single-modality vs fusion) union-dataset path."""

import json

import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_paired, load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.eval.compare import (compare_models, flip_table,
                                             mcnemar_exact,
                                             paired_bootstrap_deltas)
from dfu_multimodal_tpu.train.engine import Trainer

# ---------------------------------------------------------------- McNemar


def test_mcnemar_no_discordant_pairs_is_one():
    assert mcnemar_exact(0, 0) == 1.0


def test_mcnemar_exact_oracle():
    # n=6 discordant, k=1: p = 2*(C(6,0)+C(6,1))/2^6 = 14/64
    assert mcnemar_exact(5, 1) == pytest.approx(14 / 64)
    # symmetric in its arguments
    assert mcnemar_exact(1, 5) == mcnemar_exact(5, 1)
    # balanced discordance can never be significant (capped at 1)
    assert mcnemar_exact(3, 3) == 1.0
    # one-sided sweep: 15-0 split is overwhelming evidence
    assert mcnemar_exact(15, 0) == pytest.approx(2 / 2 ** 15)


def test_mcnemar_rejects_negative_counts():
    with pytest.raises(ValueError):
        mcnemar_exact(-1, 2)


# ------------------------------------------------------------- flip table


def test_flip_table_partitions_rows():
    y = np.array([0, 0, 1, 1, 1, 0])
    pa = np.array([0, 1, 1, 0, 1, 0])   # correct on rows 0,2,4,5
    pb = np.array([0, 0, 0, 1, 1, 1])   # correct on rows 0,1,3,4
    f = flip_table(y, pa, pb)
    assert f["both_correct"] == 2        # rows 0, 4
    assert f["only_a"] == 2              # rows 2, 5
    assert f["only_b"] == 2              # rows 1, 3
    assert f["both_wrong"] == 0
    assert sum(f[k] for k in ("both_correct", "only_a", "only_b",
                              "both_wrong")) == len(y)
    assert f["n_flips"] == int(np.sum(pa != pb))


# ------------------------------------------------- paired bootstrap deltas


def _toy(n=80, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.arange(n) % 2).astype(np.int64)
    probs_b = np.where(y == 1, 0.9, 0.1) + rng.normal(0, 0.02, n)
    pred_b = (probs_b > 0.5).astype(np.int64)        # perfect
    pred_a = pred_b.copy()
    flip = rng.choice(n, size=n // 4, replace=False)  # A wrong on 25%
    pred_a[flip] = 1 - pred_a[flip]
    probs_a = np.where(pred_a == 1, 0.8, 0.2)
    return y, pred_a, probs_a, pred_b, probs_b


def test_identical_models_have_zero_delta():
    y, pa, qa, _, _ = _toy()
    out = paired_bootstrap_deltas(y, pa, qa, pa, qa, n_boot=200, seed=1)
    for k, v in out.items():
        if k == "_meta":
            continue
        assert v["delta"] == 0.0
        assert v["lo"] == 0.0 and v["hi"] == 0.0
        assert not v["significant"]


def test_clear_improvement_is_significant():
    y, pa, qa, pb, qb = _toy()
    out = paired_bootstrap_deltas(y, pa, qa, pb, qb, n_boot=500, seed=1)
    acc = out["accuracy"]
    assert acc["delta"] == pytest.approx(0.25)
    assert acc["significant"] and acc["lo"] > 0


def test_deltas_deterministic_by_seed():
    y, pa, qa, pb, qb = _toy()
    r1 = paired_bootstrap_deltas(y, pa, qa, pb, qb, n_boot=100, seed=7)
    r2 = paired_bootstrap_deltas(y, pa, qa, pb, qb, n_boot=100, seed=7)
    assert r1 == r2


def test_auc_keys_dropped_without_probs():
    y, pa, _, pb, _ = _toy()
    out = paired_bootstrap_deltas(y, pa, None, pb, None, n_boot=50)
    assert not any(k.startswith("auc") for k in out)
    assert "accuracy" in out


def test_compare_models_report_consistency():
    y, pa, qa, pb, qb = _toy()
    rep = compare_models(y, pa, qa, pb, qb, n_boot=100, seed=3)
    f = rep["flip_table"]
    assert rep["mcnemar"]["n01_only_a"] == f["only_a"]
    assert rep["mcnemar"]["n10_only_b"] == f["only_b"]
    assert rep["mcnemar"]["p_value"] == pytest.approx(
        mcnemar_exact(f["only_a"], f["only_b"]))
    assert rep["n"] == len(y)
    # B is strictly better by construction: only_b > only_a here
    assert f["only_b"] > f["only_a"]


# --------------------------------------------------------------- CLI e2e


@pytest.fixture(scope="module")
def compare_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cmp_synth")
    make_synthetic_dataset(root, images_per_class=12, size=32)
    cfg = config.TrainConfig(batch_size=8, num_epochs=2,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    mods = {"rgb": config.rgb_modality(),
            "thermal": config.thermal_modality()}

    rgb_dir = tmp_path_factory.mktemp("cmp_ckpt_rgb")
    tr = Trainer("tiny_rgb", cfg, mods)
    tr.fit(load_single_modality(root / "rgb", "train", 32, "rgb"),
           load_single_modality(root / "rgb", "val", 32, "rgb"),
           checkpoint_dir=rgb_dir, image_size=32, log=lambda s: None)

    fus_dir = tmp_path_factory.mktemp("cmp_ckpt_fusion")
    tr = Trainer("tiny_fusion", cfg, mods)
    tr.fit(load_paired(root, "train", 32, strategy="pseudo", seed=42),
           load_paired(root, "val", 32, strategy="pseudo", seed=42),
           checkpoint_dir=fus_dir, image_size=32, log=lambda s: None)
    return root, rgb_dir, fus_dir


def test_compare_cli_same_family(compare_fixture, tmp_path):
    from dfu_multimodal_tpu.cli import compare as cli

    root, rgb_dir, _ = compare_fixture
    out = tmp_path / "report.json"
    assert cli.main(["--checkpoint-a", str(rgb_dir),
                     "--checkpoint-b", str(rgb_dir),
                     "--data-dir", str(root),
                     "--image-size", "32", "--batch-size", "8",
                     "--compute-dtype", "float32",
                     "--bootstrap", "50", "--out", str(out)]) == 0
    rep = json.loads(out.read_text())
    # a checkpoint vs itself: no flips, McNemar p = 1, all deltas 0
    assert rep["flip_table"]["n_flips"] == 0
    assert rep["mcnemar"]["p_value"] == 1.0
    assert not rep["mcnemar"]["significant"]
    assert rep["deltas"]["accuracy"]["delta"] == 0.0
    assert rep["model_a"] == rep["model_b"] == "tiny_rgb"


def test_compare_cli_cross_family_union_dataset(compare_fixture):
    """rgb-only vs fusion: the dataset is pseudo-paired over the union of
    modalities so both models score the identical row list; the default
    report path lands in checkpoint B."""
    from dfu_multimodal_tpu.cli import compare as cli

    root, rgb_dir, fus_dir = compare_fixture
    assert cli.main(["--checkpoint-a", str(rgb_dir),
                     "--checkpoint-b", str(fus_dir),
                     "--data-dir", str(root),
                     "--image-size", "32", "--batch-size", "8",
                     "--compute-dtype", "float32",
                     "--bootstrap", "50"]) == 0
    rep = json.loads((fus_dir / "compare_report.json").read_text())
    assert rep["model_a"] == "tiny_rgb"
    assert rep["model_b"] == "tiny_fusion"
    f = rep["flip_table"]
    assert sum(f[k] for k in ("both_correct", "only_a", "only_b",
                              "both_wrong")) == rep["n"]


def test_format_report_handles_undefined_metrics():
    from dfu_multimodal_tpu.eval.compare import format_report

    y = np.zeros(6, np.int64)            # single-class split: no positives
    p = np.zeros(6, np.int64)
    rep = compare_models(y, p, None, p, None, n_boot=20)
    s = format_report(rep, name_a="old", name_b="new")
    assert "undefined on this split" in s     # sensitivity/f1/mcc rows
    assert "only A correct" in s and "only B correct" in s


def test_compare_cli_applies_deployment(compare_fixture, tmp_path):
    """compare honors the predict/serve auto-apply contract: a persisted
    threshold-0 deployment on B forces every B decision positive
    (sensitivity 1, specificity 0); --ignore-deployment restores raw
    argmax and the self-comparison collapses to zero flips."""
    import shutil

    from dfu_multimodal_tpu.cli import compare as cli
    from dfu_multimodal_tpu.eval.deployment import save_deployment

    root, rgb_dir, _ = compare_fixture
    b_dir = tmp_path / "ckpt_b"
    shutil.copytree(rgb_dir, b_dir)
    save_deployment(b_dir, threshold=0.0, source="test")

    out = tmp_path / "dep_report.json"
    assert cli.main(["--checkpoint-a", str(rgb_dir),
                     "--checkpoint-b", str(b_dir),
                     "--data-dir", str(root),
                     "--image-size", "32", "--batch-size", "8",
                     "--compute-dtype", "float32",
                     "--bootstrap", "50", "--out", str(out)]) == 0
    rep = json.loads(out.read_text())
    assert rep["decision_rule_b"].startswith("deployment.json")
    assert "threshold=0.0000" in rep["decision_rule_b"]
    assert rep["deltas"]["sensitivity"]["b"] == 1.0
    assert rep["deltas"]["specificity"]["b"] == 0.0

    out2 = tmp_path / "dep_report_ignored.json"
    assert cli.main(["--checkpoint-a", str(rgb_dir),
                     "--checkpoint-b", str(b_dir),
                     "--data-dir", str(root),
                     "--image-size", "32", "--batch-size", "8",
                     "--compute-dtype", "float32", "--ignore-deployment",
                     "--bootstrap", "50", "--out", str(out2)]) == 0
    rep2 = json.loads(out2.read_text())
    assert rep2["flip_table"]["n_flips"] == 0
    assert rep2["decision_rule_b"] == "argmax (--ignore-deployment)"
