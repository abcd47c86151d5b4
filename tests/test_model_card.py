"""Model card generator (cli/model_card.py)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A real tiny training run so the card reads genuine artifacts."""
    from dfu_multimodal_tpu.cli.train_rgb_only import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    root = tmp_path_factory.mktemp("card")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    main(["--model", "tiny_rgb", "--data-dir", str(data),
          "--checkpoint-root", str(root / "logs"),
          "--epochs", "2", "--save-best-after", "1", "--batch-size", "8",
          "--image-size", "32", "--compute-dtype", "float32",
          "--lr", "3e-3"])
    return root / "logs" / "checkpoints_rgb_only"


def test_card_from_trainer_artifacts(trained):
    from dfu_multimodal_tpu.cli.model_card import main
    out = main(["--checkpoint", str(trained)])
    card = (trained / "MODEL_CARD.md").read_text()
    assert out["output"].endswith("MODEL_CARD.md")
    # model details from the real artifacts
    assert "# Model card — `tiny_rgb`" in card
    assert "Parameters |" in card
    assert "Weights SHA-256" in card
    assert "Best epoch" in card
    # training section from run_info.json
    assert "--lr 3e-3" in card or "learning_rate | 0.003" in card
    assert "| batch_size | 8 |" in card
    # trainer test pass fallback (no extended_metrics run)
    assert "trainer's test pass" in card
    assert "| Accuracy |" in card
    # deployment + limitations boilerplate
    assert "argmax at 0.5" in card
    assert "drift" in card.lower()
    assert "NOT a diagnostic device" in card


def test_card_includes_extended_metrics_and_ci(trained, tmp_path):
    """With an extended-metrics results.pt (incl. bootstrap + calibration
    payloads) in the default location, the card renders the full table."""
    from dfu_multimodal_tpu.cli.model_card import main
    from dfu_multimodal_tpu.utils.artifacts import save_pt

    mdir = trained.parent / "extended_metrics" / "rgb_only"
    mdir.mkdir(parents=True, exist_ok=True)
    save_pt({
        "y_true": np.array([0, 1, 1, 0]),
        "y_pred": np.array([0, 1, 1, 0]),
        "y_probs": np.array([0.1, 0.9, 0.8, 0.2]),
        "metrics": {"accuracy": 0.95, "f1": 0.96, "sensitivity": 0.97,
                    "specificity": 0.91, "auc_roc": 0.99},
        "bootstrap": {"accuracy": {"estimate": 0.95, "lo": 0.90,
                                   "hi": 0.99, "n_valid": 2000},
                      "_meta": {"n_boot": 2000}},
        "calibration": {"errors": {"ece": 0.03, "mce": 0.08,
                                   "brier": 0.04}},
    }, mdir / "results.pt")
    # a deployment config too
    (trained / "deployment.json").write_text(json.dumps(
        {"threshold": 0.37, "temperature": 1.8}))
    try:
        out_file = tmp_path / "card.md"
        main(["--checkpoint", str(trained), "--output", str(out_file)])
        card = out_file.read_text()
        assert "| Accuracy | 0.9500 | [0.9000, 0.9900] |" in card
        assert "ECE 0.0300" in card
        assert "P(ulcer) ≥ 0.3700" in card
        assert "temperature T=1.8000" in card
    finally:
        (trained / "deployment.json").unlink()


def test_card_missing_checkpoint_errors(tmp_path):
    from dfu_multimodal_tpu.cli.model_card import main
    with pytest.raises(SystemExit, match="not found"):
        main(["--checkpoint", str(tmp_path / "nope")])


def test_card_includes_robustness_report(trained):
    from dfu_multimodal_tpu.cli.model_card import main
    report = {"model": "tiny_rgb", "split": "test", "clean_f1": 0.91,
              "clean_acc": 0.9, "severities": [1, 5],
              "results": [
                  {"corruption": "gaussian_noise", "modalities": ["rgb"],
                   "f1": [0.9, 0.88], "acc": [0.9, 0.88],
                   "worst_f1": 0.88, "verdict": "robust"},
                  {"corruption": "brightness", "modalities": ["rgb"],
                   "f1": [0.8, 0.4], "acc": [0.8, 0.5],
                   "worst_f1": 0.4, "verdict": "fragile"}]}
    (trained / "robustness_report.json").write_text(json.dumps(report))
    try:
        main(["--checkpoint", str(trained)])
        card = (trained / "MODEL_CARD.md").read_text()
        assert "Corruption robustness" in card
        assert "1/2 axes fragile" in card
        assert "brightness" in card
    finally:
        (trained / "robustness_report.json").unlink()


def test_card_includes_compare_report(trained):
    from dfu_multimodal_tpu.cli.model_card import main
    report = {"model_a": "tiny_rgb", "model_b": "tiny_rgb",
              "split": "test", "n": 40,
              "mcnemar": {"n01_only_a": 1, "n10_only_b": 8,
                          "p_value": 0.0391, "significant": True},
              "deltas": {"accuracy": {"a": 0.80, "b": 0.975,
                                      "delta": 0.175, "lo": 0.05,
                                      "hi": 0.30, "n_valid": 200,
                                      "significant": True}}}
    (trained / "compare_report.json").write_text(json.dumps(report))
    try:
        main(["--checkpoint", str(trained)])
        card = (trained / "MODEL_CARD.md").read_text()
        assert "Paired comparison vs `tiny_rgb`" in card
        assert "McNemar exact p = 0.039" in card
        assert "significant" in card
    finally:
        (trained / "compare_report.json").unlink()
