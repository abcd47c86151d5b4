"""TTA + ablation CLIs on synthetic data with tiny models."""

import numpy as np
import pytest

from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
from dfu_multimodal_tpu.utils.artifacts import load_pt

SMOKE = ["--image-size", "32", "--batch-size", "8", "--lr", "3e-3",
         "--compute-dtype", "float32"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("tta")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    logs = root / "logs"
    from dfu_multimodal_tpu.cli.train_rgb_only import main
    main(["--data-dir", str(data), "--checkpoint-root", str(logs),
          "--model", "tiny_rgb", "--epochs", "3", "--save-best-after", "1",
          "--skip-test-eval"] + SMOKE)
    return data, logs


def test_tta_cli(trained):
    data, logs = trained
    from dfu_multimodal_tpu.cli.test_time_augmentation import main
    res = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--models", "rgb_only"] + SMOKE)
    assert "rgb_only" in res
    clean, tta = res["rgb_only"]["clean"], res["rgb_only"]["tta"]
    for m in (clean, tta):
        assert set(m) >= {"accuracy", "f1", "auc", "sensitivity",
                          "specificity", "confusion_matrix", "predictions",
                          "probabilities", "labels"}
        assert m["confusion_matrix"].sum() == len(m["labels"])
    saved = load_pt(logs / "checkpoints_rgb_only" / "tta_results.pt")
    assert set(saved) == {"model", "clean_metrics", "tta_metrics"}


def test_tta_deterministic_per_seed(trained):
    data, logs = trained
    from dfu_multimodal_tpu.cli.test_time_augmentation import main
    a = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
              "--models", "rgb_only", "--seed", "7"] + SMOKE)
    b = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
              "--models", "rgb_only", "--seed", "7"] + SMOKE)
    np.testing.assert_array_equal(a["rgb_only"]["tta"]["probabilities"],
                                  b["rgb_only"]["tta"]["probabilities"])


def test_ablation_cli(trained):
    data, logs = trained
    from dfu_multimodal_tpu.cli.ablation_study import main
    res = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--rgb-model", "tiny_rgb", "--thermal-model", "tiny_thermal",
                "--epochs", "2", "--standardized-suffix", ""] + SMOKE)
    assert set(res) == {"rgb_only", "thermal_only"}
    assert all(0.0 <= v <= 1.0 for v in res.values())


def test_predict_tta_cli(trained):
    """predict --tta N: averaged augmented-view inference, deterministic
    in --seed, full probability range contract."""
    data, logs = trained
    from dfu_multimodal_tpu.cli.predict import main
    base = ["--checkpoint", str(logs / "checkpoints_rgb_only"),
            "--images", str(data / "rgb" / "test" / "ulcer"),
            "--image-size", "32", "--compute-dtype", "float32"]
    plain = main(base)
    a = main(base + ["--tta", "3", "--seed", "7"])
    b = main(base + ["--tta", "3", "--seed", "7"])
    c = main(base + ["--tta", "3", "--seed", "8"])
    assert set(a) == set(plain) and len(a) > 0
    assert a == b                                   # seed-deterministic
    assert a != c                                   # augmentation is real
    for prob, pred in a.values():
        assert 0.0 <= prob <= 1.0 and pred in (0, 1)
