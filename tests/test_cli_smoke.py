"""End-to-end CLI smoke: train all three entry points on synthetic data with
tiny models, then run extended_metrics over the checkpoints and verify the
full artifact contract."""

import os

import numpy as np
import pytest

from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
from dfu_multimodal_tpu.utils.artifacts import load_pt

SMOKE = ["--image-size", "32", "--batch-size", "8", "--epochs", "3",
         "--lr", "3e-3", "--compute-dtype", "float32"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    logs = root / "logs"
    return data, logs


def test_train_rgb_cli(workdir):
    data, logs = workdir
    from dfu_multimodal_tpu.cli.train_rgb_only import main
    res = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--model", "tiny_rgb"] + SMOKE)
    assert "test_f1" in res
    out = logs / "checkpoints_rgb_only"
    assert (out / "best_model.msgpack").exists()
    saved = load_pt(out / "test_results.pt")
    assert set(saved) >= {"test_preds", "test_labels", "test_probs",
                          "test_acc", "test_f1", "test_loss"}
    assert len(saved["test_preds"]) == len(saved["test_labels"])


def test_train_thermal_cli(workdir):
    data, logs = workdir
    from dfu_multimodal_tpu.cli.train_thermal_only import main
    res = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--model", "tiny_thermal"] + SMOKE)
    assert (logs / "checkpoints_thermal_only" / "test_results.pt").exists()


def test_train_multimodal_cli(workdir):
    data, logs = workdir
    from dfu_multimodal_tpu.cli.train_multimodal_fusion import main
    # tiny_rgb consumes only the rgb modality of the paired batch
    res = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--model", "tiny_rgb"] + SMOKE)
    assert (logs / "checkpoints_multimodal" / "best_model.msgpack").exists()


def test_predict_cli(workdir, tmp_path):
    data, logs = workdir
    from dfu_multimodal_tpu.cli.predict import main
    out_csv = tmp_path / "preds.csv"
    res = main(["--checkpoint", str(logs / "checkpoints_rgb_only"),
                "--images", str(data / "rgb" / "test" / "ulcer"),
                "--image-size", "32", "--compute-dtype", "float32",
                "--output", str(out_csv)])
    assert len(res) > 0
    assert all(0.0 <= prob <= 1.0 for prob, _ in res.values())
    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "path,prob_ulcer,prediction"
    assert len(lines) == len(res) + 1


def test_predict_explain_dir(workdir, tmp_path):
    """predict --explain-dir: one evidence overlay PNG per image at the
    input resolution (the offline counterpart of /v1/explain)."""
    data, logs = workdir
    from dfu_multimodal_tpu.cli.predict import main
    out_dir = tmp_path / "evidence"
    res = main(["--checkpoint", str(logs / "checkpoints_rgb_only"),
                "--images", str(data / "rgb" / "test" / "ulcer"),
                "--image-size", "32", "--compute-dtype", "float32",
                "--explain-dir", str(out_dir)])
    pngs = sorted(out_dir.glob("*_rgb.png"))
    assert len(pngs) == len(res) > 0
    import numpy as np
    from PIL import Image
    overlay = np.asarray(Image.open(pngs[0]))
    assert overlay.shape == (32, 32, 3)


def test_extended_metrics_cli(workdir):
    data, logs = workdir
    from dfu_multimodal_tpu.cli.extended_metrics import main
    results = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                    "--image-size", "32", "--compute-dtype", "float32"])
    assert set(results) == {"RGB-Only", "Thermal-Only", "Multimodal"}
    summary = (logs / "extended_metrics" / "EVALUATION_SUMMARY.txt")
    assert summary.exists()
    assert "DFU MULTIMODAL MODEL EVALUATION SUMMARY" in summary.read_text()
    for display, subdir in [("RGB-Only", "rgb_only"),
                            ("Thermal-Only", "thermal_only"),
                            ("Multimodal", "multimodal")]:
        out = logs / "extended_metrics" / subdir
        assert (out / "results.pt").exists()
        assert (out / f"confusion_matrix_{display}.png").exists()
        assert (out / f"roc_curve_{display}.png").exists()
        assert (out / f"pr_curve_{display}.png").exists()
        saved = load_pt(out / "results.pt")
        assert {"y_true", "y_pred", "y_probs", "metrics"} <= set(saved)
        m = saved["metrics"]
        assert 0.0 <= m["accuracy"] <= 1.0
        assert m["tn"] + m["fp"] + m["fn"] + m["tp"] == len(saved["y_true"])


def test_extended_metrics_calibration_bootstrap_cli(workdir):
    """Opt-in calibration + bootstrap surfaces: reliability PNG, results.pt
    gains 'calibration' and 'bootstrap' entries, default artifacts stay."""
    data, logs = workdir
    if not (logs / "checkpoints_rgb_only" / "best_model.msgpack").exists():
        from dfu_multimodal_tpu.cli.train_rgb_only import main as train_main
        train_main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                    "--model", "tiny_rgb"] + SMOKE)
    from dfu_multimodal_tpu.cli.extended_metrics import main
    results = main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                    "--image-size", "32", "--compute-dtype", "float32",
                    "--models", "rgb_only", "--operating-point", "youden",
                    "--calibration", "--temperature-from-val",
                    "--bootstrap", "50"])
    assert set(results) == {"RGB-Only"}
    out = logs / "extended_metrics" / "rgb_only"
    assert (out / "reliability_diagram_RGB-Only.png").exists()
    saved = load_pt(out / "results.pt")
    assert "calibration" in saved and "bootstrap" in saved
    errs = saved["calibration"]["errors"]
    assert 0.0 <= errs["ece"] <= 1.0 and 0.0 <= errs["brier"] <= 1.0
    if "temperature" in saved["calibration"]:
        t = saved["calibration"]["temperature"]["temperature"]
        assert t > 0
        scaled = saved["calibration"]["y_probs_scaled"]
        assert np.array_equal(np.argsort(scaled),
                              np.argsort(saved["y_probs"]))
    acc = saved["bootstrap"]["accuracy"]
    assert acc["lo"] <= acc["estimate"] <= acc["hi"]
    assert saved["bootstrap"]["_meta"]["n_boot"] == 50


def test_dfu_umbrella_command(capsys):
    """`dfu` lists every subcommand; `dfu <sub> --help` dispatches to the
    sub-CLI's argparse; unknown names fail with rc 2."""
    from dfu_multimodal_tpu.cli.main import COMMANDS, main

    assert main([]) == 0
    out = capsys.readouterr().out
    for name in COMMANDS:
        assert name in out

    with pytest.raises(SystemExit) as e:
        main(["dataset-tools", "--help"])
    assert e.value.code == 0
    assert "verify" in capsys.readouterr().out

    assert main(["not-a-command"]) == 2


def test_run_info_manifest(workdir):
    """Every training run writes a reproducibility manifest next to the
    checkpoint: command, resolved config, versions."""
    import json
    data, logs = workdir
    path = logs / "checkpoints_rgb_only" / "run_info.json"
    if not path.exists():
        from dfu_multimodal_tpu.cli.train_rgb_only import main as train_main
        train_main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                    "--model", "tiny_rgb"] + SMOKE)
    info = json.loads(path.read_text())
    assert info["model"] == "tiny_rgb"
    assert info["recipe"] == "rgb_only"
    assert "--data-dir" in info["argv"]
    assert info["config"]["seed"] == 42
    assert info["config"]["batch_size"] == 8
    assert info["backend"] in ("cpu", "tpu")
    assert info["device_count"] >= 1
