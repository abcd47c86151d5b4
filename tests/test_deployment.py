"""Persisted deployment config (eval/deployment.py): tune once on val,
predict/serve apply automatically."""

from pathlib import Path

import numpy as np
import pytest

from dfu_multimodal_tpu.eval import deployment as D


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
    root = tmp_path_factory.mktemp("deploy")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    return data, root / "logs"


def test_save_load_roundtrip(tmp_path):
    path = D.save_deployment(tmp_path, threshold=0.42, temperature=1.7,
                             operating_point={"strategy": "youden"},
                             temperature_info={"temperature": 1.7},
                             source="extended_metrics --operating-point")
    assert path.name == "deployment.json"
    dep = D.load_deployment(tmp_path)
    assert dep["threshold"] == pytest.approx(0.42)
    assert dep["temperature"] == pytest.approx(1.7)
    assert dep["operating_point"]["strategy"] == "youden"
    assert D.load_deployment(tmp_path / "nope") == {}


def test_resolve_precedence(tmp_path):
    D.save_deployment(tmp_path, threshold=0.42, temperature=1.7)
    # nothing explicit: both come from the file
    thr, temp, note = D.resolve_deployment(tmp_path, None, None)
    assert (thr, temp) == (pytest.approx(0.42), pytest.approx(1.7))
    assert "threshold" in note and "temperature" in note
    # explicit flags win per-field
    thr, temp, note = D.resolve_deployment(tmp_path, 0.9, None)
    assert thr == 0.9 and temp == pytest.approx(1.7)
    # ignore skips the file
    thr, temp, note = D.resolve_deployment(tmp_path, None, None,
                                           ignore=True)
    assert thr is None and temp is None and note == ""
    # absent file: pass-through
    thr, temp, note = D.resolve_deployment(tmp_path / "x", 0.3, None)
    assert thr == 0.3 and temp is None and note == ""


def test_extended_metrics_saves_deployment_and_predict_applies(workdir):
    """End-to-end glue: --save-deployment writes the val-tuned config next
    to the checkpoint; predict auto-applies it (and --ignore-deployment
    restores raw behavior)."""
    data, logs = workdir
    ckpt = logs / "checkpoints_rgb_only"
    if not (ckpt / "best_model.msgpack").exists():
        from dfu_multimodal_tpu.cli.train_rgb_only import main as train_main
        from tests.test_cli_smoke import SMOKE
        train_main(["--data-dir", str(data), "--checkpoint-root",
                    str(logs), "--model", "tiny_rgb"] + SMOKE)

    from dfu_multimodal_tpu.cli.extended_metrics import main as em_main
    em_main(["--data-dir", str(data), "--checkpoint-root", str(logs),
             "--image-size", "32", "--compute-dtype", "float32",
             "--models", "rgb_only", "--operating-point", "youden",
             "--temperature-from-val", "--save-deployment"])
    dep = D.load_deployment(ckpt)
    assert dep["threshold"] is not None
    assert dep["temperature"] is not None and dep["temperature"] > 0
    assert dep["operating_point"]["strategy"] == "youden"
    assert "--save-deployment" not in dep["source"]          # readable cmd
    assert "extended_metrics" in dep["source"]

    from dfu_multimodal_tpu.cli.predict import main as pred_main
    images = data / "rgb" / "test" / "ulcer"
    base = ["--checkpoint", str(ckpt), "--images", str(images),
            "--image-size", "32", "--compute-dtype", "float32"]
    applied = pred_main(base)
    raw = pred_main(base + ["--ignore-deployment"])
    from dfu_multimodal_tpu.eval.calibration import apply_temperature
    for key in applied:
        p_applied, pred_applied = applied[key]
        p_raw, _ = raw[key]
        assert p_applied == pytest.approx(
            float(apply_temperature(np.array([p_raw]),
                                    dep["temperature"])[0]), rel=1e-6)
        assert pred_applied == int(p_applied >= dep["threshold"])
