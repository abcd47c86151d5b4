"""Input drift monitoring (eval/drift.py) + serving integration."""

import numpy as np
import pytest

from dfu_multimodal_tpu.eval.drift import (BASELINE_FILENAME, DriftMonitor,
                                           baseline_from_arrays,
                                           channel_histograms, drift_report,
                                           load_baseline, psi,
                                           save_baseline, verdict_for)


def u8_images(n, mean, spread=20, size=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(mean, spread, size=(n, size, size, 3))
    return np.clip(x, 0, 255).astype(np.uint8)


def test_channel_histograms_counts():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 0        # bin 0
    img[..., 1] = 100      # 100 >> 3 = bin 12
    img[..., 2] = 255      # bin 31
    h = channel_histograms(img)
    assert h.shape == (3, 32)
    assert h[0, 0] == 4 and h[1, 12] == 4 and h[2, 31] == 4
    assert h.sum() == 12
    with pytest.raises(ValueError, match="uint8"):
        channel_histograms(img.astype(np.float32))


def test_psi_zero_for_identical_and_grows_with_shift():
    base = u8_images(50, mean=120, seed=0)
    same = u8_images(50, mean=120, seed=1)
    shifted = u8_images(50, mean=180, seed=2)
    hb = channel_histograms(base)[0]
    assert psi(hb, channel_histograms(same)[0]) < 0.05
    assert psi(hb, channel_histograms(shifted)[0]) > 0.25
    assert psi(hb, hb) == pytest.approx(0.0, abs=1e-9)


def test_verdict_thresholds():
    assert verdict_for(0.05) == "stable"
    assert verdict_for(0.15) == "moderate_drift"
    assert verdict_for(0.30) == "major_drift"


def test_baseline_roundtrip(tmp_path):
    arrays = {"rgb": u8_images(30, mean=110)}
    baseline = baseline_from_arrays(arrays)
    f = tmp_path / BASELINE_FILENAME
    save_baseline(f, baseline)
    back = load_baseline(f)
    assert back["bins"] == 32
    mod = back["modalities"]["rgb"]
    assert len(mod["hist"]) == 3 and len(mod["hist"][0]) == 32
    assert mod["n_images"] == 30
    np.testing.assert_allclose(np.sum(mod["hist"], axis=1), 1.0, atol=1e-9)
    assert load_baseline(tmp_path / "missing.json") is None


def test_drift_report_mean_shift_units():
    base = baseline_from_arrays({"rgb": u8_images(100, mean=100, spread=10)})
    cur = u8_images(100, mean=120, spread=10, seed=5)
    rep = drift_report(base["modalities"]["rgb"], channel_histograms(cur),
                       cur.reshape(-1, 3).mean(axis=0), 100)
    # shifted by ~20 intensity = ~2 baseline sigmas
    assert all(1.0 < s < 3.5 for s in rep["mean_shift_sigma"])
    assert rep["verdict"] == "major_drift"


def test_baseline_moments_exact_and_chunked():
    """Histogram-derived mean/std must equal the direct float64 moments
    (they are exact for uint8), and chunked counting must not depend on
    the chunk boundary."""
    arr = u8_images(70, mean=113, spread=40, seed=2)
    base = baseline_from_arrays({"rgb": arr})["modalities"]["rgb"]
    flat = arr.reshape(-1, 3).astype(np.float64)
    np.testing.assert_allclose(base["mean"], flat.mean(axis=0),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(base["std"], flat.std(axis=0),
                               rtol=0, atol=1e-9)


def test_baseline_excludes_placeholder_rows():
    """Rows whose path is None (the loader's black missing-modality
    placeholders) must not pollute the baseline — serving never counts
    black fill-ins in live stats."""
    real = u8_images(20, mean=120)
    black = np.zeros((5, 16, 16, 3), np.uint8)
    arr = np.concatenate([real, black])
    paths = {"rgb": [f"p{i}" for i in range(20)] + [None] * 5}
    polluted = baseline_from_arrays({"rgb": arr})["modalities"]["rgb"]
    clean = baseline_from_arrays({"rgb": arr},
                                 paths=paths)["modalities"]["rgb"]
    assert clean["n_images"] == 20
    assert polluted["hist"][0][0] > clean["hist"][0][0]  # black bin mass
    ref = baseline_from_arrays({"rgb": real})["modalities"]["rgb"]
    np.testing.assert_allclose(clean["hist"], ref["hist"], atol=1e-12)


def test_monitor_rejects_malformed_baseline():
    good = baseline_from_arrays({"rgb": u8_images(10, 120)})
    DriftMonitor(good)                           # fine
    with pytest.raises(ValueError, match="bins"):
        DriftMonitor({**good, "bins": 64})
    with pytest.raises(ValueError, match="modalities"):
        DriftMonitor({"bins": 32, "modalities": {}})
    broken = {"bins": 32, "modalities": {"rgb": {"hist": [[0.5] * 32] * 3,
                                                 "mean": [1, 2, 3]}}}
    with pytest.raises(ValueError, match="lacks 'std'"):
        DriftMonitor(broken)


def test_monitor_stable_then_drifted():
    baseline = baseline_from_arrays({"rgb": u8_images(200, mean=120)})
    mon = DriftMonitor(baseline, min_images=10)
    assert mon.report()["verdict"] == "no_data"

    mon.update("rgb", u8_images(5, mean=120, seed=3))
    assert mon.report()["modalities"]["rgb"]["verdict"] == "warming_up"
    assert mon.report()["verdict"] == "warming_up"

    mon.update("rgb", u8_images(50, mean=120, seed=4))
    rep = mon.report()
    assert rep["verdict"] == "stable"
    assert rep["modalities"]["rgb"]["n_images"] == 55

    mon.reset()
    mon.update("rgb", u8_images(60, mean=200, seed=5))
    assert mon.report()["verdict"] == "major_drift"


def test_monitor_rolling_window_forgets_old_traffic():
    """A camera swap after a long stable run must flip the verdict once
    the window rolls over — lifetime accumulation would dilute it."""
    baseline = baseline_from_arrays({"rgb": u8_images(200, mean=120)})
    mon = DriftMonitor(baseline, min_images=10, window_images=100)
    for s in range(10):                      # 500 stable images
        mon.update("rgb", u8_images(50, mean=120, seed=s))
    assert mon.report()["verdict"] == "stable"
    # window keeps ~100 recent images, so 3x50 shifted images dominate
    for s in range(3):
        mon.update("rgb", u8_images(50, mean=200, seed=100 + s))
    rep = mon.report()
    assert rep["verdict"] == "major_drift"
    assert rep["modalities"]["rgb"]["n_images"] <= 200   # bounded window


def test_monitor_unknown_modality_and_single_image():
    mon = DriftMonitor(baseline_from_arrays({"rgb": u8_images(20, 120)}),
                       min_images=1)
    mon.update("thermal", u8_images(1, 120)[0])      # (H, W, 3) single
    rep = mon.report()
    assert rep["modalities"]["thermal"]["verdict"] == "no_baseline"
    assert rep["verdict"] == "no_baseline"


def test_serving_engine_reports_drift():
    """ServingEngine folds live requests into the monitor and stats()
    carries the PSI report."""
    import jax

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.serve.engine import ServingEngine
    from dfu_multimodal_tpu.train.engine import Trainer

    size = 32
    base_imgs = u8_images(80, mean=120, size=size)
    baseline = baseline_from_arrays({"rgb": base_imgs})
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=size)
    mon = DriftMonitor(baseline, min_images=8)
    engine = ServingEngine(trainer, state, image_size=size, max_batch=8,
                           max_wait_ms=50.0, drift_monitor=mon)
    engine.warmup()                    # must NOT pollute the monitor
    assert mon.report()["verdict"] == "no_data"
    with engine:
        engine.predict([{"rgb": img}
                        for img in u8_images(16, mean=120, size=size,
                                             seed=9)])
        drift = engine.stats()["drift"]
    assert drift["verdict"] == "stable"
    assert drift["modalities"]["rgb"]["n_images"] == 16


def test_serving_absent_modality_never_pollutes_monitor():
    """A multimodal request carrying only RGB fills thermal with black
    padding for the forward — the monitor must see the RGB pixels but
    NOT the black thermal fill-in."""
    import jax

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.serve.engine import ServingEngine
    from dfu_multimodal_tpu.train.engine import Trainer

    size = 32
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("tiny_fusion", cfg,
                      {"rgb": config.rgb_modality(),
                       "thermal": config.thermal_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=size)
    baseline = baseline_from_arrays(
        {"rgb": u8_images(30, 120, size=size),
         "thermal": u8_images(30, 120, size=size)})
    mon = DriftMonitor(baseline, min_images=1)
    engine = ServingEngine(trainer, state, image_size=size, max_batch=8,
                           max_wait_ms=50.0, drift_monitor=mon)
    engine.warmup()
    with engine:
        engine.predict([{"rgb": img}          # no thermal provided
                        for img in u8_images(4, 120, size=size)])
    rep = mon.report()
    assert rep["modalities"]["rgb"]["n_images"] == 4
    assert "thermal" not in rep["modalities"]   # padding never counted


def test_train_cli_writes_baseline(tmp_path):
    """Every training run persists drift_baseline.json next to the
    checkpoint with one entry per input modality."""
    from dfu_multimodal_tpu.cli.train_rgb_only import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=8, size=32)
    main(["--model", "tiny_rgb", "--data-dir", str(data),
          "--checkpoint-root", str(tmp_path / "logs"),
          "--epochs", "1", "--batch-size", "8", "--image-size", "32",
          "--compute-dtype", "float32", "--skip-test-eval"])
    baseline = load_baseline(tmp_path / "logs" / "checkpoints_rgb_only"
                             / BASELINE_FILENAME)
    assert baseline is not None
    assert set(baseline["modalities"]) == {"rgb"}
    assert baseline["modalities"]["rgb"]["n_images"] > 0
