"""Corruption-robustness sweep (eval/robustness.py + cli/robustness.py):
corruption math, severity monotonicity hooks, verdicts, CLI end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.eval.robustness import (SEVERITY_PARAMS,
                                                apply_corruption, sweep,
                                                verdict)
from dfu_multimodal_tpu.train.engine import Trainer


def imgs(shape=(2, 16, 16, 3), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))


def test_noise_changes_pixels_and_respects_sigma():
    x = imgs()
    k = jax.random.PRNGKey(0)
    lo = apply_corruption("gaussian_noise", x, jnp.float32(4.0), k)
    hi = apply_corruption("gaussian_noise", x, jnp.float32(32.0), k)
    assert float(jnp.mean(jnp.abs(lo - x))) < float(jnp.mean(jnp.abs(hi - x)))
    assert float(jnp.min(hi)) >= 0.0 and float(jnp.max(hi)) <= 255.0


def test_blur_preserves_mean_and_smooths():
    x = imgs()
    k = jax.random.PRNGKey(0)
    out = apply_corruption("gaussian_blur", x, jnp.float32(2.0), k)
    # edge-padded separable blur ~preserves the global mean
    assert float(jnp.mean(out)) == pytest.approx(float(jnp.mean(x)), rel=0.05)
    # and reduces local variation
    tv = lambda a: float(jnp.mean(jnp.abs(jnp.diff(a, axis=1))))
    assert tv(out) < tv(x)


def test_brightness_and_contrast_semantics():
    x = imgs()
    k = jax.random.PRNGKey(0)
    br = apply_corruption("brightness", x, jnp.float32(16.0), k)
    np.testing.assert_allclose(br, jnp.clip(x + 16.0, 0, 255), rtol=1e-6)
    ct = apply_corruption("contrast", x, jnp.float32(0.5), k)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    np.testing.assert_allclose(ct, jnp.clip(mean + 0.5 * (x - mean), 0, 255),
                               rtol=1e-5)


def test_switch_matches_direct_apply():
    from dfu_multimodal_tpu.eval.robustness import (CORRUPTIONS,
                                                    apply_corruption_switch)
    x = imgs()
    k = jax.random.PRNGKey(3)
    for i, name in enumerate(CORRUPTIONS):
        p = jnp.float32(SEVERITY_PARAMS[name][2])
        direct = apply_corruption(name, x, p, k)
        switched = apply_corruption_switch(jnp.int32(i), x, p, k)
        # atol: switch branches compile (fused) while the direct path runs
        # op-by-op — last-ulp differences surface near the 0/255 clips
        np.testing.assert_allclose(switched, direct, rtol=1e-5, atol=1e-3,
                                   err_msg=name)


def test_unknown_corruption_rejected():
    with pytest.raises(ValueError, match="unknown corruption"):
        apply_corruption("fog", imgs(), jnp.float32(1.0),
                         jax.random.PRNGKey(0))


def test_verdict_thresholds():
    assert verdict(0.9, 0.88) == "robust"
    assert verdict(0.9, 0.80) == "moderate"
    assert verdict(0.9, 0.70) == "fragile"


def test_severity_grids_are_5_levels():
    for name, grid in SEVERITY_PARAMS.items():
        assert len(grid) == 5, name


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("robust_synth")
    make_synthetic_dataset(root, images_per_class=16, size=32)
    train = load_single_modality(root / "rgb", "train", 32, "rgb")
    val = load_single_modality(root / "rgb", "val", 32, "rgb")
    cfg = config.TrainConfig(batch_size=8, num_epochs=5,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    tr = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    ckpt = tmp_path_factory.mktemp("robust_ckpt")
    state, _, _ = tr.fit(train, val, checkpoint_dir=ckpt, image_size=32,
                         log=lambda s: None)
    return root, ckpt, tr, state, val


def test_sweep_report_shape(trained):
    root, ckpt, tr, state, val = trained
    report = sweep(tr, state, val, ["brightness"], [1, 5], [("rgb",)],
                   log=lambda s: None)
    assert report["model"] == "tiny_rgb"
    (entry,) = report["results"]
    assert entry["corruption"] == "brightness"
    assert len(entry["f1"]) == 2
    assert entry["verdict"] in ("robust", "moderate", "fragile")
    assert all(0.0 <= v <= 1.0 for v in entry["f1"])


def test_one_trace_serves_all_corruptions(trained, monkeypatch):
    """The whole corruption grid must replay ONE compiled program per
    modality subset (re-jits are minutes each over the remote-compile
    tunnel; the eval itself is sub-second)."""
    from dfu_multimodal_tpu.eval import robustness as R

    _, _, tr, state, val = trained
    traces = []
    orig = R.apply_corruption_switch
    monkeypatch.setattr(
        R, "apply_corruption_switch",
        lambda *a: (traces.append(1), orig(*a))[1])
    step = R.make_step(tr, ("rgb",))
    for name in R.CORRUPTIONS:
        R.corrupted_counts(tr, state, val, name, ("rgb",), [1],
                           step=step)
    assert sum(traces) == 1        # traced once, replayed for all four


def test_sweep_rejects_unknown_modality(trained):
    _, _, tr, state, val = trained
    from dfu_multimodal_tpu.eval.robustness import corrupted_counts
    with pytest.raises(ValueError, match="no input"):
        corrupted_counts(tr, state, val, "brightness", ("thermal",), [1])


def test_robustness_cli(trained, tmp_path):
    from dfu_multimodal_tpu.cli import robustness as cli

    root, ckpt, *_ = trained
    rc = cli.main(["--checkpoint", str(ckpt), "--data-dir", str(root),
                   "--split", "val", "--image-size", "32",
                   "--batch-size", "8", "--compute-dtype", "float32",
                   "--corruptions", "gaussian_noise", "contrast",
                   "--severities", "1", "3"])
    assert rc == 0
    import json
    report = json.loads((ckpt / "robustness_report.json").read_text())
    assert report["split"] == "val"
    assert {r["corruption"] for r in report["results"]} == {
        "gaussian_noise", "contrast"}
    assert report["severities"] == [1, 3]


def test_sweep_multimodal_per_modality(trained, tmp_path_factory):
    """Fusion models sweep each input separately: corrupting thermal
    must not touch the rgb branch's input (and vice versa)."""
    from dfu_multimodal_tpu.data.loader import load_paired

    root, *_ = trained
    val = load_paired(root, "val", 32, strategy="pseudo", seed=0)
    cfg = config.TrainConfig(batch_size=8, num_epochs=2,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    mods = {"rgb": config.rgb_modality(),
            "thermal": config.thermal_modality(blur=False)}
    tr = Trainer("tiny_fusion", cfg, mods)
    state, *_ = tr.fit(val, val, checkpoint_dir=None, image_size=32,
                       log=lambda s: None)
    report = sweep(tr, state, val, ["gaussian_noise"], [5],
                   [("rgb",), ("thermal",), ("rgb", "thermal")],
                   log=lambda s: None)
    subsets = [tuple(r["modalities"]) for r in report["results"]]
    assert subsets == [("rgb",), ("thermal",), ("rgb", "thermal")]
