"""Knowledge distillation (train/distill.py + cli/distill.py): KD-loss
math, ResNet-18 student architecture, engine smoke, CLI end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.train.distill import (DistillConfig, DistillTrainer,
                                              kd_loss)
from dfu_multimodal_tpu.train.engine import Trainer, weighted_ce


# ---------------------------------------------------------------- kd_loss


def test_kd_loss_matches_manual():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4, 2)).astype(np.float32)
    t = rng.normal(size=(4, 2)).astype(np.float32)
    labels = np.array([0, 1, 1, 0])
    w = np.ones(4, np.float32)
    alpha, T = 0.6, 3.0

    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    p, q = softmax(t / T), softmax(s / T)
    kl = np.mean(np.sum(p * (np.log(p) - np.log(q)), axis=-1))
    ce = float(weighted_ce(jnp.asarray(s), jnp.asarray(labels),
                           jnp.asarray(w)))
    want = alpha * T * T * kl + (1 - alpha) * ce
    got = float(kd_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(labels),
                        jnp.asarray(w), jnp.ones(4), alpha, T))
    assert got == pytest.approx(want, rel=1e-5)


def test_kd_loss_alpha_zero_is_plain_ce():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))
    labels = jnp.asarray([1, 0, 1])
    w = jnp.asarray([2.0, 1.0, 1.0])
    got = float(kd_loss(s, t, labels, w, jnp.ones(3), 0.0, 4.0))
    assert got == pytest.approx(float(weighted_ce(s, labels, w)), rel=1e-6)


def test_kd_loss_zero_when_student_matches_teacher():
    logits = jnp.asarray([[2.0, -1.0], [0.5, 0.5]])
    labels = jnp.asarray([0, 1])
    got = float(kd_loss(logits, logits, labels, jnp.ones(2), jnp.ones(2),
                        1.0, 2.0))
    assert got == pytest.approx(0.0, abs=1e-6)


def test_kd_loss_padded_rows_excluded_from_kl():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(2, 2)).astype(np.float32)
    t = rng.normal(size=(2, 2)).astype(np.float32)
    labels = np.array([0, 1])
    base = float(kd_loss(jnp.asarray(s), jnp.asarray(t),
                         jnp.asarray(labels), jnp.ones(2), jnp.ones(2),
                         1.0, 2.0))
    sp = np.concatenate([s, rng.normal(size=(2, 2)).astype(np.float32)])
    tp = np.concatenate([t, rng.normal(size=(2, 2)).astype(np.float32)])
    lp = np.concatenate([labels, [0, 0]])
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    padded = float(kd_loss(jnp.asarray(sp), jnp.asarray(tp),
                           jnp.asarray(lp), valid, valid, 1.0, 2.0))
    assert padded == pytest.approx(base, rel=1e-5)


# ---------------------------------------------------------------- student


def test_resnet18_param_count_matches_torchvision():
    """Trunk must be the torchvision resnet18 architecture: 11,176,512
    trunk params (+ 512*2+2 head)."""
    shapes = zoo.init_shapes(*zoo.build("resnet18_rgb"), image_size=32)
    assert zoo.param_count(shapes) == 11_176_512 + 512 * 2 + 2


def test_resnet18_forward_shapes():
    module, spec = zoo.build("resnet18_rgb", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=64)
    x = jnp.zeros((2, 64, 64, 3))
    logits = module.apply(variables, x, train=False)
    assert logits.shape == (2, 2)
    assert "batch_stats" in variables


# ----------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill_synth")
    make_synthetic_dataset(root, images_per_class=16, size=32)
    return root


def teacher_checkpoint(root, tmp, model="tiny_rgb", modality="rgb"):
    train = load_single_modality(root / modality, "train", 32, modality)
    val = load_single_modality(root / modality, "val", 32, modality)
    cfg = config.TrainConfig(batch_size=8, num_epochs=5,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    tr = Trainer(model, cfg, {modality: config.rgb_modality()
                              if modality == "rgb"
                              else config.thermal_modality()})
    ckpt = tmp / f"teacher_{model}"
    state, _, _ = tr.fit(train, val, checkpoint_dir=ckpt, image_size=32,
                         log=lambda s: None)
    return tr, state, ckpt, train, val


def test_distill_student_tracks_teacher(synth, tmp_path):
    """The KD property to test is imitation, not an absolute F1 bar
    (the val split here is 6 images — F1 thresholds are coin-flips):
    a freshly-seeded student trained with the soft-target loss must
    reproduce the teacher's val predictions."""
    t_tr, t_state, _, train, val = teacher_checkpoint(synth, tmp_path)
    _, t_arrays = t_tr.run_eval_epoch(t_state, val)
    scfg = config.TrainConfig(batch_size=8, num_epochs=5,
                              learning_rate=3e-3,
                              compute_dtype="float32",
                              save_best_after_epoch=1, seed=1)
    dtr = DistillTrainer("tiny_rgb", "tiny_rgb",
                         t_tr.variables(t_state),
                         DistillConfig(alpha=0.7, temperature=3.0),
                         scfg, {"rgb": config.rgb_modality()})
    state, history, best = dtr.fit(train, val,
                                   checkpoint_dir=tmp_path / "student",
                                   image_size=32, log=lambda s: None)
    assert history["train_loss"][-1] < history["train_loss"][0]
    m, s_arrays = dtr.run_eval_epoch(state, val)
    assert np.isfinite(m.f1)
    agree = np.mean(s_arrays["y_pred"] == t_arrays["y_pred"])
    assert agree >= 5 / 6       # measured: 1.0 at both alpha 0.7 and 1.0


def test_distill_cross_modal_teacher(synth, tmp_path):
    """Multimodal teacher -> RGB-only student: the step consumes the
    paired batch, teacher sees eval-normalized thermal."""
    from dfu_multimodal_tpu.data.loader import load_paired

    train = load_paired(synth, "train", 32, strategy="pseudo", seed=0)
    val = load_paired(synth, "val", 32, strategy="pseudo", seed=0)
    cfg = config.TrainConfig(batch_size=8, num_epochs=2,
                             learning_rate=3e-3, compute_dtype="float32",
                             save_best_after_epoch=1, seed=0)
    mods = {"rgb": config.rgb_modality(),
            "thermal": config.thermal_modality(blur=False)}
    t_tr = Trainer("tiny_fusion", cfg, mods)
    t_state, _, _ = t_tr.fit(train, val, checkpoint_dir=None,
                             image_size=32, log=lambda s: None)
    dtr = DistillTrainer("tiny_rgb", "tiny_fusion",
                         t_tr.variables(t_state),
                         DistillConfig(), cfg, mods)
    state, history, _ = dtr.fit(train, val, checkpoint_dir=None,
                                image_size=32, log=lambda s: None)
    assert np.isfinite(history["train_loss"]).all()


def test_distill_rejects_unsupported_combos(synth, tmp_path):
    cfg = config.TrainConfig(grad_accum=2)
    with pytest.raises(ValueError, match="not compose"):
        DistillTrainer("tiny_rgb", "tiny_rgb", {"params": {}},
                       DistillConfig(), cfg,
                       {"rgb": config.rgb_modality()})


def test_distill_rejects_missing_teacher_modality():
    cfg = config.TrainConfig()
    with pytest.raises(ValueError, match="lacks"):
        DistillTrainer("tiny_rgb", "tiny_fusion", {"params": {}},
                       DistillConfig(), cfg,
                       {"rgb": config.rgb_modality()})


# -------------------------------------------------------------------- CLI


def test_distill_cli_smoke_and_predict_consumes_student(synth, tmp_path):
    from dfu_multimodal_tpu.cli import distill as cli

    *_, ckpt, _, _ = teacher_checkpoint(synth, tmp_path)
    rc = cli.main(["--teacher-checkpoint", str(ckpt),
                   "--student", "tiny_rgb",
                   "--data-dir", str(synth),
                   "--checkpoint-root", str(tmp_path / "logs"),
                   "--image-size", "32", "--epochs", "2",
                   "--batch-size", "8", "--lr", "3e-3",
                   "--compute-dtype", "float32"])
    assert rc == 0
    out = tmp_path / "logs" / "checkpoints_tiny_rgb_distilled"
    assert (out / "test_results.pt").exists()
    import torch
    res = torch.load(out / "test_results.pt", weights_only=False)
    assert res["teacher_model"] == "tiny_rgb"
    assert 0.0 <= res["test_f1"] <= 1.0

    # the distilled checkpoint is a first-class artifact: predict must
    # resolve the student architecture from the checkpoint meta alone
    from dfu_multimodal_tpu.cli import predict as predict_cli
    csv_out = tmp_path / "preds.csv"
    predict_cli.main(["--checkpoint", str(out),
                      "--images", str(synth / "rgb" / "test" / "ulcer"),
                      "--output", str(csv_out), "--image-size", "32",
                      "--compute-dtype", "float32"])
    lines = csv_out.read_text().strip().splitlines()
    assert len(lines) >= 2 and lines[0].startswith("path,")


def test_int8_serving_rejects_unsupported_models():
    """quantize_for_serving guards its trunk-specific int8 paths: models
    without one must be rejected with the contract, not fail deep inside
    calibration (`predict --int8` funnels here)."""
    from dfu_multimodal_tpu.serve.engine import quantize_for_serving

    cfg = config.TrainConfig(compute_dtype="float32")
    tr = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    state = tr.init_state(jax.random.PRNGKey(0), image_size=32)
    with pytest.raises(ValueError, match="not supported"):
        quantize_for_serving(tr, state, image_size=32,
                             calib_u8=np.zeros((2, 32, 32, 3), np.uint8))


def test_resnet18_int8_serving_roundtrip():
    """The distilled student has a full int8 serving path: architecture
    auto-detected from the param tree (basic blocks, 2-2-2-2), quantized
    via the same quantize_for_serving chokepoint, logits tracking fp32."""
    from dfu_multimodal_tpu.serve.engine import quantize_for_serving

    cfg = config.TrainConfig(batch_size=4, eval_batch_size=4,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    mods = {"thermal": config.thermal_modality(blur=False)}
    tr = Trainer("resnet18_thermal", cfg, mods)
    state = tr.init_state(jax.random.PRNGKey(0), image_size=32)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    from dfu_multimodal_tpu.data.transforms import eval_normalize
    x = eval_normalize(jnp.asarray(imgs), mods["thermal"], jnp.float32)
    logits_fp = tr.module.apply(tr.variables(state), x, train=False)

    q_tr, q_state = quantize_for_serving(tr, state, image_size=32,
                                         calib_u8=imgs)
    logits_q8 = q_tr.module.apply(q_tr.variables(q_state), x, train=False)
    assert np.all(np.isfinite(logits_q8))
    assert float(np.max(np.abs(logits_q8 - logits_fp))) < 0.2
    # param tree really is the int8 one (no batch_stats, q8 kernels)
    params = q_state.params["ResNet_0"]
    assert "kernel_q8" in params["stage1_block0"]["conv1"]
    assert "proj" in params["stage2_block0"]
    assert "proj" not in params["stage1_block0"]
