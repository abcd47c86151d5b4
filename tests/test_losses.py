"""Focal loss and mixup (train/engine.py): math oracles, padding
semantics, engine integration, composition rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.train.engine import (Trainer, mixup_batch,
                                             mixup_loss, per_sample_ce,
                                             per_sample_focal,
                                             weighted_ce, weighted_mean)


# ------------------------------------------------------------------ focal


def test_focal_gamma_zero_is_ce():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    labels = jnp.asarray([0, 1, 1, 0, 1])
    np.testing.assert_allclose(per_sample_focal(logits, labels, 0.0),
                               per_sample_ce(logits, labels), rtol=1e-6)


def test_focal_matches_manual_oracle():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 6)
    gamma = 2.0

    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    py = p[np.arange(6), labels]
    want = (1 - py) ** gamma * (-np.log(py))
    got = per_sample_focal(jnp.asarray(logits), jnp.asarray(labels), gamma)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_downweights_easy_examples():
    easy = jnp.asarray([[6.0, -6.0]])     # confident correct
    hard = jnp.asarray([[0.1, -0.1]])
    y = jnp.asarray([0])
    ratio_ce = float((per_sample_ce(easy, y) / per_sample_ce(hard, y))[0])
    ratio_fl = float((per_sample_focal(easy, y, 2.0)
                      / per_sample_focal(hard, y, 2.0))[0])
    assert ratio_fl < ratio_ce * 0.01     # easy example crushed


# ------------------------------------------------------------------ mixup


def test_mixup_batch_mixes_with_partner():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)
    valid = jnp.ones(4)
    (mixed,), perm, lam_row = mixup_batch(rng, (x,), valid, alpha=0.4)
    lam = lam_row[0]
    np.testing.assert_allclose(
        mixed, x * lam + x[perm] * (1 - lam), rtol=1e-6)
    assert 0.0 <= float(lam) <= 1.0


def test_mixup_padding_never_bleeds():
    """Rows whose permutation partner is padding keep lam=1 (original
    pixels untouched)."""
    rng = jax.random.PRNGKey(3)
    x = jnp.ones((6, 2)) * jnp.arange(6)[:, None]
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    (mixed,), perm, lam_row = mixup_batch(rng, (x,), valid, alpha=0.4)
    for i in range(6):
        if valid[perm[i]] == 0:
            assert float(lam_row[i]) == 1.0
            np.testing.assert_allclose(mixed[i], x[i])


def test_mixup_loss_reduces_to_weighted_mean_at_lam1():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    labels = jnp.asarray([0, 1, 0, 1])
    w = jnp.asarray([1.0, 2.0, 1.0, 0.5])
    valid = jnp.ones(4)
    perm = jnp.asarray([2, 3, 0, 1])
    got = mixup_loss(per_sample_ce, logits, labels, w, valid, perm,
                     jnp.ones(4))
    want = weighted_mean(per_sample_ce(logits, labels), w)
    assert float(got) == pytest.approx(float(want), rel=1e-6)


def test_mixup_loss_invalid_rows_contribute_nothing():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 2)).astype(np.float32)
    labels = np.asarray([0, 1])
    base_perm = np.asarray([1, 0])
    lam = np.asarray([0.7, 0.7], np.float32)
    base = mixup_loss(per_sample_ce, jnp.asarray(logits),
                      jnp.asarray(labels), jnp.ones(2), jnp.ones(2),
                      jnp.asarray(base_perm), jnp.asarray(lam))
    # append two padded rows mixing into each other
    logits_p = np.concatenate([logits,
                               rng.normal(size=(2, 2)).astype(np.float32)])
    labels_p = np.concatenate([labels, [0, 0]])
    valid = jnp.asarray([1, 1, 0, 0], jnp.float32)
    perm_p = jnp.asarray([1, 0, 3, 2])
    lam_p = jnp.asarray([0.7, 0.7, 0.7, 0.7])
    padded = mixup_loss(per_sample_ce, jnp.asarray(logits_p),
                        jnp.asarray(labels_p), valid, valid, perm_p, lam_p)
    assert float(padded) == pytest.approx(float(base), rel=1e-5)


# ----------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("loss_synth")
    make_synthetic_dataset(root, images_per_class=16, size=32)
    train = load_single_modality(root / "rgb", "train", 32, "rgb")
    val = load_single_modality(root / "rgb", "val", 32, "rgb")
    return train, val


def make_trainer(**overrides):
    defaults = dict(batch_size=8, num_epochs=3, learning_rate=3e-3,
                    save_best_after_epoch=1, compute_dtype="float32",
                    seed=0)
    defaults.update(overrides)
    return Trainer("tiny_rgb", config.TrainConfig(**defaults),
                   {"rgb": config.rgb_modality()})


def test_engine_trains_with_focal(synth):
    train, val = synth
    trainer = make_trainer(loss="focal", focal_gamma=2.0)
    state, history, _ = trainer.fit(train, val, checkpoint_dir=None,
                                    image_size=32, log=lambda s: None)
    assert np.isfinite(history["train_loss"]).all()
    assert history["train_loss"][-1] < history["train_loss"][0]


def test_engine_trains_with_mixup(synth):
    train, val = synth
    trainer = make_trainer(mixup_alpha=0.4)
    state, history, _ = trainer.fit(train, val, checkpoint_dir=None,
                                    image_size=32, log=lambda s: None)
    assert np.isfinite(history["train_loss"]).all()


def test_focal_composes_with_grad_accum():
    """Accumulated focal loss == full-batch focal loss (the Σw
    normalization argument holds for any per-sample loss).  Uses the
    no-BN, no-dropout ViT so the only difference between the paths is
    the microbatch split (same recipe as test_engine's accum test)."""
    rng = np.random.default_rng(0)
    batch_np = {
        "thermal": rng.integers(0, 256, (8, 32, 32, 3)).astype(np.uint8),
        "label": np.asarray([0, 1] * 4, np.int32),
        "valid": np.ones(8, np.float32),
    }
    losses = {}
    for accum in (1, 4):
        cfg = config.TrainConfig(batch_size=8, num_epochs=1,
                                 compute_dtype="float32", drop_rate=0.0,
                                 optimizer_mu_dtype="float32", seed=0,
                                 loss="focal", focal_gamma=2.0,
                                 grad_accum=accum)
        trainer = Trainer("thermal_only", cfg,
                          {"thermal": config.thermal_modality()},
                          attention_impl="xla")
        state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
        batch = jax.device_put(batch_np, trainer.batch_sharding)
        _, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        losses[accum] = float(m["loss"])
    assert losses[4] == pytest.approx(losses[1], rel=1e-6)


def test_mixup_rejects_grad_accum():
    with pytest.raises(ValueError, match="mixup"):
        make_trainer(mixup_alpha=0.2, grad_accum=2).build_train_step()


def test_unknown_loss_rejected():
    with pytest.raises(ValueError, match="unknown loss"):
        make_trainer(loss="hinge").build_train_step()
