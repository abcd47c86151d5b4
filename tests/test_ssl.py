"""Self-supervised pretraining (train/ssl.py): NT-Xent correctness, MAE
masking semantics, smoke pretraining runs, and --init-from compatibility
of the produced checkpoints."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.models.vit import ViT
from dfu_multimodal_tpu.train.ssl import (MAEModel, PretrainConfig,
                                          SimCLRModel, SSLTrainer,
                                          alias_model_state,
                                          keep_mask_from_ids,
                                          masked_pixel_loss, nt_xent_loss,
                                          patchify, random_keep_ids)

SMALL_VIT = dict(vit_patch=8, vit_hidden=32, vit_depth=2, vit_heads=4)


def random_images(n=32, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)


def memory_dataset(n=32, size=32, modality="rgb", seed=0):
    return ArrayDataset(
        arrays={modality: random_images(n, size, seed)},
        labels=np.zeros(n, np.int32),
        paths={modality: [None] * n})


# ----------------------------------------------------------------- NT-Xent


def naive_nt_xent(z1, z2, temperature):
    """Loop-and-log SimCLR loss, straight from the paper's Eq. 1."""
    z = np.concatenate([z1, z2]).astype(np.float64)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    n2 = len(z)
    b = n2 // 2
    sims = z @ z.T / temperature
    losses = []
    for i in range(n2):
        pos = i + b if i < b else i - b
        denom = sum(np.exp(sims[i, j]) for j in range(n2) if j != i)
        losses.append(-np.log(np.exp(sims[i, pos]) / denom))
    return float(np.mean(losses))


def test_nt_xent_matches_naive():
    rng = np.random.default_rng(0)
    z1 = rng.normal(size=(6, 8)).astype(np.float32)
    z2 = rng.normal(size=(6, 8)).astype(np.float32)
    got = float(nt_xent_loss(jnp.asarray(z1), jnp.asarray(z2),
                             jnp.ones(6), temperature=0.3))
    assert got == pytest.approx(naive_nt_xent(z1, z2, 0.3), rel=1e-5)


def test_nt_xent_padded_rows_are_inert():
    """Fixed-shape batch tail: padded rows contribute neither as anchors
    nor as negatives, so the loss equals the unpadded computation."""
    rng = np.random.default_rng(1)
    z1 = rng.normal(size=(5, 8)).astype(np.float32)
    z2 = rng.normal(size=(5, 8)).astype(np.float32)
    base = float(nt_xent_loss(jnp.asarray(z1), jnp.asarray(z2), jnp.ones(5)))
    pad = rng.normal(size=(3, 8)).astype(np.float32)
    z1p = jnp.asarray(np.concatenate([z1, pad]))
    z2p = jnp.asarray(np.concatenate([z2, pad * 2]))
    valid = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    padded = float(nt_xent_loss(z1p, z2p, valid))
    assert padded == pytest.approx(base, rel=1e-5)
    # and the gradient through padded rows stays finite (the -1e9 mask
    # instead of -inf is load-bearing here)
    g = jax.grad(lambda a, b: nt_xent_loss(a, b, valid))(z1p, z2p)
    assert np.all(np.isfinite(np.asarray(g)))


def test_nt_xent_perfect_alignment_is_low():
    z = jnp.asarray(np.eye(4, 8, dtype=np.float32) * 10)
    aligned = float(nt_xent_loss(z, z, jnp.ones(4), temperature=0.1))
    shuffled = float(nt_xent_loss(z, jnp.roll(z, 1, axis=0), jnp.ones(4),
                                  temperature=0.1))
    assert aligned < shuffled


# -------------------------------------------------------------------- MAE


def test_patchify_matches_vit_patch_layout():
    """patchify must index patches exactly like the ViT patch embed, so
    keep_ids refer to the same patch in encoder and loss."""
    x = jnp.asarray(np.arange(2 * 16 * 16 * 3, dtype=np.float32)
                    .reshape(2, 16, 16, 3))
    patches = patchify(x, 8)                       # (2, 4, 192)
    # patch (row 0, col 1) = x[:, 0:8, 8:16, :]
    manual = x[:, 0:8, 8:16, :].reshape(2, -1)
    np.testing.assert_array_equal(np.asarray(patches[:, 1]),
                                  np.asarray(manual))


def test_keep_ids_gather_matches_full_forward():
    """keep_ids=arange(P) must reproduce the unmasked token sequence."""
    vit = ViT(patch_size=8, hidden_dim=32, depth=2, num_heads=4,
              dtype=jnp.float32, attention_impl="xla", block_impl="flax")
    x = jnp.asarray(random_images(2, 32, seed=2), jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x)
    full = vit.apply(variables, x, return_tokens=True)
    keep = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32), (2, 16))
    gathered = vit.apply(variables, x, keep_ids=keep, return_tokens=True)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(full),
                               atol=1e-5)


def test_random_keep_ids_no_duplicates():
    ids = np.asarray(random_keep_ids(jax.random.PRNGKey(0), 8, 196, 49))
    assert ids.shape == (8, 49)
    for row in ids:
        assert len(set(row.tolist())) == 49
    mask = np.asarray(keep_mask_from_ids(jnp.asarray(ids), 196))
    assert mask.shape == (8, 196)
    np.testing.assert_array_equal(mask.sum(axis=1), np.full(8, 49.0))


def test_masked_pixel_loss_only_counts_masked_patches():
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    keep_ids = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    valid = jnp.ones(2)
    # prediction equal to the normalized target -> zero loss
    mean = target.mean(axis=-1, keepdims=True)
    var = target.var(axis=-1, keepdims=True)
    normed = (target - mean) / jnp.sqrt(var + 1e-6)
    assert float(masked_pixel_loss(normed, target, keep_ids, valid)) == \
        pytest.approx(0.0, abs=1e-6)
    # corrupting VISIBLE patches does not change the loss
    pred = normed.at[0, 0].add(100.0).at[1, 3].add(-50.0)
    assert float(masked_pixel_loss(pred, target, keep_ids, valid)) == \
        pytest.approx(0.0, abs=1e-6)
    # corrupting a MASKED patch does
    pred = normed.at[0, 2].add(1.0)
    assert float(masked_pixel_loss(pred, target, keep_ids, valid)) > 0.1


# ------------------------------------------------------------ smoke train


def make_cfg(**over):
    base = dict(batch_size=16, num_epochs=6, learning_rate=1e-3,
                warmup_epochs=1.0, compute_dtype="float32", seed=0,
                **SMALL_VIT)
    base.update(over)
    return PretrainConfig(**base)


def test_simclr_tiny_smoke_learns(tmp_path):
    cfg = make_cfg(method="simclr")
    trainer = SSLTrainer("tiny", cfg, config.rgb_modality(), image_size=32)
    ds = memory_dataset(n=32, size=32)
    state, history = trainer.fit(ds, tmp_path / "ckpt", log=lambda s: None)
    losses = history["loss"]
    assert len(losses) == 6
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_mae_small_vit_smoke_learns(tmp_path):
    root = tmp_path / "data"
    make_synthetic_dataset(root, images_per_class=12, size=32)
    ds = load_single_modality(root / "thermal", "train", image_size=32,
                              modality="thermal")
    cfg = make_cfg(method="mae", num_epochs=8, mask_ratio=0.75,
                   decoder_dim=32, decoder_depth=1, decoder_heads=4)
    trainer = SSLTrainer("vit", cfg, config.thermal_modality(),
                         image_size=32)
    state, history = trainer.fit(ds, tmp_path / "ckpt", log=lambda s: None)
    losses = history["loss"]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_mae_rejects_non_vit_trunk():
    with pytest.raises(ValueError, match="ViT trunk"):
        SSLTrainer("resnet", make_cfg(method="mae"),
                   config.rgb_modality(), image_size=32)


def test_ssl_resume_continues(tmp_path):
    ds = memory_dataset(n=16, size=32)
    cfg = make_cfg(method="simclr", num_epochs=2, batch_size=8)
    t1 = SSLTrainer("tiny", cfg, config.rgb_modality(), image_size=32)
    t1.fit(ds, tmp_path / "ck", log=lambda s: None)
    cfg2 = make_cfg(method="simclr", num_epochs=4, batch_size=8)
    t2 = SSLTrainer("tiny", cfg2, config.rgb_modality(), image_size=32)
    _, history = t2.fit(ds, tmp_path / "ck", log=lambda s: None,
                        resume=True)
    # 2 epochs from the first run + 2 continued
    assert len(history["loss"]) == 4


# ------------------------------------------------- checkpoint compatibility


def test_simclr_resnet_checkpoint_warm_starts_classifier(tmp_path):
    """End-to-end: SimCLR-pretrain the real ResNet50 trunk (1 epoch at
    32px), then --init-from-style restore into the rgb_only Trainer; the
    trunk must arrive bit-exactly, head stays fresh."""
    from dfu_multimodal_tpu.train.engine import Trainer

    ds = memory_dataset(n=8, size=32)
    cfg = make_cfg(method="simclr", num_epochs=1, batch_size=8,
                   warmup_epochs=0.5)
    ssl_tr = SSLTrainer("resnet", cfg, config.rgb_modality(), image_size=32)
    state, _ = ssl_tr.fit(ds, tmp_path / "ck", log=lambda s: None)

    tcfg = config.TrainConfig(batch_size=8, num_epochs=1,
                              compute_dtype="float32")
    trainer = Trainer("rgb_only", tcfg, {"rgb": config.rgb_modality()})
    restored = trainer.restore(tmp_path / "ck", image_size=32,
                               with_opt_state=False)
    got = jax.tree.leaves(restored.params["ResNet_0"])
    want = jax.tree.leaves(state.params["ResNet_0"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # BatchNorm running stats travel too
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.batch_stats["ResNet_0"])[0]),
        np.asarray(jax.tree.leaves(state.batch_stats["ResNet_0"])[0]))


def test_alias_scopes_cover_fusion_branches():
    """The saved model_state carries rgb_branch/thermal_branch aliases so
    one pretrain checkpoint also warm-starts the multimodal model."""
    ms = {"params": {"ResNet_0": {"w": np.ones(2)},
                     "proj_fc1": {"kernel": np.ones(2)}},
          "batch_stats": {"ResNet_0": {"mean": np.zeros(2)}}}
    out = alias_model_state(ms)
    assert "rgb_branch" in out["params"]
    assert "rgb_branch" in out["batch_stats"]
    np.testing.assert_array_equal(out["params"]["rgb_branch"]["w"],
                                  ms["params"]["ResNet_0"]["w"])


def test_ssl_vit_param_tree_matches_classifier_abstractly():
    """jax.eval_shape check (no FLOPs): the MAE/SimCLR ViT trunk scope has
    exactly the ViTClassifier trunk's parameter shapes, for the default
    ViT-B/16 config — the merge that --init-from performs is total."""
    from dfu_multimodal_tpu.models.vit import ViTClassifier

    x224 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    clf = ViTClassifier(block_impl="flax", attention_impl="xla")
    clf_shapes = jax.eval_shape(
        lambda r: clf.init(r, x224), jax.random.PRNGKey(0))

    mae = MAEModel(vit_cfg=(16, 768, 12, 12), decoder_dim=64,
                   decoder_depth=1, decoder_heads=4)
    ids = jnp.zeros((1, 49), jnp.int32)
    mae_shapes = jax.eval_shape(
        lambda r: mae.init(r, x224, ids), jax.random.PRNGKey(0))

    sim = SimCLRModel(trunk="vit", block_impl="flax", attention_impl="xla")
    sim_shapes = jax.eval_shape(
        lambda r: sim.init(r, x224), jax.random.PRNGKey(0))

    def shapes(tree):
        return jax.tree.map(lambda s: (s.shape, str(s.dtype)), tree)

    want = shapes(clf_shapes["params"]["ViT_0"])
    assert shapes(mae_shapes["params"]["ViT_0"]) == want
    assert shapes(sim_shapes["params"]["ViT_0"]) == want


def test_simclr_loss_identical_across_mesh_shapes(tmp_path):
    """Global-negatives property: the jitted SimCLR step computes the SAME
    loss whether the batch is sharded over 8 devices or 1 — the (2B, 2B)
    similarity matrix always spans the global batch."""
    ds = memory_dataset(n=16, size=32)
    losses = {}
    for data_axis in (1, -1):
        cfg = make_cfg(method="simclr", num_epochs=1, batch_size=16,
                       mesh=config.MeshConfig(data=data_axis))
        tr = SSLTrainer("tiny", cfg, config.rgb_modality(), image_size=32)
        _, history = tr.fit(ds, tmp_path / f"ssl_mesh_{data_axis}",
                            log=lambda s: None)
        losses[data_axis] = history["loss"][0]
    assert losses[1] == pytest.approx(losses[-1], rel=2e-4)


def test_project_views_concat_equals_two_pass():
    """Round-5 step optimization: BN-free trunks project both SimCLR
    views in ONE concatenated forward (`SSLTrainer._project_views`).
    This must be row-wise IDENTICAL to the original two-pass form
    (LayerNorm/attention are per-image) — pin it directly, since all the
    parity tests now run the concat form on both sides.  BN trunks must
    keep the two-pass form (concat would change the batch statistics)."""
    import jax.numpy as jnp

    cfg = make_cfg(method="simclr", batch_size=4)
    tr = SSLTrainer("vit", cfg, config.thermal_modality(), image_size=32)
    state = tr.init_state(jax.random.PRNGKey(0), steps_per_epoch=2)
    rng = np.random.default_rng(3)
    v1 = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    z1c, z2c, _ = tr._project_views(state.params, state.batch_stats,
                                    v1, v2)
    z1, _ = tr._apply_simclr(state.params, state.batch_stats, v1)
    z2, _ = tr._apply_simclr(state.params, state.batch_stats, v2)
    np.testing.assert_allclose(np.asarray(z1c), np.asarray(z1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z2c), np.asarray(z2),
                               atol=1e-5)

    # BN trunk: _project_views must thread batch stats view1 -> view2
    # (the two-pass form), not concatenate
    tr_bn = SSLTrainer("tiny", cfg, config.rgb_modality(), image_size=32)
    st_bn = tr_bn.init_state(jax.random.PRNGKey(0), steps_per_epoch=2)
    assert st_bn.batch_stats
    z1b, z2b, bs = tr_bn._project_views(st_bn.params, st_bn.batch_stats,
                                        v1, v2)
    z1r, bs_r = tr_bn._apply_simclr(st_bn.params, st_bn.batch_stats, v1)
    z2r, bs_r = tr_bn._apply_simclr(st_bn.params, bs_r, v2)
    np.testing.assert_allclose(np.asarray(z1b), np.asarray(z1r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z2b), np.asarray(z2r),
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(bs), jax.tree.leaves(bs_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_simclr_color_jitter_toggle():
    """simclr_color_jitter=False keeps the views color-sensitive; the
    thermal base (no jitter) never gains jitter either way."""
    from dfu_multimodal_tpu.train.ssl import ssl_modality

    rgb = config.rgb_modality()
    assert ssl_modality(rgb, "simclr", True).augment.color_jitter
    assert not ssl_modality(rgb, "simclr", False).augment.color_jitter
    th = config.thermal_modality()
    assert not ssl_modality(th, "simclr", True).augment.color_jitter
    # MAE views never jitter (pixel reconstruction target)
    assert not ssl_modality(rgb, "mae").augment.color_jitter


def test_hard_synthetic_variant(tmp_path):
    """difficulty='hard' (SSL-rehearsal data) produces valid images whose
    class signal is subtler than the default; the default stays unchanged."""
    from dfu_multimodal_tpu.data.synthetic import make_image

    rng = np.random.default_rng(0)
    for modality in ("rgb", "thermal"):
        img_h = make_image(np.random.default_rng(1), modality, 0, 64,
                           difficulty="hard")
        img_u = make_image(np.random.default_rng(1), modality, 1, 64,
                           difficulty="hard")
        assert img_h.shape == (64, 64, 3) and img_h.dtype == np.uint8
        assert not np.array_equal(img_h, img_u)   # label changes the image
    # easy default is bit-identical to the pre-difficulty behavior for a
    # fixed generator stream (same rng consumption order)
    a = make_image(np.random.default_rng(5), "rgb", 1, 64)
    b = make_image(np.random.default_rng(5), "rgb", 1, 64,
                   difficulty="easy")
    np.testing.assert_array_equal(a, b)
    make_synthetic_dataset(tmp_path / "hard", images_per_class=4, size=32,
                           difficulty="hard")
    assert len(list((tmp_path / "hard").rglob("*.jpg"))) > 0


# ---------------------------------------------------------------- CLI


def test_pretrain_cli_smoke(tmp_path):
    from dfu_multimodal_tpu.cli import pretrain as cli

    root = tmp_path / "data"
    make_synthetic_dataset(root, images_per_class=8, size=32)
    out = tmp_path / "pre"
    rc = cli.main(["--data-dir", str(root), "--out", str(out),
                   "--modality", "rgb", "--method", "simclr",
                   "--trunk", "tiny", "--image-size", "32",
                   "--batch-size", "8", "--epochs", "2",
                   "--compute-dtype", "float32"])
    assert rc == 0
    assert (out / "best_model.msgpack").exists()
    assert (out / "run_info.json").exists()
    import json
    meta = json.loads((out / "best_model.meta.json").read_text())
    assert meta["ssl_method"] == "simclr"
    assert len(meta["history"]["loss"]) == 2
