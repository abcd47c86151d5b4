"""ResNet-path quantization-aware training (train/qat.py round 3):
conv-grid parity with the int8 serving quantizer, the BN-fold
equivariance the transform relies on, trunk transform scope, and an
end-to-end QAT-train -> int8-serving decision-flip rehearsal — the
mirror of tests/test_qat.py for the models/resnet_q8.py grid."""

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.models.resnet_q8 import quantize_conv_weight
from dfu_multimodal_tpu.train.qat import (fake_quant_conv_weight,
                                          fake_quant_resnet_trunks,
                                          fake_quant_trunks)


def test_fake_quant_conv_matches_serving_grid():
    """fake_quant_conv_weight must reproduce EXACTLY the dequantized
    value of models/resnet_q8.quantize_conv_weight — same per-output-
    channel scale, same rounding."""
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 32),
                          jnp.float32)
    q, s = quantize_conv_weight(w)
    np.testing.assert_array_equal(np.asarray(fake_quant_conv_weight(w)),
                                  np.asarray(q.astype(jnp.float32) * s))


def test_bn_fold_equivariance():
    """The claim that lets QAT skip BN folding: per-output-channel
    symmetric quantization commutes with the per-channel BN fold scalar
    (including negative gammas), so quantdequant(w*s) == quantdequant(w)*s
    and fake-quanting the UNFOLDED kernel injects exactly serving's
    fold-then-quantize error."""
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 24),
                          jnp.float32)
    s_bn = jax.random.normal(jax.random.PRNGKey(2), (24,)) * 2.0  # +/- vals
    q_folded, sc = quantize_conv_weight(w * s_bn)
    folded_dq = np.asarray(q_folded.astype(jnp.float32) * sc)
    want = np.asarray(fake_quant_conv_weight(w)) * np.asarray(s_bn)
    np.testing.assert_allclose(folded_dq, want, rtol=1e-6, atol=1e-7)


def test_straight_through_conv_gradient_is_identity():
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 4, 8), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(fake_quant_conv_weight(x) * 3.0))(w)
    np.testing.assert_array_equal(np.asarray(g), np.full_like(w, 3.0))


def test_on_grid_conv_weights_requantize_losslessly():
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 16, 32),
                          jnp.float32)
    fq = np.asarray(fake_quant_conv_weight(w))
    q, s = quantize_conv_weight(fq)
    np.testing.assert_allclose(np.asarray(q.astype(jnp.float32) * s), fq,
                               rtol=0, atol=1e-12)


def test_resnet_trunk_transform_scope():
    """Stage convs (incl. down/proj projections) snap; the stem conv
    (serving keeps it bf16), BN scopes, and non-ResNet scopes are
    untouched; trees without a ResNet trunk pass through."""
    k = jax.random.PRNGKey(5)
    params = {
        "rgb_branch": {
            "stem_conv": {"kernel": jax.random.normal(k, (7, 7, 3, 8))},
            "stem_bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            "stage1_block0": {
                "conv1": {"kernel": jax.random.normal(k, (1, 1, 8, 4))},
                "bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                "down_conv": {"kernel": jax.random.normal(k, (1, 1, 8, 16))},
                "down_bn": {"scale": jnp.ones(16), "bias": jnp.zeros(16)},
            },
        },
        "head": {"kernel": jnp.ones((16, 2))},
    }
    out = fake_quant_resnet_trunks(params)
    blk = out["rgb_branch"]["stage1_block0"]
    src = params["rgb_branch"]["stage1_block0"]
    assert not np.array_equal(np.asarray(blk["conv1"]["kernel"]),
                              np.asarray(src["conv1"]["kernel"]))
    assert not np.array_equal(np.asarray(blk["down_conv"]["kernel"]),
                              np.asarray(src["down_conv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(blk["bn1"]["scale"]),
                                  np.asarray(src["bn1"]["scale"]))
    np.testing.assert_array_equal(
        np.asarray(out["rgb_branch"]["stem_conv"]["kernel"]),
        np.asarray(params["rgb_branch"]["stem_conv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(out["head"]["kernel"]),
                                  np.asarray(params["head"]["kernel"]))
    # no ResNet trunk -> unchanged
    vit_only = {"ViT_0": {"encoder": {}, "patch_embed": {}}}
    assert fake_quant_resnet_trunks(vit_only) == vit_only
    # the combined transform covers both trunk kinds without crosstalk
    both = fake_quant_trunks(params)
    np.testing.assert_array_equal(
        np.asarray(both["rgb_branch"]["stage1_block0"]["conv1"]["kernel"]),
        np.asarray(blk["conv1"]["kernel"]))


def test_qat_rgb_training_then_int8_serving_flip_check(tmp_path):
    """End-to-end rehearsal: train rgb_only ONE epoch with cfg.qat (the
    engine now snaps ResNet stage convs in the loss), verify (a) the
    trained kernels' fold-then-quantize error equals the fake-quant
    error bit-for-bit (the losslessness contract on REAL weights + real
    BN stats), and (b) the actual int8 serving rebuild decides like the
    QAT eval path on the training images (decision-flip check; the only
    remaining int8 error source is the calibrated activation grid)."""
    from dfu_multimodal_tpu.data import (load_single_modality,
                                         make_synthetic_dataset)
    from dfu_multimodal_tpu.models.resnet_q8 import _fold
    from dfu_multimodal_tpu.serve.engine import quantize_for_serving
    from dfu_multimodal_tpu.train.engine import Trainer

    root = tmp_path / "synth"
    make_synthetic_dataset(root, images_per_class=8, size=32)
    train = load_single_modality(root / "rgb", "train", image_size=32,
                                 modality="rgb")
    cfg = config.TrainConfig(batch_size=8, num_epochs=1,
                             compute_dtype="float32", drop_rate=0.0,
                             qat=True, seed=0)
    trainer = Trainer("rgb_only", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    state, m = trainer.run_train_epoch(state, train,
                                       np.random.default_rng(0),
                                       jax.random.PRNGKey(1))
    assert np.isfinite(m.loss)

    # (a) grid contract on the trained tree: quantizing the BN-folded
    # kernel reproduces fake_quant(w) * fold_scale exactly
    trunk = state.params["ResNet_0"] if "ResNet_0" in state.params \
        else state.params["rgb_branch"]
    stats_root = state.batch_stats["ResNet_0"] \
        if "ResNet_0" in state.batch_stats else state.batch_stats["rgb_branch"]
    blk, bn = trunk["stage1_block0"], stats_root["stage1_block0"]
    w_f, _b = _fold({**blk["conv1"]},
                    {**blk["bn1"], **bn["bn1"]})
    q, s = quantize_conv_weight(w_f)
    s_bn = np.asarray(blk["bn1"]["scale"]) * np.asarray(
        jax.lax.rsqrt(bn["bn1"]["var"] + 1e-5))
    np.testing.assert_allclose(
        np.asarray(q.astype(jnp.float32) * s),
        np.asarray(fake_quant_conv_weight(blk["conv1"]["kernel"])) * s_bn,
        rtol=1e-5, atol=1e-6)

    # (b) decision-flip rehearsal through the REAL int8 serving rebuild
    imgs = train.arrays["rgb"][:8]
    batch = jax.device_put({"rgb": np.asarray(imgs),
                            "label": np.zeros(8, np.int32),
                            "valid": np.ones(8, np.float32)},
                           trainer.batch_sharding)
    out_qat = trainer.eval_step(trainer.variables(state), batch)
    q_trainer, q_state = quantize_for_serving(
        trainer, state, image_size=32, calib_u8=imgs)
    out_int8 = q_trainer.eval_step(q_trainer.variables(q_state), batch)
    flips = int(np.sum(np.asarray(out_qat["preds"])
                       != np.asarray(out_int8["preds"])))
    assert flips == 0, (
        f"{flips}/8 decisions flipped between QAT eval and int8 serving")
    np.testing.assert_allclose(np.asarray(out_int8["probs"]),
                               np.asarray(out_qat["probs"]), atol=0.1)
