"""Quantization-aware training: STE grid parity with the int8 serving
quantizer, lossless requantization of on-grid weights, and an engine-level
smoke that QAT training converges and quantizes with zero decision flips."""

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.ops.vit_block_q8 import quantize_weight
from dfu_multimodal_tpu.train.qat import (fake_quant_weight,
                                          fake_quant_vit_trunks)


def test_fake_quant_matches_serving_grid():
    """fake_quant_weight must reproduce EXACTLY the dequantized value of
    ops/vit_block_q8.quantize_weight — same scale, same rounding."""
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    q, s = quantize_weight(w)
    np.testing.assert_array_equal(np.asarray(fake_quant_weight(w)),
                                  np.asarray(q.astype(jnp.float32) * s))


def test_fake_quant_scanned_stack_matches_vmapped_quantizer():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 16), jnp.float32)
    q, s = jax.vmap(quantize_weight)(w)
    np.testing.assert_array_equal(
        np.asarray(fake_quant_weight(w)),
        np.asarray(q.astype(jnp.float32) * s[:, None, :]))


def test_straight_through_gradient_is_identity():
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 8), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(fake_quant_weight(x) * 3.0))(w)
    np.testing.assert_array_equal(np.asarray(g), np.full_like(w, 3.0))


def test_on_grid_weights_requantize_losslessly():
    """The QAT contract: a fake-quanted weight sits ON the serving grid —
    its absmax element maps to exactly +-127*scale, so quantize_weight of
    it reproduces the identical dequantized tensor."""
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 48), jnp.float32)
    fq = np.asarray(fake_quant_weight(w))
    q, s = quantize_weight(fq)
    np.testing.assert_allclose(np.asarray(q.astype(jnp.float32) * s), fq,
                               rtol=0, atol=1e-12)


def test_trunk_transform_scope():
    """Only the four quantized matmuls of ViT trunks change; LN, biases,
    other branches and heads are untouched; no-ViT models pass through."""
    k = jax.random.PRNGKey(4)
    blk = {"ln1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
           "attn": {"qkv": {"kernel": jax.random.normal(k, (8, 24)),
                            "bias": jnp.zeros(24)},
                    "proj": {"kernel": jax.random.normal(k, (8, 8)),
                             "bias": jnp.zeros(8)}},
           "mlp_fc1": {"kernel": jax.random.normal(k, (8, 32)),
                       "bias": jnp.zeros(32)},
           "mlp_fc2": {"kernel": jax.random.normal(k, (32, 8)),
                       "bias": jnp.zeros(8)}}
    params = {"thermal_branch": {"encoder": blk,
                                 "patch_embed": {"kernel": jnp.ones((12, 8))}},
              "head": {"kernel": jnp.ones((8, 2))}}
    out = fake_quant_vit_trunks(params)
    tb = out["thermal_branch"]["encoder"]
    assert not np.array_equal(np.asarray(tb["attn"]["qkv"]["kernel"]),
                              np.asarray(blk["attn"]["qkv"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(tb["ln1"]["scale"]),
                                  np.asarray(blk["ln1"]["scale"]))
    np.testing.assert_array_equal(np.asarray(tb["attn"]["qkv"]["bias"]),
                                  np.asarray(blk["attn"]["qkv"]["bias"]))
    np.testing.assert_array_equal(
        np.asarray(out["thermal_branch"]["patch_embed"]["kernel"]),
        np.asarray(params["thermal_branch"]["patch_embed"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(out["head"]["kernel"]),
                                  np.asarray(params["head"]["kernel"]))
    # a tree with no encoder scopes is returned unchanged
    plain = {"rgb_branch": {"stem_conv": {"kernel": jnp.ones((3, 3))}}}
    assert fake_quant_vit_trunks(plain) is not None
    np.testing.assert_array_equal(
        np.asarray(fake_quant_vit_trunks(plain)["rgb_branch"]["stem_conv"]
                   ["kernel"]),
        np.asarray(plain["rgb_branch"]["stem_conv"]["kernel"]))


def test_qat_training_then_int8_serving_zero_flips(tmp_path):
    """End-to-end contract: train thermal_only with cfg.qat, then quantize
    the trained weights for int8 serving — the dequantized kernels must
    equal the fake-quant forward's weights bit-for-bit IF the final state
    is re-snapped (weights move off-grid by one optimizer step), and
    decisions must not flip between the QAT eval path and the quantized
    path."""
    from dfu_multimodal_tpu.data import make_synthetic_dataset, \
        load_single_modality
    from dfu_multimodal_tpu.models.vit import quantize_variables
    from dfu_multimodal_tpu.train.engine import Trainer

    root = tmp_path / "synth"
    make_synthetic_dataset(root, images_per_class=8, size=32)
    train = load_single_modality(root / "thermal", "train", image_size=32,
                                 modality="thermal")
    cfg = config.TrainConfig(batch_size=8, num_epochs=1,
                             compute_dtype="float32", drop_rate=0.0,
                             qat=True, seed=0)
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality()},
                      attention_impl="xla")
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    state, m = trainer.run_train_epoch(state, train,
                                       np.random.default_rng(0),
                                       jax.random.PRNGKey(1))
    assert np.isfinite(m.loss)

    # QAT eval (fake-quant weights) vs true int8-grid dequant weights:
    # identical probabilities, because eval and quantize share the grid.
    imgs = train.arrays["thermal"][:8]
    batch = jax.device_put({"thermal": np.asarray(imgs),
                            "label": np.zeros(8, np.int32),
                            "valid": np.ones(8, np.float32)},
                           trainer.batch_sharding)
    out_qat = trainer.eval_step(trainer.variables(state), batch)

    qvars = quantize_variables(trainer.variables(state))
    # dequantize back to fp32 and run through the PLAIN (non-QAT) engine:
    # must match the QAT eval bit-for-bit since both use grid weights
    enc = qvars["params"]["ViT_0"]["encoder"]
    deq_trainer = Trainer("thermal_only",
                          config.TrainConfig(batch_size=8,
                                             compute_dtype="float32",
                                             drop_rate=0.0, seed=0),
                          {"thermal": config.thermal_modality()},
                          attention_impl="xla")
    deq_state = deq_trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    deq_params = jax.tree.map(lambda x: x, state.params)  # copy structure
    vit = dict(deq_params["ViT_0"])
    blk = dict(vit["encoder"])
    for name, sub in (("mlp_fc1", enc["mlp_fc1"]),
                      ("mlp_fc2", enc["mlp_fc2"])):
        k = sub["kernel_q8"].astype(jnp.float32) * sub["scale"][:, None, :]
        blk[name] = {**blk[name], "kernel": k}
    attn = dict(blk["attn"])
    for name in ("qkv", "proj"):
        sub = enc["attn"][name]
        attn[name] = {**attn[name],
                      "kernel": sub["kernel_q8"].astype(jnp.float32)
                      * sub["scale"][:, None, :]}
    blk["attn"] = attn
    vit["encoder"] = blk
    deq_params = {**deq_params, "ViT_0": vit}
    deq_state = deq_state.replace(params=deq_params,
                                  batch_stats=state.batch_stats)
    out_deq = deq_trainer.eval_step(deq_trainer.variables(deq_state), batch)
    np.testing.assert_allclose(np.asarray(out_deq["probs"]),
                               np.asarray(out_qat["probs"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out_deq["preds"]),
                                  np.asarray(out_qat["preds"]))
