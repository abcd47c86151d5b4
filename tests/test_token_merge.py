"""Bipartite token merging (ops/token_merge.py): shape/size accounting,
exactness on constructed matches, CLS protection, composability."""

import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu.ops.token_merge import bipartite_merge


def _tokens(b=2, n=9, c=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    sizes = jnp.ones((b, n), jnp.float32)
    return x, sizes


def test_r_zero_is_identity():
    x, s = _tokens()
    x2, s2 = bipartite_merge(x, s, 0)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s))


def test_output_shape_and_total_size():
    x, s = _tokens(b=3, n=17, c=16)
    for r in (1, 3, 7):
        x2, s2 = bipartite_merge(x, s, r)
        assert x2.shape == (3, 17 - r, 16)
        # total represented-token mass is conserved
        np.testing.assert_allclose(np.asarray(s2).sum(axis=1), 17,
                                   rtol=1e-6)


def test_cls_never_merged():
    x, s = _tokens(b=2, n=9, c=8)
    x2, s2 = bipartite_merge(x, s, 3)
    np.testing.assert_array_equal(np.asarray(x2[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_array_equal(np.asarray(s2[:, 0]), 1.0)


def test_rejects_r_above_mergeable():
    x, s = _tokens(b=1, n=9, c=8)      # 8 patch tokens -> nA = 4
    with pytest.raises(ValueError, match="exceeds"):
        bipartite_merge(x, s, 5)


def test_merges_the_constructed_duplicate_pair():
    """Patch tokens [a0, b0, a1, b1] with a0 == b0 and a1 far from both:
    r=1 must merge a0 into b0 (their mean == the original vector), keep
    a1 untouched, and set the merged size to 2."""
    c = 8
    cls = np.zeros((1, 1, c), np.float32)
    v = np.full((c,), 2.0, np.float32)
    a1 = np.zeros((c,), np.float32)
    a1[0] = -5.0
    b1 = np.zeros((c,), np.float32)
    b1[1] = 7.0
    patches = np.stack([v, v, a1, b1])[None]          # A = {v, a1}, B = {v, b1}
    x = jnp.asarray(np.concatenate([cls, patches], axis=1))
    s = jnp.ones((1, 5), jnp.float32)

    x2, s2 = bipartite_merge(x, s, 1)
    assert x2.shape == (1, 4, c)
    out = np.asarray(x2)[0]
    sz = np.asarray(s2)[0]
    # exactly one token of size 2 whose value is the (identical) mean
    merged_rows = np.where(sz == 2.0)[0]
    assert len(merged_rows) == 1
    np.testing.assert_allclose(out[merged_rows[0]], v, rtol=1e-6)
    # the far-away tokens survive bit-exactly
    assert any(np.array_equal(row, a1) for row in out)
    assert any(np.array_equal(row, b1) for row in out)


def test_weighted_mean_uses_sizes():
    """A size-3 destination absorbing a size-1 source must weight 3:1."""
    c = 4
    va = np.asarray([4.0, 0, 0, 0], np.float32)
    vb = np.asarray([8.0, 0, 0, 0], np.float32)      # cos-sim 1 with va
    far = np.asarray([0, 0, 5.0, 0], np.float32)     # ⊥ both B tokens
    ortho = np.asarray([0, 0, 0, 3.0], np.float32)
    cls = np.zeros((1, 1, c), np.float32)
    patches = np.stack([va, vb, far, ortho])[None]   # A={va,far}, B={vb,ortho}
    x = jnp.asarray(np.concatenate([cls, patches], axis=1))
    s = jnp.asarray([[1.0, 1.0, 3.0, 1.0, 1.0]], jnp.float32)

    x2, s2 = bipartite_merge(x, s, 1)
    sz = np.asarray(s2)[0]
    out = np.asarray(x2)[0]
    row = np.where(sz == 4.0)[0]                     # 1 + 3
    assert len(row) == 1
    np.testing.assert_allclose(out[row[0]],
                               (1 * va + 3 * vb) / 4.0, rtol=1e-6)


def test_two_merges_compose():
    x, s = _tokens(b=2, n=33, c=8, seed=3)
    x1, s1 = bipartite_merge(x, s, 8)
    x2, s2 = bipartite_merge(x1, s1, 4)
    assert x2.shape == (2, 21, 8)
    np.testing.assert_allclose(np.asarray(s2).sum(axis=1), 33, rtol=1e-6)


def test_bf16_tokens_supported():
    x, s = _tokens(b=2, n=9, c=8)
    x2, s2 = bipartite_merge(x.astype(jnp.bfloat16), s, 2)
    assert x2.dtype == jnp.bfloat16
    assert x2.shape == (2, 7, 8)


# ----------------------------------------------------- ViT integration


import jax

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.models.vit import split_encoder_variables


@pytest.fixture(scope="module")
def vit_vars():
    m, spec = zoo.build("thermal_only", dtype=jnp.float32)
    v = zoo.init_model(m, spec, jax.random.PRNGKey(0), image_size=32)
    return m, spec, v


def test_split_encoder_variables_slices(vit_vars):
    _, _, v = vit_vars
    v2 = split_encoder_variables(v, 3)
    trunk2 = next(s for s in v2["params"].values()
                  if isinstance(s, dict) and "encoder" in s)
    trunk = next(s for s in v["params"].values()
                 if isinstance(s, dict) and "encoder" in s)
    w = trunk["encoder"]["mlp_fc1"]["kernel"]
    assert trunk2["encoder"]["mlp_fc1"]["kernel"].shape[0] == 3
    assert trunk2["encoder2"]["mlp_fc1"]["kernel"].shape[0] == 9
    np.testing.assert_array_equal(
        np.asarray(trunk2["encoder"]["mlp_fc1"]["kernel"]),
        np.asarray(w[:3]))
    np.testing.assert_array_equal(
        np.asarray(trunk2["encoder2"]["mlp_fc1"]["kernel"]),
        np.asarray(w[3:]))
    # non-encoder scopes (head etc.) ride through untouched
    assert set(v2["params"]) == set(v["params"])
    with pytest.raises(ValueError, match="outside"):
        split_encoder_variables(v, 12)


def test_vit_token_merge_r0_is_bit_exact(vit_vars):
    """Two scans around an r=0 merge must reproduce the single-scan
    forward EXACTLY — the strongest possible correctness check of the
    split path (same math, same params, same order)."""
    m, _, v = vit_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3),
                          jnp.float32)
    base = m.apply(v, x, train=False)
    m2, _ = zoo.build("thermal_only", dtype=jnp.float32,
                      token_merge=(2, 5))       # 32px -> 5 tokens, r=0
    out = m2.apply(split_encoder_variables(v, 2), x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_vit_token_merge_reduced_forward_finite(vit_vars):
    m, _, v = vit_vars
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3),
                          jnp.float32)
    m2, _ = zoo.build("thermal_only", dtype=jnp.float32,
                      token_merge=(2, 3))       # merge 2 of 4 patch tokens
    out = m2.apply(split_encoder_variables(v, 2), x, train=False)
    assert out.shape == (2, 2)
    assert bool(jnp.isfinite(out).all())


def test_tome_for_serving_end_to_end(vit_vars):
    """The quantize_for_serving-style rebuild: restored state -> split
    params -> token_merge trainer -> eval epoch."""
    from dfu_multimodal_tpu.data.loader import ArrayDataset
    from dfu_multimodal_tpu.serve.engine import tome_for_serving
    from dfu_multimodal_tpu.train.engine import Trainer

    cfg = config.TrainConfig(batch_size=4, eval_batch_size=4,
                             compute_dtype="float32")
    mods = {"rgb": config.rgb_modality(),
            "thermal": config.thermal_modality()}
    trainer = Trainer("thermal_only", cfg, mods)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)

    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        arrays={"thermal": rng.integers(0, 255, (8, 32, 32, 3),
                                        dtype=np.uint8)},
        labels=np.asarray([0, 1] * 4))
    _, base = trainer.run_eval_epoch(state, ds)

    ttrainer, tstate = tome_for_serving(trainer, state, 2, 3,
                                        image_size=32)
    _, out = ttrainer.run_eval_epoch(tstate, ds)
    assert out["y_probs"].shape == (8,)
    assert np.isfinite(out["y_probs"]).all()

    # r=0 through the serving rebuild reproduces the plain probs exactly
    ttrainer0, tstate0 = tome_for_serving(trainer, state, 2, 5,
                                          image_size=32)
    _, out0 = ttrainer0.run_eval_epoch(tstate0, ds)
    np.testing.assert_array_equal(out0["y_probs"], base["y_probs"])


def test_trainer_rejects_token_merge_for_non_vit():
    from dfu_multimodal_tpu.train.engine import Trainer

    cfg = config.TrainConfig(compute_dtype="float32")
    with pytest.raises(ValueError, match="ViT-trunk"):
        Trainer("rgb_only", cfg, {"rgb": config.rgb_modality()},
                token_merge=(2, 3))


# ------------------------------------------- proportional attention (ToMe)


def test_biased_attn_block_matches_oracle():
    """The fused attn block's optional per-key score bias (ToMe
    proportional attention) must match the jnp oracle; without a bias the
    kernel is unchanged."""
    from dfu_multimodal_tpu.ops.vit_block import _attn_block_ref, attn_block

    rng = np.random.default_rng(0)
    B, N, C, H = 4, 9, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    wqkv = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32))
    wproj = jnp.asarray((rng.normal(size=(C, C)) * 0.1).astype(np.float32))
    bproj = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(np.log(rng.integers(1, 5, (B, N))).astype(np.float32))

    ref = _attn_block_ref(x, g1, b1, wqkv, bqkv, wproj, bproj,
                          num_heads=H, bias=bias)
    out = attn_block(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads=H,
                     interpret=True, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the bias genuinely moves the output
    out0 = attn_block(x, g1, b1, wqkv, bqkv, wproj, bproj, num_heads=H,
                      interpret=True)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-3


def test_biased_q8_attn_blocks_follow_the_bias():
    """int8 dynamic + static attn blocks accept the same bias operand;
    quantization noise aside, they must track the fp32 biased oracle."""
    from dfu_multimodal_tpu.ops.vit_block import _attn_block_ref
    from dfu_multimodal_tpu.ops.vit_block_q8 import (attn_block_q8,
                                                     attn_block_q8s,
                                                     quantize_weight)

    rng = np.random.default_rng(1)
    B, N, C, H = 2, 9, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    g1 = jnp.asarray(np.ones(C, np.float32))
    b1 = jnp.asarray(np.zeros(C, np.float32))
    wqkv = jnp.asarray((rng.normal(size=(C, 3 * C)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray((rng.normal(size=(3 * C,)) * 0.1).astype(np.float32))
    wproj = jnp.asarray((rng.normal(size=(C, C)) * 0.1).astype(np.float32))
    bproj = jnp.asarray((rng.normal(size=(C,)) * 0.1).astype(np.float32))
    bias = jnp.asarray(np.log(rng.integers(1, 5, (B, N))).astype(np.float32))

    ref = _attn_block_ref(x, g1, b1, wqkv, bqkv, wproj, bproj,
                          num_heads=H, bias=bias)
    kq, s = quantize_weight(wqkv)
    pq, ps = quantize_weight(wproj)
    out = attn_block_q8(x, g1, b1, kq, s, bqkv, pq, ps, bproj,
                        num_heads=H, interpret=True, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.1)     # int8 tolerance
    abs_ln = float(jnp.max(jnp.abs(x)))  # crude static act scale
    inv = jnp.full((2,), 127.0 / (3 * abs_ln), jnp.float32)
    outs = attn_block_q8s(x, g1, b1, kq, s, bqkv, pq, ps,
                          bproj, inv, num_heads=H, interpret=True,
                          bias=bias)
    assert np.isfinite(np.asarray(outs)).all()


def test_vit_prop_attn_invariances(vit_vars):
    """r=0 merge => all sizes 1 => log-size bias is exactly zero, so
    proportional attention must be BIT-EXACT to the unbiased path; with a
    real merge it must change the output, and the flax and fused-interpret
    impls must agree on the biased forward."""
    m, _, v = vit_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3),
                          jnp.float32)
    sv = split_encoder_variables(v, 2)

    m_r0, _ = zoo.build("thermal_only", dtype=jnp.float32,
                        token_merge=(2, 5))            # r = 0
    m_r0p, _ = zoo.build("thermal_only", dtype=jnp.float32,
                         token_merge=(2, 5), tome_prop_attn=True)
    np.testing.assert_array_equal(
        np.asarray(m_r0.apply(sv, x, train=False)),
        np.asarray(m_r0p.apply(sv, x, train=False)))

    m_p, _ = zoo.build("thermal_only", dtype=jnp.float32,
                       token_merge=(2, 3), tome_prop_attn=True)
    m_np, _ = zoo.build("thermal_only", dtype=jnp.float32,
                        token_merge=(2, 3))
    o_p = m_p.apply(sv, x, train=False)
    o_np = m_np.apply(sv, x, train=False)
    assert float(jnp.max(jnp.abs(o_p - o_np))) > 1e-4

    m_pf, _ = zoo.build("thermal_only", dtype=jnp.float32,
                        block_impl="fused_interpret",
                        token_merge=(2, 3), tome_prop_attn=True)
    np.testing.assert_allclose(np.asarray(m_pf.apply(sv, x, train=False)),
                               np.asarray(o_p), rtol=2e-3, atol=2e-3)


def test_tome_for_serving_prop_attn(vit_vars):
    """The serving rebuild threads prop_attn through to the model."""
    from dfu_multimodal_tpu.serve.engine import tome_for_serving
    from dfu_multimodal_tpu.train.engine import Trainer

    cfg = config.TrainConfig(batch_size=4, eval_batch_size=4,
                             compute_dtype="float32")
    mods = {"thermal": config.thermal_modality()}
    trainer = Trainer("thermal_only", cfg, mods)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    t1, s1 = tome_for_serving(trainer, state, 2, 3, image_size=32,
                              prop_attn=True)
    assert t1.module.tome_prop_attn is True
    t0, s0 = tome_for_serving(trainer, state, 2, 3, image_size=32)
    assert t0.module.tome_prop_attn is False
