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
