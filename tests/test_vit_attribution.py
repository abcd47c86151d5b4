"""Transformer attribution (eval/vit_attribution.py): functional-trunk
parity with the flax ViT, a hand-computed rollout oracle, the eps-trick
gradient identity, Chefer class specificity, and the batch contract."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu.eval import vit_attribution as va
from dfu_multimodal_tpu.models.vit import ViT

# tiny ViT: 16x16 input, patch 8 -> 2x2 grid + CLS = 5 tokens
KW = dict(patch_size=8, hidden_dim=32, depth=2, num_heads=2,
          dtype=jnp.float32, attention_impl="xla", block_impl="flax")
SIZE = 16


class SmallViTClassifier(nn.Module):
    """ViT trunk + linear head, the ViTClassifier shape at toy scale."""

    @nn.compact
    def __call__(self, x, train=False, taps=None):
        feats = ViT(**KW, scan_blocks=True)(x, train=train, taps=taps)
        return nn.Dense(2, name="head")(feats)


def _trunk_and_input(seed=0, batch=3, scan=True):
    vit = ViT(**KW, scan_blocks=scan)
    x = jax.random.normal(jax.random.PRNGKey(seed), (batch, SIZE, SIZE, 3))
    variables = vit.init(jax.random.PRNGKey(1), x)
    return vit, variables, x


def test_functional_trunk_matches_flax_tap():
    """The attribution module's explicit lax.scan forward must reproduce
    the flax trunk's ``blocks`` tap activation exactly (it claims to BE
    that model up to the tap)."""
    vit, variables, x = _trunk_and_input()
    _, state = vit.apply(variables, x, train=False,
                         mutable=["intermediates"])
    from dfu_multimodal_tpu.eval.gradcam import _find_intermediate
    want = _find_intermediate(state["intermediates"], "blocks")

    trunk = va.stacked_trunk_params(variables["params"])
    depth, heads, t = KW["depth"], KW["num_heads"], 5
    eps = jnp.zeros((depth, x.shape[0], heads, t, t))
    tokens, attn = va._trunk_tokens(trunk, x, eps, heads)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(want),
                               atol=1e-4)
    assert attn.shape == (depth, x.shape[0], heads, t, t)
    # rows of attention probabilities sum to 1
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_unrolled_blockN_params_stack_equivalently():
    """scan_blocks=False (the debug escape hatch) produces blockN scopes;
    stacking them must give the same functional forward."""
    vit_s, vars_s, x = _trunk_and_input(seed=2, batch=2)
    vit_u = ViT(**KW, scan_blocks=False)
    # re-init unrolled and copy the scanned weights in per-block slices
    vars_u = vit_u.init(jax.random.PRNGKey(9), x)
    stacked = vars_s["params"]["encoder"]
    params_u = dict(vars_u["params"])
    for i in range(KW["depth"]):
        params_u[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    for k in ("patch_embed", "cls_token", "pos_embed", "norm"):
        params_u[k] = vars_s["params"][k]

    t1 = va._trunk_tokens(va.stacked_trunk_params(vars_s["params"]), x,
                          jnp.zeros((2, 2, 2, 5, 5)), 2)[0]
    t2 = va._trunk_tokens(va.stacked_trunk_params(params_u), x,
                          jnp.zeros((2, 2, 2, 5, 5)), 2)[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)


def test_rollout_matches_numpy_oracle():
    """attention_rollout == the hand-computed Abnar-Zuidema recursion on
    the same attention matrices."""
    _, variables, x = _trunk_and_input(seed=3, batch=2)
    trunk = va.stacked_trunk_params(variables["params"])
    heads, t = KW["num_heads"], 5
    eps = jnp.zeros((KW["depth"], 2, heads, t, t))
    _, attn = va._trunk_tokens(trunk, x, eps, heads)

    a = np.asarray(attn).mean(axis=2)               # (L, B, T, T)
    a = 0.5 * a + 0.5 * np.eye(t)
    a = a / a.sum(-1, keepdims=True)
    want = np.broadcast_to(np.eye(t), (2, t, t)).copy()
    for l in range(KW["depth"]):                    # R = A_L ... A_1
        want = np.einsum("bij,bjk->bik", a[l], want)
    want = want[:, 0, 1:].reshape(2, 2, 2)

    got = np.asarray(va.attention_rollout(trunk, x, heads))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_eps_trick_gradient_matches_finite_difference():
    """d score / d eps at zeros == the finite-difference derivative of
    perturbing one attention probability (the identity Chefer relies on)."""
    _, variables, x = _trunk_and_input(seed=4, batch=1)
    trunk = va.stacked_trunk_params(variables["params"])
    heads, t, depth = KW["num_heads"], 5, KW["depth"]
    tap_grad = jax.random.normal(jax.random.PRNGKey(5),
                                 (1, t, KW["hidden_dim"]))

    def score(eps):
        tokens, _ = va._trunk_tokens(trunk, x, eps, heads)
        return jnp.sum(tokens * tap_grad)

    zeros = jnp.zeros((depth, 1, heads, t, t))
    g = jax.grad(score)(zeros)
    for idx in [(0, 0, 0, 0, 1), (1, 0, 1, 2, 3), (0, 0, 1, 4, 0)]:
        h = 1e-3
        e = zeros.at[idx].set(h)
        fd = (score(e) - score(-e)) / (2 * h)
        assert float(g[idx]) == pytest.approx(float(fd), rel=5e-2,
                                              abs=1e-4)


def _small_model(seed=0, batch=2):
    model = SmallViTClassifier()
    x = jax.random.normal(jax.random.PRNGKey(seed),
                          (batch, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x


def test_compute_vit_cam_batch_contract_and_probs():
    model, variables, x = _small_model()
    logits = model.apply(variables, x)
    want_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    for method in ("rollout", "chefer"):
        out = va.compute_vit_cam_batch(model, variables, (x,), "ViT_0",
                                       method, class_index="pred")
        assert len(out) == x.shape[0]
        for i, o in enumerate(out):
            assert o["cam"].shape == (2, 2)
            assert o["cam"].min() >= 0.0 and o["cam"].max() <= 1.0
            assert o["method"] == method
            assert o["used_saliency"] is False
            np.testing.assert_allclose(o["probs"], want_probs[i],
                                       atol=1e-5)
    with pytest.raises(ValueError, match="unknown ViT attribution"):
        va.compute_vit_cam_batch(model, variables, (x,), "ViT_0", "nope")


def test_chefer_is_class_specific_rollout_is_not():
    model, variables, x = _small_model(seed=6)
    c0 = va.compute_vit_cam_batch(model, variables, (x,), "ViT_0",
                                  "chefer", class_index=0)
    c1 = va.compute_vit_cam_batch(model, variables, (x,), "ViT_0",
                                  "chefer", class_index=1)
    # class-specific: the two relevance maps differ somewhere
    assert any(not np.allclose(a["cam"], b["cam"], atol=1e-6)
               for a, b in zip(c0, c1))
    r0 = va.compute_vit_cam_batch(model, variables, (x,), "ViT_0",
                                  "rollout", class_index=0)
    r1 = va.compute_vit_cam_batch(model, variables, (x,), "ViT_0",
                                  "rollout", class_index=1)
    for a, b in zip(r0, r1):      # rollout is class-agnostic by design
        np.testing.assert_allclose(a["cam"], b["cam"], atol=1e-6)


def test_zoo_models_rollout_and_chefer():
    """Full zoo models at toy resolution: thermal_only (trunk ViT_0) and
    multimodal (trunk thermal_branch) produce valid patch-grid CAMs via
    both methods, with probs equal to the plain forward."""
    from dfu_multimodal_tpu.models import zoo

    for name, n_inputs in (("thermal_only", 1), ("multimodal", 2)):
        module, spec = zoo.build(name, dtype=jnp.float32,
                                 attention_impl="xla")
        variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                                   image_size=32)
        xs = tuple(jax.random.normal(jax.random.PRNGKey(7 + i),
                                     (2, 32, 32, 3))
                   for i in range(n_inputs))
        logits = module.apply(variables, *xs, train=False)
        want_probs = np.asarray(jax.nn.softmax(
            jnp.asarray(logits, jnp.float32), axis=-1))
        scope = va.VIT_TRUNK_SCOPES[name]
        vit_index = n_inputs - 1           # thermal is the last input
        for method in ("rollout", "chefer"):
            out = va.compute_vit_cam_batch(
                module, variables, xs, scope, method,
                class_index="pred", input_index=vit_index)
            for i, o in enumerate(out):
                assert o["cam"].shape == (2, 2)   # 32/16 patch grid
                assert 0.0 <= o["cam"].min() and o["cam"].max() <= 1.0
                np.testing.assert_allclose(o["probs"], want_probs[i],
                                           atol=2e-4)


def test_stacked_trunk_rejects_tome_split():
    """A token-merge split trunk (encoder/encoder2) must raise instead
    of silently attributing over a truncated encoder."""
    _, variables, _ = _trunk_and_input(seed=8, batch=1)
    trunk = dict(va.stacked_trunk_params(variables["params"]))
    enc = trunk["encoder"]
    trunk["encoder"] = jax.tree.map(lambda a: a[:1], enc)
    trunk["encoder2"] = jax.tree.map(lambda a: a[1:], enc)
    with pytest.raises(ValueError, match="token-merge split"):
        va.stacked_trunk_params(trunk)


def test_supports_transformer_attribution_predicate():
    assert va.supports_transformer_attribution("thermal_only")
    assert va.supports_transformer_attribution("multimodal")
    assert not va.supports_transformer_attribution("rgb_only")
    assert not va.supports_transformer_attribution("tiny_rgb")
