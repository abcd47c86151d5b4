"""Model-family shape, parameter-count, and tap-point tests."""

import jax
import jax.numpy as jnp
import pytest

from dfu_multimodal_tpu.models import zoo

KEY = jax.random.PRNGKey(0)


# Parameter counts match the reference architectures at 224²:
# torchvision resnet50 w/ 2-class head; timm vit_base_patch16_224 trunk
# (85,798,656) + 2-class head; their sum plus the 2816->512->256->2 fusion
# MLP (the reference prints its count, train_multimodal_fusion.py:333-336);
# torchvision efficientnet_b0 trunk + head.
EXPECTED_PARAMS = {
    "rgb_only": 23_512_130,
    "thermal_only": 85_800_194,
    "multimodal": 110_880_834,
    "efficientnet_rgb": 4_010_110,
}


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS))
def test_param_counts_at_224(name):
    module, spec = zoo.build(name)
    shapes = zoo.init_shapes(module, spec, image_size=224)
    assert zoo.param_count(shapes) == EXPECTED_PARAMS[name]


def test_rgb_only_forward():
    module, spec = zoo.build("rgb_only")
    variables = zoo.init_model(module, spec, KEY, image_size=64)
    out = zoo.apply_model(module, spec, variables,
                          {"rgb": jnp.ones((2, 64, 64, 3))}, train=False)
    assert out.shape == (2, 2)


def test_multimodal_runs_and_dropout_rngs():
    module, spec = zoo.build("multimodal")
    variables = zoo.init_model(module, spec, KEY, image_size=32)
    assert spec.inputs == ("rgb", "thermal")
    batch = {k: jnp.ones((2, 32, 32, 3)) for k in spec.inputs}
    out = zoo.apply_model(module, spec, variables, batch, train=True,
                          rngs={"dropout": KEY},
                          mutable=["batch_stats"])
    logits, _ = out
    assert logits.shape == (2, 2)


def test_resnet_tap_point_records_stage4():
    module, spec = zoo.build("rgb_only")
    variables = zoo.init_model(module, spec, KEY, image_size=64)
    x = jnp.ones((1, 64, 64, 3))
    _, state = module.apply(variables, x, train=False,
                            mutable=["intermediates"])
    inter = state["intermediates"]["ResNet_0"]
    assert "stage4" in inter
    act = inter["stage4"][0]
    assert act.shape == (1, 2, 2, 2048)   # 64/32 spatial, 2048 channels


def test_tap_addition_changes_output():
    """The Grad-CAM tap must feed back additively into the forward pass."""
    module, spec = zoo.build("rgb_only")
    variables = zoo.init_model(module, spec, KEY, image_size=64)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    base = module.apply(variables, x, train=False)
    taps = {"stage4": jnp.ones((1, 2, 2, 2048))}
    perturbed = module.apply(variables, x, train=False, taps=taps)
    assert not jnp.allclose(base, perturbed)


def test_bfloat16_compute_fp32_params():
    module, spec = zoo.build("rgb_only", dtype=jnp.bfloat16)
    variables = zoo.init_model(module, spec, KEY, image_size=64)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = zoo.apply_model(module, spec, variables,
                          {"rgb": jnp.ones((2, 64, 64, 3))}, train=False)
    assert out.dtype == jnp.float32    # logits promoted back to fp32


def test_efficientnet_stochastic_depth_matches_torchvision_schedule():
    """MBConv residuals apply torchvision's StochasticDepth (row mode,
    prob ramping 0 -> 0.2 over blocks) during training; eval is
    unaffected and block 0 is never dropped."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfu_multimodal_tpu.models.efficientnet import (B0_STAGES,
                                                        EfficientNetB0)

    model = EfficientNetB0()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x,
                           train=False)

    # eval: deterministic, no rng needed
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # train: same dropout rng -> identical; different rng -> differs
    # (some residual branch dropped somewhere with overwhelming prob)
    def fwd(seed):
        out, _ = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(seed)},
            mutable=["batch_stats"])
        return np.asarray(out)

    t1, t1b, t2 = fwd(7), fwd(7), fwd(8)
    np.testing.assert_array_equal(t1, t1b)
    assert not np.array_equal(t1, t2)
    # schedule sanity: 16 blocks in B0, last block's rate = 0.2 * 15/16
    total = sum(r for _, _, r, _, _ in B0_STAGES)
    assert total == 16
