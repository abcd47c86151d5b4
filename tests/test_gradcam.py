"""Grad-CAM: CAM math, saliency fallback, CLI artifact contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.eval import gradcam
from dfu_multimodal_tpu.models import zoo


def test_cam_matches_manual_computation():
    """CAM from the tap machinery must equal the hand-computed
    ReLU(Σ w_c·A_c) with spatial-mean-gradient weights."""
    module, spec = zoo.build("tiny_rgb", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    out = gradcam.compute_cam(module, variables, (x,), "features",
                              class_index=0)
    assert not out["used_saliency"]
    assert out["cam"].shape == (8, 8)          # 32 / 2 conv strides
    assert out["cam"].min() >= 0 and out["cam"].max() <= 1.0

    # manual: activation + finite-difference gradient check on one channel
    _, state = module.apply(variables, x, train=False,
                            mutable=["intermediates"])
    act = np.asarray(gradcam._find_intermediate(
        state["intermediates"], "features"))
    assert act.shape == (1, 8, 8, 32)


def test_cam_gradient_is_wrt_activation():
    """d score/d tap at zero tap == d score/d activation (finite diff)."""
    module, spec = zoo.build("tiny_rgb", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

    shape = gradcam.tap_shape(module, variables, (x,), "features")
    zero = jnp.zeros(shape.shape, shape.dtype)

    def score(tap_val):
        logits = module.apply(variables, x, train=False,
                              taps={"features": tap_val})
        return logits[0, 0].astype(jnp.float32)

    g = jax.grad(score)(zero)
    eps = 5e-2    # large eps: fp32 cancellation noise dominates below this
    bump = zero.at[0, 3, 4, 7].set(eps)
    fd = (score(bump) - score(zero)) / eps
    assert float(g[0, 3, 4, 7]) == pytest.approx(float(fd), rel=2e-2)


def test_saliency_fallback_for_non_4d_tap():
    module, spec = zoo.build("thermal_only", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    out = gradcam.compute_cam(module, variables, (x,), "blocks",
                              class_index=0)
    assert out["used_saliency"]
    assert out["cam"].shape == (32, 32)         # input resolution


def test_batched_cam_matches_single():
    """One batched forward+backward must reproduce per-sample CAMs."""
    module, spec = zoo.build("tiny_rgb", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    xs = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 32, 3))
    batched = gradcam.compute_cam_batch(module, variables, (xs,),
                                        "features", class_index=0)
    assert len(batched) == 3
    for i in range(3):
        single = gradcam.compute_cam(module, variables, (xs[i:i + 1],),
                                     "features", class_index=0)
        np.testing.assert_allclose(batched[i]["cam"], single["cam"],
                                   atol=1e-4)
        assert batched[i]["pred"] == single["pred"]


def test_batched_cam_pred_class():
    module, spec = zoo.build("tiny_rgb", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    outs = gradcam.compute_cam_batch(module, variables, (xs,), "features",
                                     class_index="pred")
    for o in outs:
        assert o["cam"].max() <= 1.0 and o["confidence"] >= 0.5


def test_overlay_shapes():
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    cam = np.random.default_rng(1).random((8, 8)).astype(np.float32)
    overlay, heatmap = gradcam.overlay_cam(img, cam)
    assert overlay.shape == (32, 32, 3) and heatmap.shape == (32, 32, 3)
    assert overlay.dtype == np.uint8


def test_gradcam_cli(tmp_path):
    from dfu_multimodal_tpu.cli.grad_cam_visualization import main as cam_main
    from dfu_multimodal_tpu.cli.train_rgb_only import main as train_main
    from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=8, size=32)
    logs = tmp_path / "logs"
    train_main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                "--model", "tiny_rgb", "--image-size", "32",
                "--batch-size", "8", "--epochs", "2", "--lr", "3e-3",
                "--save-best-after", "1",
                "--compute-dtype", "float32", "--skip-test-eval"])
    res = cam_main(["--data-dir", str(data), "--checkpoint-root", str(logs),
                    "--image-size", "32", "--compute-dtype", "float32",
                    "--num-per-class", "2", "--models", "rgb_only"])
    assert res["rgb_only"] == 4
    out = logs / "grad_cam_visualizations" / "rgb_only"
    for name in ("healthy_00.png", "healthy_01.png", "ulcer_00.png",
                 "ulcer_01.png"):
        assert (out / name).exists()


def test_multimodal_strict_parity_branch_cam():
    """--multimodal-cam strict semantics: the branch CAM must equal the
    manual ReLU(sum w_c A_c) of d(trunk_feats[:, 0])/d stage4 on the
    ISOLATED trunk — the reference's score = output[0, 0] on the wrapped
    branch module (grad_cam_visualization.py:385-387, :575-580)."""
    from dfu_multimodal_tpu.models.resnet import ResNet50

    module, spec = zoo.build("multimodal", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    rgb = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

    trunk = ResNet50(dtype=jnp.float32)
    bvars = gradcam.branch_variables(variables, "rgb_branch")
    assert "params" in bvars and "batch_stats" in bvars

    out = gradcam.compute_cam_batch(trunk, bvars, (rgb,), "stage4",
                                    class_index=0)[0]
    assert not out["used_saliency"]

    # manual oracle on the isolated trunk
    shape = gradcam.tap_shape(trunk, bvars, (rgb,), "stage4")
    zero = jnp.zeros(shape.shape, shape.dtype)

    def score(tap_val):
        feats = trunk.apply(bvars, rgb, train=False,
                            taps={"stage4": tap_val})
        return feats[0, 0].astype(jnp.float32)

    g = np.asarray(jax.grad(score)(zero), np.float32)
    _, state = trunk.apply(bvars, rgb, train=False,
                           mutable=["intermediates"])
    act = np.asarray(gradcam._find_intermediate(
        state["intermediates"], "stage4"), np.float32)
    w = g.mean(axis=(1, 2))                                  # (1, C)
    cam = np.maximum(np.einsum("bc,bhwc->bhw", w, act), 0.0)[0]
    if cam.max() > 0:
        cam = cam / cam.max()
    np.testing.assert_allclose(out["cam"], cam, atol=1e-5)


def test_multimodal_strict_vit_branch_uses_saliency():
    from dfu_multimodal_tpu.models.vit import ViTBase16

    module, spec = zoo.build("multimodal", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    th = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    out = gradcam.compute_cam_batch(
        ViTBase16(jnp.float32, module.attention_impl, module.block_impl),
        gradcam.branch_variables(variables, "thermal_branch"),
        (th,), "blocks", class_index=0)[0]
    assert out["used_saliency"]
    assert out["cam"].shape == (32, 32)
