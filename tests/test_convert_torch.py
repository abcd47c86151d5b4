"""torch->JAX converter: full-model numeric parity.

torchvision/timm are not installed, so we synthesize state_dicts with their
canonical key names and implement the torch forward passes functionally
(torch.nn.functional only). The converted Flax models must match those
reference forwards to float tolerance — this validates every transpose,
BN-stat mapping, qkv packing and the patch-embed flattening order.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.tools import convert_torch as cv

torch.manual_seed(0)

# --------------------------------------------------------------- resnet50

RESNET_STAGES = [(64, 3), (128, 4), (256, 6), (512, 3)]


def make_resnet50_state_dict(num_classes=2, prefix=""):
    sd = {}

    def conv(key, out_c, in_c, k):
        sd[key] = torch.randn(out_c, in_c, k, k) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = torch.rand(c) + 0.5
        sd[f"{key}.bias"] = torch.randn(c) * 0.1
        sd[f"{key}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{key}.running_var"] = torch.rand(c) + 0.5

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for si, (width, blocks) in enumerate(RESNET_STAGES, start=1):
        for bi in range(blocks):
            base = f"layer{si}.{bi}"
            conv(f"{base}.conv1.weight", width, in_c, 1)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2.weight", width, width, 3)
            bn(f"{base}.bn2", width)
            conv(f"{base}.conv3.weight", width * 4, width, 1)
            bn(f"{base}.bn3", width * 4)
            if bi == 0:
                conv(f"{base}.downsample.0.weight", width * 4, in_c, 1)
                bn(f"{base}.downsample.1", width * 4)
            in_c = width * 4
    sd["fc.1.weight"] = torch.randn(num_classes, 2048) * 0.02
    sd["fc.1.bias"] = torch.randn(num_classes) * 0.01
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def torch_resnet50_forward(sd, x):
    """Functional torchvision-v1.5-style resnet50 eval forward."""
    def bnf(x, base):
        return F.batch_norm(x, sd[f"{base}.running_mean"],
                            sd[f"{base}.running_var"],
                            sd[f"{base}.weight"], sd[f"{base}.bias"],
                            training=False, eps=1e-5)

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bnf(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for si, (width, blocks) in enumerate(RESNET_STAGES, start=1):
        for bi in range(blocks):
            base = f"layer{si}.{bi}"
            stride = 2 if si > 1 and bi == 0 else 1
            residual = x
            y = F.relu(bnf(F.conv2d(x, sd[f"{base}.conv1.weight"]),
                           f"{base}.bn1"))
            y = F.relu(bnf(F.conv2d(y, sd[f"{base}.conv2.weight"],
                                    stride=stride, padding=1),
                           f"{base}.bn2"))
            y = bnf(F.conv2d(y, sd[f"{base}.conv3.weight"]), f"{base}.bn3")
            if f"{base}.downsample.0.weight" in sd:
                residual = bnf(
                    F.conv2d(x, sd[f"{base}.downsample.0.weight"],
                             stride=stride), f"{base}.downsample.1")
            x = F.relu(y + residual)
    x = x.mean(dim=(2, 3))
    return F.linear(x, sd["fc.1.weight"], sd["fc.1.bias"])


def test_resnet50_conversion_numeric_parity():
    sd = make_resnet50_state_dict()
    module, spec = zoo.build("rgb_only", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=64)
    merged, skipped = cv.convert_state_dict("rgb_only", sd, variables)
    assert skipped == 0

    x = torch.randn(2, 3, 64, 64)
    ref = torch_resnet50_forward(sd, x).numpy()
    ours = np.asarray(module.apply(
        merged, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_resnet50_backbone_prefix_quirk():
    """The reference's checkpoints carry a 'backbone.' prefix
    (fix_checkpoint_keys.py) — conversion must handle it transparently."""
    sd = make_resnet50_state_dict(prefix="backbone.")
    module, spec = zoo.build("rgb_only", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=64)
    merged, skipped = cv.convert_state_dict("rgb_only", sd, variables)
    assert skipped == 0
    x = torch.randn(1, 3, 64, 64)
    ref = torch_resnet50_forward(
        {cv.strip_prefix(k): v for k, v in sd.items()}, x).numpy()
    ours = np.asarray(module.apply(
        merged, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------- vit-b/16

def make_vit_state_dict(depth=2, hidden=96, heads=4, patch=8, img=32,
                        num_classes=2):
    n_tokens = (img // patch) ** 2 + 1
    sd = {
        "cls_token": torch.randn(1, 1, hidden) * 0.02,
        "pos_embed": torch.randn(1, n_tokens, hidden) * 0.02,
        "patch_embed.proj.weight": torch.randn(hidden, 3, patch, patch) * 0.05,
        "patch_embed.proj.bias": torch.randn(hidden) * 0.01,
        "norm.weight": torch.rand(hidden) + 0.5,
        "norm.bias": torch.randn(hidden) * 0.05,
        "head.1.weight": torch.randn(num_classes, hidden) * 0.05,
        "head.1.bias": torch.randn(num_classes) * 0.01,
    }
    for i in range(depth):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = torch.rand(hidden) + 0.5
        sd[f"{b}.norm1.bias"] = torch.randn(hidden) * 0.05
        sd[f"{b}.norm2.weight"] = torch.rand(hidden) + 0.5
        sd[f"{b}.norm2.bias"] = torch.randn(hidden) * 0.05
        sd[f"{b}.attn.qkv.weight"] = torch.randn(3 * hidden, hidden) * 0.05
        sd[f"{b}.attn.qkv.bias"] = torch.randn(3 * hidden) * 0.01
        sd[f"{b}.attn.proj.weight"] = torch.randn(hidden, hidden) * 0.05
        sd[f"{b}.attn.proj.bias"] = torch.randn(hidden) * 0.01
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(4 * hidden, hidden) * 0.05
        sd[f"{b}.mlp.fc1.bias"] = torch.randn(4 * hidden) * 0.01
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(hidden, 4 * hidden) * 0.05
        sd[f"{b}.mlp.fc2.bias"] = torch.randn(hidden) * 0.01
    return sd


def torch_vit_forward(sd, x, depth=2, hidden=96, heads=4, patch=8):
    b = x.shape[0]
    x = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=patch)
    x = x.flatten(2).transpose(1, 2)                       # (B, N, C)
    cls = sd["cls_token"].expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd["pos_embed"]
    head_dim = hidden // heads
    for i in range(depth):
        base = f"blocks.{i}"
        y = F.layer_norm(x, (hidden,), sd[f"{base}.norm1.weight"],
                         sd[f"{base}.norm1.bias"], eps=1e-6)
        qkv = F.linear(y, sd[f"{base}.attn.qkv.weight"],
                       sd[f"{base}.attn.qkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (head_dim ** -0.5)
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, hidden)
        x = x + F.linear(y, sd[f"{base}.attn.proj.weight"],
                         sd[f"{base}.attn.proj.bias"])
        y = F.layer_norm(x, (hidden,), sd[f"{base}.norm2.weight"],
                         sd[f"{base}.norm2.bias"], eps=1e-6)
        y = F.gelu(F.linear(y, sd[f"{base}.mlp.fc1.weight"],
                            sd[f"{base}.mlp.fc1.bias"]))
        x = x + F.linear(y, sd[f"{base}.mlp.fc2.weight"],
                         sd[f"{base}.mlp.fc2.bias"])
    x = F.layer_norm(x, (hidden,), sd["norm.weight"], sd["norm.bias"],
                     eps=1e-6)
    return F.linear(x[:, 0], sd["head.1.weight"], sd["head.1.bias"])


@pytest.mark.parametrize("scan_layout", [True, False])
def test_vit_conversion_numeric_parity(scan_layout):
    from dfu_multimodal_tpu.models.vit import ViT
    import flax.linen as nn
    import jax.numpy as jnp

    depth, hidden, heads, patch = 2, 96, 4, 8

    class SmallViTClassifier(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, taps=None):
            feats = ViT(patch_size=patch, hidden_dim=hidden, depth=depth,
                        num_heads=heads, dtype=jnp.float32,
                        attention_impl="xla",
                        scan_blocks=scan_layout)(x, train=train, taps=taps)
            return nn.Dense(2, name="head")(feats)

    module = SmallViTClassifier()
    x_t = torch.randn(2, 3, 32, 32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))

    sd = make_vit_state_dict(depth, hidden, heads, patch, img=32)
    merged, skipped = cv._merge_into(
        dict(variables),
        cv.convert_vit_b16(sd, ("ViT_0",), scan_layout=scan_layout))
    assert skipped == 0

    ref = torch_vit_forward(sd, x_t, depth, hidden, heads, patch).numpy()
    ours = np.asarray(module.apply(
        merged, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_convert_checkpoint_file_real_torch_save(tmp_path):
    """End-to-end on a GENUINE ``torch.save`` artifact (the reference's
    best_model.pt layout, train_rgb_only.py:310-316): real torch tensors,
    the ``backbone.*`` prefix quirk, a 1000-class ImageNet head to force
    the shape-skip path, and the epoch/val_f1/history metadata."""
    sd = make_resnet50_state_dict(num_classes=1000, prefix="backbone.")
    # torchvision's pretrained head is "fc.weight" (no Sequential index)
    sd["backbone.fc.weight"] = sd.pop("backbone.fc.1.weight")
    sd["backbone.fc.bias"] = sd.pop("backbone.fc.1.bias")
    ckpt = {"epoch": 7, "model_state_dict": sd, "val_f1": 0.913,
            "history": {"train_loss": [0.5, 0.4], "val_f1": [0.8, 0.913]}}
    path = tmp_path / "best_model.pt"
    torch.save(ckpt, path)

    module, spec = zoo.build("rgb_only", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=64)
    merged, skipped, meta = cv.convert_checkpoint_file("rgb_only", path,
                                                       variables)
    assert skipped == 2                      # 1000-class head w + b skipped
    assert meta == {"epoch": 7, "val_f1": 0.913,
                    "history": ckpt["history"]}
    # trunk converted bit-exactly (head left at init)
    np.testing.assert_array_equal(
        merged["params"]["ResNet_0"]["stem_conv"]["kernel"],
        sd["backbone.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    # and the full converted model still runs
    out = module.apply(merged, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_convert_save_restore_roundtrip_bit_exact(tmp_path):
    """convert -> save_checkpoint -> load_checkpoint must preserve every
    converted leaf bit-for-bit (VERDICT round-1 next #3c)."""
    from flax import traverse_util

    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

    sd = make_resnet50_state_dict()
    module, spec = zoo.build("rgb_only", dtype=jnp.float32)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=64)
    merged, skipped = cv.convert_state_dict("rgb_only", sd, variables)
    assert skipped == 0

    ckpt_mod.save_checkpoint(
        tmp_path, epoch=1,
        model_state={"params": merged["params"],
                     "batch_stats": merged["batch_stats"]},
        opt_state=None, val_f1=0.5, history={})
    payload, _ = ckpt_mod.load_checkpoint(tmp_path)
    flat_a = traverse_util.flatten_dict(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]})
    flat_b = traverse_util.flatten_dict(payload["model_state"])
    assert set(flat_a) == set(flat_b)
    for k, va in flat_a.items():
        a, b = np.asarray(va), np.asarray(flat_b[k])
        assert a.dtype == b.dtype, k
        np.testing.assert_array_equal(a, b, err_msg=str(k))


def test_train_cli_init_from_converted_checkpoint(tmp_path):
    """The QUALITY_PARITY.md fine-tune flow: torch.save -> convert_checkpoint
    CLI -> train CLI --init-from.  The trainer must start from the converted
    weights (not re-init) and complete an epoch."""
    import io
    from contextlib import redirect_stdout

    from dfu_multimodal_tpu.cli import convert_checkpoint as cc_cli
    from dfu_multimodal_tpu.cli import train_rgb_only
    from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset

    sd = make_resnet50_state_dict(num_classes=1000, prefix="backbone.")
    torch.save({"model_state_dict": sd}, tmp_path / "pretrained.pt")
    cc_cli.main(["--model", "rgb_only",
                 "--torch-checkpoint", str(tmp_path / "pretrained.pt"),
                 "--output", str(tmp_path / "init_rgb"),
                 "--image-size", "64"])

    make_synthetic_dataset(tmp_path / "data", images_per_class=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        train_rgb_only.main([
            "--data-dir", str(tmp_path / "data"),
            "--checkpoint-root", str(tmp_path / "logs"),
            "--epochs", "1", "--batch-size", "4", "--image-size", "64"]
            + ["--init-from", str(tmp_path / "init_rgb")])
    out = buf.getvalue()
    assert "Initialized model weights from" in out, out[-2000:]
    assert "TRAINING COMPLETE" in out


def test_full_vit_b16_coverage():
    """All trunk leaves of the real ViT-B/16 get filled (nothing skipped)."""
    sd = make_vit_state_dict(depth=12, hidden=768, heads=12, patch=16,
                             img=224)
    module, spec = zoo.build("thermal_only", dtype=jnp.float32)
    shapes = zoo.init_shapes(module, spec, image_size=224)
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    merged, skipped = cv.convert_state_dict("thermal_only", sd,
                                            dict(target))
    assert skipped == 0
    # cls_token actually changed
    from flax import traverse_util
    flat = traverse_util.flatten_dict(merged)
    assert np.abs(flat[("params", "ViT_0", "cls_token")]).sum() > 0
