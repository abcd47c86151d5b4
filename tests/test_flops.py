"""Analytic FLOP / device-peak accounting (utils/flops.py) — the MFU
numerator and denominator the bench artifact reports."""

import pytest

from dfu_multimodal_tpu.utils import flops


def test_vit_b16_matches_published_count():
    """ViT-B/16 at 224 (197 tokens) is ~17.6 GMACs = ~35.1 GFLOPs at the
    2x convention."""
    f = flops.vit_flops(224)
    assert f == pytest.approx(35.1e9, rel=0.01)


def test_resnet_counts_and_spatial_scaling():
    assert flops.resnet50_flops(224) == pytest.approx(8.18e9, rel=0.01)
    assert flops.resnet18_flops(224) == pytest.approx(3.64e9, rel=0.01)
    # convs scale with spatial area
    assert (flops.resnet50_flops(112)
            == pytest.approx(flops.resnet50_flops(224) / 4))


def test_token_merge_reduces_vit_flops():
    full = flops.vit_flops(224)
    merged = flops.vit_flops(224, token_merge=(2, 128))
    assert merged < full
    # exactly: 2 full blocks + 10 blocks at 128 tokens + embed
    grid2 = (224 // 16) ** 2
    want = (2.0 * grid2 * 768 * (16 * 16 * 3)
            + 2 * flops.vit_block_flops(197)
            + 10 * flops.vit_block_flops(128))
    assert merged == pytest.approx(want)


def test_model_forward_flops_composition():
    mm = flops.model_forward_flops("multimodal")
    rgb = flops.model_forward_flops("rgb_only")
    th = flops.model_forward_flops("thermal_only")
    # fusion = both trunks + MLP; heads/MLP are <1% of the total
    assert mm == pytest.approx(rgb + th, rel=0.01)
    assert mm == pytest.approx(43.3e9, rel=0.02)
    assert flops.model_forward_flops("no_such_model") is None
    # train = 3x forward
    assert flops.train_step_flops("rgb_only") == pytest.approx(3 * rgb)
    assert flops.train_step_flops("no_such_model") is None


def test_device_peak_lookup_and_unknown():
    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    assert flops.device_peak_tflops(FakeDev("TPU v5 lite")) == 196.6
    assert flops.device_peak_tflops(FakeDev("TPU v4")) == 275.0
    assert flops.device_peak_tflops(FakeDev("TPU v6e")) == 918.0
    # vendor-suffixed kinds still resolve
    assert flops.device_peak_tflops(FakeDev("TPU v5 lite chip")) == 196.6
    # unknown chips -> None (MFU reports null, never a wrong number)
    assert flops.device_peak_tflops(FakeDev("TPU v9")) is None
    assert flops.device_peak_tflops(FakeDev("cpu")) is None


def test_mfu_pct_null_propagation():
    assert flops.mfu_pct(1000.0, 43.3e9, 196.6) == pytest.approx(
        100 * 1000 * 43.3e9 / 196.6e12, abs=0.05)
    assert flops.mfu_pct(1000.0, None, 196.6) is None
    assert flops.mfu_pct(1000.0, 43.3e9, None) is None
    assert flops.mfu_pct(0.0, 43.3e9, 196.6) is None


def test_device_peak_refuses_unknown_subvariants():
    """'TPU v4 lite' (v4i, ~138 TF/s) must NOT match the 275 TF/s v4
    entry — unknown sub-variants report null, never a wrong peak."""
    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    assert flops.device_peak_tflops(FakeDev("TPU v4 lite")) is None
    assert flops.device_peak_tflops(FakeDev("TPU v4i")) is None
    # known-kind suffixes still resolve via the longest-key match
    assert flops.device_peak_tflops(FakeDev("TPU v5 lite chip")) == 196.6


def test_device_peak_int8_lookup():
    """int8 peaks: published 2x-bf16 generations resolve, v4 (no
    published int8 rate) and unknown sub-variants report null."""
    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    assert flops.device_peak_int8_tops(FakeDev("TPU v5 lite")) == 393.2
    assert flops.device_peak_int8_tops(FakeDev("TPU v5e")) == 393.2
    assert flops.device_peak_int8_tops(FakeDev("TPU v6e")) == 1836.0
    assert flops.device_peak_int8_tops(FakeDev("TPU v4")) is None
    assert flops.device_peak_int8_tops(FakeDev("TPU v7x")) is None
    assert flops.device_peak_int8_tops(FakeDev("TPU v5 lite chip")) == 393.2
