"""Probability calibration: ECE/MCE/Brier, reliability bins, temperature
scaling (eval/calibration.py — beyond-reference opt-in surface)."""

import numpy as np
import pytest

from dfu_multimodal_tpu.eval import calibration as C


def test_brier_matches_sklearn():
    from sklearn.metrics import brier_score_loss
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = rng.uniform(0, 1, 200)
    assert C.brier_score(y, p) == pytest.approx(
        brier_score_loss(y, p), rel=1e-12)


def test_ece_hand_example():
    # two populated bins (of 10): [0.0,0.1) conf ~0.05 freq 0.0 -> gap .05
    #                             [0.9,1.0] conf ~0.95 freq 0.5 -> gap .45
    y = np.array([0, 0, 1, 0])
    p = np.array([0.05, 0.05, 0.95, 0.95])
    errs = C.calibration_errors(y, p, n_bins=10)
    assert errs["ece"] == pytest.approx(0.5 * 0.05 + 0.5 * 0.45)
    assert errs["mce"] == pytest.approx(0.45)


def test_reliability_curve_bins_and_edges():
    y = np.array([0, 1, 1, 1])
    p = np.array([0.0, 0.5, 0.999, 1.0])     # 1.0 must land in the last bin
    mean_p, frac, counts = C.reliability_curve(y, p, n_bins=4)
    assert counts.tolist() == [1, 0, 1, 2]
    assert mean_p[3] == pytest.approx((0.999 + 1.0) / 2)
    assert frac[3] == pytest.approx(1.0)
    assert np.isnan(mean_p[1])
    assert counts.sum() == len(y)


def test_perfectly_calibrated_has_small_ece():
    rng = np.random.default_rng(1)
    p = rng.uniform(0.02, 0.98, 20000)
    y = (rng.uniform(size=p.size) < p).astype(int)
    assert C.calibration_errors(y, p, n_bins=10)["ece"] < 0.02


def test_apply_temperature_identity_and_monotonic():
    p = np.linspace(0.01, 0.99, 50)
    np.testing.assert_allclose(C.apply_temperature(p, 1.0), p, atol=1e-9)
    soft = C.apply_temperature(p, 2.0)
    assert np.all(np.diff(soft) > 0)              # order preserved
    assert np.all(np.abs(soft - 0.5) <= np.abs(p - 0.5) + 1e-12)  # softer
    with pytest.raises(ValueError):
        C.apply_temperature(p, 0.0)


def test_fit_temperature_recovers_known_miscalibration():
    """Labels drawn from sigmoid(z); reported probs sigmoid(2z) are
    overconfident by exactly T=2 — the fit must find it."""
    rng = np.random.default_rng(2)
    z = rng.normal(0, 2, 40000)
    y = (rng.uniform(size=z.size) < 1 / (1 + np.exp(-z))).astype(int)
    p_over = 1 / (1 + np.exp(-2 * z))
    t, info = C.fit_temperature(y, p_over)
    assert t == pytest.approx(2.0, rel=0.05)
    assert info["selection_nll_after"] < info["selection_nll_before"]
    assert info["selection_ece_after"] < info["selection_ece_before"]


def test_fit_temperature_requires_both_classes():
    with pytest.raises(ValueError, match="both classes"):
        C.fit_temperature(np.ones(10), np.linspace(0.1, 0.9, 10))


def test_temperature_preserves_rankings():
    rng = np.random.default_rng(3)
    p = rng.uniform(0.01, 0.99, 100)
    scaled = C.apply_temperature(p, 3.7)
    assert np.array_equal(np.argsort(p), np.argsort(scaled))


def test_reliability_diagram_png(tmp_path):
    from dfu_multimodal_tpu.eval import plots
    rng = np.random.default_rng(4)
    y = rng.integers(0, 2, 100)
    p = rng.uniform(0, 1, 100)
    out = plots.plot_reliability_diagram(y, p, "TestModel", tmp_path,
                                         n_bins=10, temperature=1.5)
    assert out.name == "reliability_diagram_TestModel.png"
    assert out.stat().st_size > 0
