"""Bootstrap CIs over the medical metric suite (eval/bootstrap.py)."""

import numpy as np
import pytest

from dfu_multimodal_tpu.eval import bootstrap as B
from dfu_multimodal_tpu.eval import metrics as M


def _fake_eval(n=400, acc=0.85, seed=0):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, 2, n)
    flip = rng.uniform(size=n) > acc
    y_pred = np.where(flip, 1 - y_true, y_true)
    # probs roughly consistent with preds
    y_probs = np.clip(y_pred * 0.7 + 0.15 + rng.normal(0, 0.1, n), 0.01,
                      0.99)
    return y_true, y_pred, y_probs


def test_point_estimates_match_metrics_engine():
    y_true, y_pred, y_probs = _fake_eval()
    ref = M.compute_all_metrics(y_true, y_pred, y_probs)
    cis = B.bootstrap_cis(y_true, y_pred, y_probs, n_boot=10, seed=1)
    for k in ("accuracy", "f1", "sensitivity", "specificity", "ppv", "npv",
              "balanced_accuracy", "mcc", "auc_roc", "auc_pr"):
        assert cis[k]["estimate"] == pytest.approx(ref[k], rel=1e-12), k


def test_ci_brackets_estimate_and_is_deterministic():
    y_true, y_pred, y_probs = _fake_eval()
    a = B.bootstrap_cis(y_true, y_pred, y_probs, n_boot=300, seed=7)
    b = B.bootstrap_cis(y_true, y_pred, y_probs, n_boot=300, seed=7)
    assert a == b
    for k, v in a.items():
        if k == "_meta":
            continue
        assert v["lo"] <= v["estimate"] <= v["hi"], (k, v)
        assert v["n_valid"] == 300


def test_ci_width_matches_binomial_scale():
    """Accuracy CI half-width on n=400 at acc~0.85 should be near the
    normal-approx 1.96*sqrt(p(1-p)/n) ~ 0.035."""
    y_true, y_pred, _ = _fake_eval(n=400, acc=0.85)
    cis = B.bootstrap_cis(y_true, y_pred, n_boot=1000, seed=3)
    width = cis["accuracy"]["hi"] - cis["accuracy"]["lo"]
    assert 0.03 < width < 0.12


def test_degenerate_replicates_are_excluded_not_zeroed():
    """With 1 positive among 12 rows, many replicates draw no positives —
    sensitivity must come from the valid replicates only (all-or-nothing
    here: drawn positives are always predicted, so every valid replicate
    has sensitivity 1)."""
    y_true = np.array([1] + [0] * 11)
    y_pred = y_true.copy()
    cis = B.bootstrap_cis(y_true, y_pred, n_boot=200, seed=5,
                          keys=["sensitivity"])
    v = cis["sensitivity"]
    assert 0 < v["n_valid"] < 200
    assert v["lo"] == v["hi"] == 1.0


def test_auc_keys_require_probs():
    y_true, y_pred, _ = _fake_eval()
    cis = B.bootstrap_cis(y_true, y_pred, n_boot=10, seed=0)
    assert "auc_roc" not in cis and "auc_pr" not in cis


def test_format_cis_renders():
    y_true, y_pred, y_probs = _fake_eval(n=60)
    cis = B.bootstrap_cis(y_true, y_pred, y_probs, n_boot=50, seed=0)
    text = B.format_cis(cis, "RGB-Only")
    assert "RGB-Only" in text and "accuracy" in text and "[" in text


def test_roc_band_properties():
    y_true, _, y_probs = _fake_eval(n=200)
    fgrid, lo, mean, hi = B.roc_band(y_true, y_probs, n_boot=100, seed=1)
    assert fgrid.shape == lo.shape == mean.shape == hi.shape == (101,)
    assert np.all(lo <= mean + 1e-12) and np.all(mean <= hi + 1e-12)
    assert np.all((0 <= lo) & (hi <= 1))
    # deterministic
    again = B.roc_band(y_true, y_probs, n_boot=100, seed=1)
    np.testing.assert_array_equal(hi, again[3])
    with pytest.raises(ValueError, match="both classes"):
        B.roc_band(np.ones(10), np.linspace(0, 1, 10), n_boot=5)


def test_roc_plot_with_band(tmp_path):
    from dfu_multimodal_tpu.eval import plots
    y_true, _, y_probs = _fake_eval(n=100)
    band = B.roc_band(y_true, y_probs, n_boot=50, seed=0)
    out = plots.plot_roc_curve(y_true, y_probs, "Banded", tmp_path,
                               band=band)
    assert out.exists() and out.stat().st_size > 0
