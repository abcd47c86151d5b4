"""Golden tests: our numpy metrics engine vs scikit-learn."""

import numpy as np
import pytest
import sklearn.metrics as skm

from dfu_multimodal_tpu.eval import metrics as M


def cases():
    rng = np.random.default_rng(42)
    out = []
    for n in (10, 131, 276):
        y_true = rng.integers(0, 2, n)
        y_score = rng.random(n)
        y_pred = (y_score > 0.5).astype(int)
        out.append((y_true, y_pred, y_score))
    # with ties in scores
    y_true = rng.integers(0, 2, 64)
    y_score = np.round(rng.random(64), 1)
    out.append((y_true, (y_score > 0.5).astype(int), y_score))
    # degenerate: all one class predicted (the multimodal collapse case,
    # BASELINE.md: sens=1.0 spec=0.0)
    y_true = rng.integers(0, 2, 40)
    out.append((y_true, np.ones(40, int), rng.random(40)))
    return out


@pytest.mark.parametrize("case_idx", range(len(cases())))
def test_metrics_match_sklearn(case_idx):
    y_true, y_pred, y_score = cases()[case_idx]
    m = M.compute_all_metrics(y_true, y_pred, y_score)

    np.testing.assert_array_equal(
        m["confusion_matrix"], skm.confusion_matrix(y_true, y_pred))
    assert m["accuracy"] == pytest.approx(skm.accuracy_score(y_true, y_pred))
    assert m["precision"] == pytest.approx(
        skm.precision_score(y_true, y_pred, zero_division=0))
    assert m["recall"] == pytest.approx(
        skm.recall_score(y_true, y_pred, zero_division=0))
    assert m["f1"] == pytest.approx(
        skm.f1_score(y_true, y_pred, zero_division=0))
    assert m["mcc"] == pytest.approx(
        skm.matthews_corrcoef(y_true, y_pred), abs=1e-12)
    assert m["kappa"] == pytest.approx(
        skm.cohen_kappa_score(y_true, y_pred), abs=1e-12)
    assert m["auc_roc"] == pytest.approx(
        skm.roc_auc_score(y_true, y_score), abs=1e-12)
    prec, rec, _ = skm.precision_recall_curve(y_true, y_score)
    assert m["auc_pr"] == pytest.approx(skm.auc(rec, prec), abs=1e-12)
    assert m["balanced_accuracy"] == pytest.approx(
        skm.balanced_accuracy_score(y_true, y_pred))


@pytest.mark.parametrize("case_idx", range(len(cases())))
def test_curves_match_sklearn(case_idx):
    y_true, _, y_score = cases()[case_idx]
    fpr, tpr, thr = M.roc_curve(y_true, y_score)
    sk_fpr, sk_tpr, sk_thr = skm.roc_curve(y_true, y_score,
                                           drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr)
    np.testing.assert_allclose(tpr, sk_tpr)

    prec, rec, _ = M.precision_recall_curve(y_true, y_score)
    sk_prec, sk_rec, _ = skm.precision_recall_curve(y_true, y_score)
    np.testing.assert_allclose(prec, sk_prec)
    np.testing.assert_allclose(rec, sk_rec)


def test_device_confusion_counts():
    import jax.numpy as jnp
    preds = jnp.asarray([1, 0, 1, 0, 1])
    labels = jnp.asarray([1, 0, 0, 1, 1])
    valid = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])   # last masked out
    counts = np.asarray(M.confusion_counts(preds, labels, valid))
    assert counts.tolist() == [1.0, 1.0, 1.0, 1.0]   # tn fp fn tp
    assert M.f1_from_counts(counts) == pytest.approx(0.5)
    assert M.accuracy_from_counts(counts) == pytest.approx(0.5)


def test_f1_zero_division():
    assert M.f1_from_counts(np.array([5.0, 0, 0, 0])) == 0.0


def test_pick_threshold_strategies():
    """Operating-point selection (eval/threshold.py): golden checks on a
    hand-built score distribution, sklearn-free."""
    from dfu_multimodal_tpu.eval.threshold import (apply_threshold,
                                                   pick_threshold)

    y = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    p = np.array([0.05, 0.2, 0.3, 0.45, 0.7,    # negatives (one hard)
                  0.35, 0.6, 0.8, 0.9, 0.95])   # positives (one hard)

    # youden: J is maximized separating all but the two hard samples
    t, info = pick_threshold(y, p, "youden")
    pred = apply_threshold(p, t)
    sens = pred[y == 1].mean()
    spec = 1 - pred[y == 0].mean()
    assert sens + spec - 1 == pytest.approx(0.6)
    assert info["selection_sensitivity"] == pytest.approx(sens)

    # brute-force check: no realized threshold does better on J or F1
    def counts_at(t):
        pr = (p >= t).astype(int)
        s = pr[y == 1].mean()
        sp = 1 - pr[y == 0].mean()
        f1 = (2 * pr[y == 1].sum()
              / max(pr.sum() + (y == 1).sum(), 1e-12))
        return s + sp - 1, f1
    best_j = max(counts_at(c)[0] for c in p)
    assert counts_at(t)[0] == pytest.approx(best_j)

    t_f1, _ = pick_threshold(y, p, "f1")
    best_f1 = max(counts_at(c)[1] for c in p)
    assert counts_at(t_f1)[1] == pytest.approx(best_f1)

    # sens@1.0: must keep every positive -> threshold at the lowest
    # positive score, catching the hard positive at 0.35
    t_s, info_s = pick_threshold(y, p, "sens@1.0")
    assert info_s["selection_sensitivity"] == 1.0
    assert t_s == pytest.approx(0.35)
    # and it is the MOST SPECIFIC such point
    assert info_s["selection_specificity"] == pytest.approx(0.6)

    with pytest.raises(ValueError):
        pick_threshold(y, p, "sens@0")
    with pytest.raises(ValueError):
        pick_threshold(np.zeros(4, int), np.linspace(0, 1, 4), "youden")
    with pytest.raises(ValueError):
        pick_threshold(y, p, "nope")


def test_auc_metrics_nan_on_degenerate_labels():
    """Single-class y_true: ROC-AUC is undefined (sklearn raises) — it
    must surface as NaN, never as 0.0 'worst possible model'."""
    import numpy as np

    from dfu_multimodal_tpu.eval.metrics import (compute_all_metrics,
                                                 pr_auc_score,
                                                 roc_auc_score)

    y_pos = np.ones(6, np.int64)
    probs = np.linspace(0.6, 0.99, 6)
    assert np.isnan(roc_auc_score(y_pos, probs))
    y_neg = np.zeros(6, np.int64)
    assert np.isnan(roc_auc_score(y_neg, probs))
    assert np.isnan(pr_auc_score(y_neg, probs))   # no positives
    m = compute_all_metrics(y_pos, y_pos, probs)
    assert np.isnan(m["auc_roc"])
    # two-class behavior unchanged
    y = np.array([0, 1, 0, 1]); p = np.array([0.1, 0.9, 0.2, 0.8])
    assert roc_auc_score(y, p) == 1.0
