"""Property-based tests (hypothesis) over the pure host-side functions:
metrics-vs-sklearn equivalence on arbitrary label/probability vectors,
calibration algebra, threshold-selection contracts, pairing and split
invariants, checkpoint msgpack round-trips.

These complement the golden-value tests: instead of a handful of fixed
vectors, every run samples fresh adversarial inputs (degenerate classes,
ties, extreme probabilities) and checks the *invariants* each function
promises."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dfu_multimodal_tpu.eval import calibration as C
from dfu_multimodal_tpu.eval import metrics as M

SET = settings(max_examples=60, deadline=None)


# ---------------------------------------------------------------- strategies

def labels_preds(min_size=2, max_size=120):
    return st.integers(min_size, max_size).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 1), min_size=n, max_size=n),
            st.lists(st.integers(0, 1), min_size=n, max_size=n)))


def labels_probs(min_size=4, max_size=120):
    return st.integers(min_size, max_size).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 1), min_size=n, max_size=n),
            st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=n,
                     max_size=n)))


# ------------------------------------------------------- metrics vs sklearn

@SET
@given(labels_preds())
def test_counts_metrics_match_sklearn(lp):
    import sklearn.metrics as SK
    y, p = np.asarray(lp[0]), np.asarray(lp[1])
    m = M.compute_all_metrics(y, p)
    assert m["accuracy"] == pytest.approx(SK.accuracy_score(y, p))
    assert m["mcc"] == pytest.approx(SK.matthews_corrcoef(y, p), abs=1e-12)
    if not (y.min() == y.max() and p.min() == p.max()):
        # both-constant is the pe==1 degenerate where sklearn yields nan
        # and the engine defines kappa := 0
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sk_kappa = SK.cohen_kappa_score(y, p)
        if not np.isnan(sk_kappa):
            assert m["kappa"] == pytest.approx(sk_kappa, abs=1e-12)
    sk_f1 = SK.f1_score(y, p, zero_division=0)
    assert m["f1"] == pytest.approx(sk_f1, abs=1e-12)


@SET
@given(labels_probs())
def test_auc_matches_sklearn_when_defined(lp):
    import sklearn.metrics as SK
    y, pr = np.asarray(lp[0]), np.asarray(lp[1], np.float64)
    if y.min() == y.max():
        return                       # AUC undefined; engine guards upstream
    m = M.compute_all_metrics(y, (pr > 0.5).astype(int), pr)
    assert m["auc_roc"] == pytest.approx(SK.roc_auc_score(y, pr), abs=1e-12)


# ------------------------------------------------------- calibration algebra

@SET
@given(st.lists(st.floats(0.05, 0.95), min_size=1, max_size=64),
       st.floats(0.5, 4.0), st.floats(0.5, 4.0))
def test_temperature_composition(probs, a, b):
    """apply(apply(p, a), b) == apply(p, a·b): temperatures compose
    multiplicatively on the logit scale. (Holds away from the 1e-7
    probability clip — a sharpening T can push the intermediate onto the
    clip, where the identity intentionally saturates; ranges chosen to
    stay clear.)"""
    p = np.asarray(probs)
    lhs = C.apply_temperature(C.apply_temperature(p, a), b)
    rhs = C.apply_temperature(p, a * b)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6, atol=1e-9)


@SET
@given(labels_probs(), st.integers(2, 25))
def test_ece_bounds_and_bin_partition(lp, bins):
    y, pr = np.asarray(lp[0]), np.asarray(lp[1])
    errs = C.calibration_errors(y, pr, n_bins=bins)
    assert 0.0 <= errs["ece"] <= 1.0
    assert errs["ece"] <= errs["mce"] + 1e-12
    assert 0.0 <= errs["brier"] <= 1.0
    _, _, counts = C.reliability_curve(y, pr, n_bins=bins)
    assert counts.sum() == len(y)          # every row in exactly one bin


# ---------------------------------------------------- threshold selection

@SET
@given(labels_probs(min_size=6))
def test_pick_threshold_contracts(lp):
    from dfu_multimodal_tpu.eval.threshold import (apply_threshold,
                                                   pick_threshold)
    y, pr = np.asarray(lp[0]), np.asarray(lp[1], np.float64)
    if y.min() == y.max():
        with pytest.raises(ValueError):
            pick_threshold(y, pr, "youden")
        return
    for strategy in ("youden", "f1", "sens@0.8"):
        try:
            t, info = pick_threshold(y, pr, strategy)
        except ValueError:
            assert strategy.startswith("sens@")   # floor can be unreachable
            continue
        preds = apply_threshold(pr, t)
        assert set(np.unique(preds)) <= {0, 1}
        if strategy.startswith("sens@"):
            pos = y == 1
            assert preds[pos].mean() >= 0.8 - 1e-12
        assert info["threshold"] == t


# -------------------------------------------------------- pairing invariants

@SET
@given(st.tuples(st.integers(0, 40), st.integers(0, 40)),
       st.tuples(st.integers(0, 40), st.integers(0, 40)),
       st.integers(0, 2 ** 31 - 1))
def test_pairing_invariants(rgb_counts, th_counts, seed):
    from dfu_multimodal_tpu.data import pairing as P
    rgb_counts, th_counts = list(rgb_counts), list(th_counts)
    pseudo = P.pseudo_pairs(rgb_counts, th_counts, seed=seed)
    for label in (0, 1):
        n_rgb, n_th = rgb_counts[label], th_counts[label]
        got = sum(1 for p in pseudo if p.label == label)
        want = max(n_rgb, n_th) if (n_rgb and n_th) else 0
        assert got == want                 # modulo-cycling count contract
    for p in pseudo:                       # indices always in range
        assert 0 <= p.rgb < rgb_counts[p.label]
        assert 0 <= p.thermal < th_counts[p.label]

    aligned = P.aligned_pairs(rgb_counts, th_counts)
    for label in (0, 1):
        got = sum(1 for p in aligned if p.label == label)
        n_rgb, n_th = rgb_counts[label], th_counts[label]
        # truncate-to-min when both modalities have the class; a class
        # missing from one modality keeps ALL rows of the other, paired
        # with a None placeholder (DFUPairedDataset black-image contract)
        if n_rgb and n_th:
            assert got == min(n_rgb, n_th)
        else:
            assert got == max(n_rgb, n_th)


# ------------------------------------------------------------ CV fold algebra

@SET
@given(st.integers(0, 60), st.integers(0, 60), st.integers(2, 6),
       st.integers(0, 2 ** 31 - 1))
def test_stratified_folds_properties(n0, n1, k, seed):
    from dfu_multimodal_tpu.cli.cross_validate import stratified_folds
    labels = np.array([0] * n0 + [1] * n1)
    rng = np.random.default_rng(seed)
    if k > max(n0, n1):
        # some fold would receive no row from either class
        with pytest.raises(ValueError):
            stratified_folds(labels, k, rng)
        return
    folds = stratified_folds(labels, k, rng)
    allidx = np.sort(np.concatenate(folds))
    np.testing.assert_array_equal(allidx, np.arange(len(labels)))
    for f in folds:                        # per-class balance within 1
        c = np.bincount(labels[f], minlength=2)
        assert abs(c[0] - n0 / k) < 1 + n0 / k - n0 // k
        assert abs(c[1] - n1 / k) < 1 + n1 / k - n1 // k


# -------------------------------------------------- checkpoint round-trips

@SET
@given(st.lists(st.tuples(
    st.sampled_from(["float32", "int32", "uint8", "bfloat16"]),
    st.lists(st.integers(1, 5), min_size=0, max_size=3)),
    min_size=1, max_size=6), st.integers(0, 2 ** 31 - 1))
def test_checkpoint_msgpack_roundtrip(specs, seed):
    """save_checkpoint/load_checkpoint round-trips arbitrary nested trees
    of arrays bit-exactly (incl. bf16 leaves)."""
    import tempfile
    from pathlib import Path

    import jax.numpy as jnp

    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod
    rng = np.random.default_rng(seed)
    tree = {}
    for i, (dtype, shape) in enumerate(specs):
        arr = rng.normal(0, 10, shape)
        if dtype == "bfloat16":
            leaf = jnp.asarray(arr, jnp.bfloat16)
        else:
            leaf = np.asarray(
                arr.astype(np.float32) if dtype == "float32"
                else np.abs(arr).astype(dtype))
        tree[f"layer_{i}"] = {"w": leaf}
    with tempfile.TemporaryDirectory() as td:
        ckpt_mod.save_checkpoint(Path(td), epoch=1,
                                 model_state={"params": tree}, opt_state={},
                                 val_f1=0.5, history={})
        payload, meta = ckpt_mod.load_checkpoint(Path(td))
    for i, (dtype, shape) in enumerate(specs):
        got = payload["model_state"]["params"][f"layer_{i}"]["w"]
        want = tree[f"layer_{i}"]["w"]
        assert tuple(np.shape(got)) == tuple(shape)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
