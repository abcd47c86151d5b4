"""Hyperparameter sweep harness (cli/sweep.py)."""

import json

import numpy as np
import pytest

from dfu_multimodal_tpu.cli.sweep import (ParamSpec, enumerate_trials,
                                          parse_param, trial_key)


def test_parse_discrete_values():
    s = parse_param("lr=1e-4,3e-4,1e-3")
    assert s.field == "learning_rate"
    assert s.values == (1e-4, 3e-4, 1e-3)
    # int fields parse as ints, string fields as strings
    assert parse_param("batch_size=8,16").values == (8, 16)
    assert parse_param("epochs=5").field == "num_epochs"
    assert parse_param("lr_schedule=constant,cosine").values == (
        "constant", "cosine")


def test_parse_distributions():
    s = parse_param("lr=log(1e-5,1e-3)")
    assert s.dist == "log" and s.lo == 1e-5 and s.hi == 1e-3
    u = parse_param("ema_decay=uniform(0,0.999)")
    assert u.dist == "uniform" and u.lo == 0.0 and u.hi == 0.999


def test_parse_rejects_bad_specs():
    with pytest.raises(ValueError, match="unknown sweep parameter"):
        parse_param("momentum=0.9")
    with pytest.raises(ValueError, match="name=values"):
        parse_param("lr")
    with pytest.raises(ValueError, match="no values"):
        parse_param("lr=")
    with pytest.raises(ValueError, match="log-uniform needs lo > 0"):
        parse_param("lr=log(0,1)")
    with pytest.raises(ValueError, match="lo < hi"):
        parse_param("lr=uniform(2,1)")


def test_grid_enumeration_cartesian():
    specs = [parse_param("lr=1e-4,1e-3"), parse_param("batch_size=8,16")]
    trials = enumerate_trials(specs, random_n=0, seed=0)
    assert len(trials) == 4
    assert {(t["learning_rate"], t["batch_size"]) for t in trials} == {
        (1e-4, 8), (1e-4, 16), (1e-3, 8), (1e-3, 16)}


def test_grid_rejects_continuous_axes():
    with pytest.raises(ValueError, match="need --random"):
        enumerate_trials([parse_param("lr=log(1e-5,1e-3)")],
                         random_n=0, seed=0)


def test_random_sampling_deterministic_and_in_range():
    specs = [parse_param("lr=log(1e-5,1e-3)"),
             parse_param("lr_schedule=constant,cosine")]
    a = enumerate_trials(specs, random_n=6, seed=7)
    b = enumerate_trials(specs, random_n=6, seed=7)
    assert a == b                                  # deterministic
    assert len(a) == 6
    for t in a:
        assert 1e-5 <= t["learning_rate"] <= 1e-3
        assert t["lr_schedule"] in ("constant", "cosine")
    # distinct configurations (log-uniform floats collide with prob ~0)
    assert len({trial_key(t) for t in a}) == 6


def test_random_discrete_space_dedupes():
    # only 2 distinct configs exist; asking for 8 yields the 2
    specs = [parse_param("lr_schedule=constant,cosine")]
    trials = enumerate_trials(specs, random_n=8, seed=0)
    assert len(trials) == 2


def test_trial_key_stable_and_order_free():
    a = trial_key({"learning_rate": 1e-4, "batch_size": 8})
    b = trial_key({"batch_size": 8, "learning_rate": 1e-4})
    assert a == b
    assert a != trial_key({"learning_rate": 2e-4, "batch_size": 8})


def test_param_spec_sample_bounds():
    rng = np.random.default_rng(0)
    log = ParamSpec("learning_rate", dist="log", lo=1e-5, hi=1e-2)
    vals = [log.sample(rng) for _ in range(100)]
    assert all(1e-5 <= v <= 1e-2 for v in vals)
    # log-uniform: roughly as many samples per decade
    decades = np.floor(np.log10(vals))
    assert len(set(decades.tolist())) >= 3


def test_sweep_cli_grid_smoke(tmp_path):
    """2-config grid on the synthetic dataset with the tiny model: trains,
    ranks, streams trials.jsonl, writes sweep_results.pt."""
    from dfu_multimodal_tpu.cli.sweep import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset
    from dfu_multimodal_tpu.utils.artifacts import load_pt

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    out = main(["--data-dir", str(data),
                "--checkpoint-root", str(tmp_path / "logs"),
                "--modality", "rgb", "--model", "tiny_rgb",
                "--param", "lr=3e-3,1e-3", "--epochs", "2",
                "--batch-size", "8", "--image-size", "32",
                "--compute-dtype", "float32", "--seed", "0"])
    assert out["n_trials"] == 2
    assert 0.0 <= out["best"]["best_val_f1_mean"] <= 1.0

    jsonl = tmp_path / "logs" / "sweep_rgb" / "trials.jsonl"
    recs = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert len(recs) == 2
    assert {r["params"]["learning_rate"] for r in recs} == {3e-3, 1e-3}

    saved = load_pt(tmp_path / "logs" / "sweep_rgb" / "sweep_results.pt")
    assert saved["best"]["best_val_f1_mean"] == max(
        r["best_val_f1_mean"] for r in recs)
    # ranking is descending
    means = [r["best_val_f1_mean"] for r in saved["records"]]
    assert means == sorted(means, reverse=True)


def test_sweep_cli_resume_skips_recorded(tmp_path):
    """--resume re-runs only configurations missing from trials.jsonl."""
    from dfu_multimodal_tpu.cli.sweep import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    base = ["--data-dir", str(data),
            "--checkpoint-root", str(tmp_path / "logs"),
            "--modality", "rgb", "--model", "tiny_rgb",
            "--epochs", "1", "--batch-size", "8", "--image-size", "32",
            "--compute-dtype", "float32", "--seed", "0"]
    main(base + ["--param", "lr=3e-3"])
    jsonl = tmp_path / "logs" / "sweep_rgb" / "trials.jsonl"
    n_before = len(jsonl.read_text().splitlines())
    assert n_before == 1

    # widened sweep with --resume: only the new config trains
    out = main(base + ["--param", "lr=3e-3,1e-3", "--resume"])
    lines = jsonl.read_text().splitlines()
    assert len(lines) == 2                       # one appended, not two
    assert out["n_trials"] == 2


def test_sweep_resume_reruns_on_changed_context(tmp_path):
    """--resume must NOT reuse a score recorded under a different
    non-swept config (epochs here) — the trial identity includes the
    context, so the trial re-runs and only the fresh record ranks."""
    import json as json_mod

    from dfu_multimodal_tpu.cli.sweep import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    base = ["--data-dir", str(data),
            "--checkpoint-root", str(tmp_path / "logs"),
            "--modality", "rgb", "--model", "tiny_rgb",
            "--param", "lr=3e-3", "--batch-size", "8",
            "--image-size", "32", "--compute-dtype", "float32",
            "--seed", "0"]
    main(base + ["--epochs", "1"])
    jsonl = tmp_path / "logs" / "sweep_rgb" / "trials.jsonl"
    assert len(jsonl.read_text().splitlines()) == 1

    out = main(base + ["--epochs", "2", "--resume"])
    lines = [json_mod.loads(l) for l in jsonl.read_text().splitlines()]
    assert len(lines) == 2                     # re-ran, did not skip
    assert lines[0]["key"] != lines[1]["key"]  # distinct identities
    assert out["n_trials"] == 1                # stale record excluded


def test_sweep_cli_multimodal_smoke(tmp_path):
    """Multimodal sweep path: paired loading + the two-input tiny_fusion
    model through the same engine."""
    from dfu_multimodal_tpu.cli.sweep import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    out = main(["--data-dir", str(data),
                "--checkpoint-root", str(tmp_path / "logs"),
                "--modality", "multimodal", "--model", "tiny_fusion",
                "--param", "lr=3e-3", "--epochs", "1",
                "--batch-size", "8", "--image-size", "32",
                "--compute-dtype", "float32", "--seed", "0"])
    assert out["n_trials"] == 1
    assert 0.0 <= out["best"]["best_val_f1_mean"] <= 1.0


def test_sweep_cli_replicates(tmp_path):
    from dfu_multimodal_tpu.cli.sweep import main
    from dfu_multimodal_tpu.data import make_synthetic_dataset

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    out = main(["--data-dir", str(data),
                "--checkpoint-root", str(tmp_path / "logs"),
                "--modality", "rgb", "--model", "tiny_rgb",
                "--param", "lr=3e-3", "--replicates", "2",
                "--epochs", "1", "--batch-size", "8", "--image-size", "32",
                "--compute-dtype", "float32", "--seed", "0"])
    best = out["best"]
    assert len(best["scores"]) == 2
    assert best["best_val_f1_mean"] == pytest.approx(
        float(np.mean(best["scores"])))


def test_train_command_notes_never_comment_out_flags():
    """Unmappable swept params are appended AFTER every flag: a mid-line
    '#' would comment out the remaining flags when the printed repro
    command is pasted into a shell."""
    import argparse

    from dfu_multimodal_tpu.cli.sweep import _train_command

    args = argparse.Namespace(modality="rgb")
    cmd = _train_command(args, "data", {"drop_rate": 0.3,
                                        "learning_rate": 3e-4})
    assert "--lr 0.0003" in cmd
    assert "drop_rate=0.3: no single-run flag" in cmd
    assert cmd.index("#") > cmd.index("--lr"), cmd
