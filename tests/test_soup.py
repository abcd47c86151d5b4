"""Model soups (train/soup.py + cli/soup.py): averaging math, greedy
selection, int8-ingredient rejection, CLI end-to-end."""

import jax
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (load_single_modality,
                                     make_synthetic_dataset)
from dfu_multimodal_tpu.train.engine import Trainer
from dfu_multimodal_tpu.train.soup import average_model_states, greedy_soup


def test_uniform_average_math():
    a = {"w": np.asarray([1.0, 2.0], np.float32), "b": {"k": np.float32(0)}}
    b = {"w": np.asarray([3.0, 4.0], np.float32), "b": {"k": np.float32(2)}}
    c = average_model_states([a, b])
    np.testing.assert_allclose(c["w"], [2.0, 3.0])
    assert float(c["b"]["k"]) == pytest.approx(1.0)
    assert c["w"].dtype == np.float32


def test_average_of_identical_is_identity():
    a = {"w": np.asarray([1.5, -2.5], np.float32)}
    c = average_model_states([a, dict(a), dict(a)])
    np.testing.assert_allclose(c["w"], a["w"], rtol=1e-7)


def test_average_rejects_int8_leaves():
    a = {"w": np.zeros(3, np.int8)}
    with pytest.raises(ValueError, match="int8"):
        average_model_states([a, a])


def test_average_rejects_structure_mismatch():
    a = {"w": np.zeros(3, np.float32)}
    b = {"w2": np.zeros(3, np.float32)}
    with pytest.raises(Exception):
        average_model_states([a, b])


def test_greedy_soup_rejects_harmful_ingredient():
    """Score = -||state - target||: the bad candidate drags the average
    away from the target, so greedy must keep only the good ones."""
    target = np.asarray([1.0, 1.0], np.float32)

    def eval_fn(state):
        return -float(np.linalg.norm(np.asarray(state["w"]) - target))

    good1 = {"w": np.asarray([1.0, 1.1], np.float32)}
    good2 = {"w": np.asarray([1.0, 0.9], np.float32)}
    bad = {"w": np.asarray([9.0, -7.0], np.float32)}
    soup, names, score = greedy_soup(
        [("bad", bad), ("good1", good1), ("good2", good2)], eval_fn,
        log=lambda s: None)
    assert "bad" not in names
    assert set(names) == {"good1", "good2"}
    np.testing.assert_allclose(soup["w"], [1.0, 1.0], atol=1e-6)


# -------------------------------------------------------------------- CLI


@pytest.fixture(scope="module")
def two_checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("soup_synth")
    make_synthetic_dataset(root, images_per_class=16, size=32)
    train = load_single_modality(root / "rgb", "train", 32, "rgb")
    val = load_single_modality(root / "rgb", "val", 32, "rgb")
    dirs = []
    for seed in (0, 1):
        cfg = config.TrainConfig(batch_size=8, num_epochs=4,
                                 learning_rate=3e-3,
                                 compute_dtype="float32",
                                 save_best_after_epoch=1, seed=seed)
        tr = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
        d = tmp_path_factory.mktemp(f"soup_ckpt_{seed}")
        tr.fit(train, val, checkpoint_dir=d, image_size=32,
               log=lambda s: None)
        dirs.append(d)
    return root, dirs


@pytest.mark.parametrize("greedy", [False, True])
def test_soup_cli(two_checkpoints, tmp_path, greedy):
    from dfu_multimodal_tpu.cli import soup as cli

    root, dirs = two_checkpoints
    out = tmp_path / ("greedy" if greedy else "uniform")
    argv = ["--checkpoints", str(dirs[0]), str(dirs[1]),
            "--data-dir", str(root), "--out", str(out),
            "--image-size", "32", "--batch-size", "8",
            "--compute-dtype", "float32"] + (["--greedy"] if greedy else [])
    assert cli.main(argv) == 0
    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod
    assert ckpt_mod.best_checkpoint_exists(out)
    meta = ckpt_mod.load_meta(out)
    assert meta["model"] == "tiny_rgb"
    assert meta["soup"]["recipe"] == ("greedy" if greedy else "uniform")
    assert len(meta["soup"]["ingredients"]) >= 1
    import torch
    res = torch.load(out / "test_results.pt", weights_only=False)
    assert 0.0 <= res["test_f1"] <= 1.0

    # the soup is a first-class checkpoint: predict consumes it
    from dfu_multimodal_tpu.cli import predict as predict_cli
    csv_out = tmp_path / f"soup_preds_{greedy}.csv"
    predict_cli.main(["--checkpoint", str(out),
                      "--images", str(root / "rgb" / "test" / "ulcer"),
                      "--output", str(csv_out), "--image-size", "32",
                      "--compute-dtype", "float32"])
    assert csv_out.exists()


def test_soup_cli_rejects_single_checkpoint(tmp_path):
    from dfu_multimodal_tpu.cli import soup as cli
    with pytest.raises(SystemExit, match="two"):
        cli.main(["--checkpoints", str(tmp_path), "--data-dir",
                  str(tmp_path), "--out", str(tmp_path / "o")])
