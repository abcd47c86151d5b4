"""Dataset tooling: organizer, splits, standardize, analyze, verify,
fix_checkpoint_keys, convert_checkpoint CLI."""

import json

import numpy as np
import pytest
from PIL import Image

from dfu_multimodal_tpu.tools import organize as org
from dfu_multimodal_tpu.tools import splits as sp
from dfu_multimodal_tpu.tools import standardize as std
from dfu_multimodal_tpu.tools import analyze as an
from dfu_multimodal_tpu.tools import verify as vf


def _write_img(path, size=(30, 20), color=(100, 50, 20), seed=None):
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed if seed is not None else hash(str(path)) % 2**32)
    arr = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
    Image.fromarray(arr).save(path)
    return path


@pytest.fixture()
def raw_tree(tmp_path):
    """Raw Kaggle-style layout with a cross-class duplicate."""
    rgb = tmp_path / "DFU_RGB"
    for i in range(6):
        _write_img(rgb / "Patches" / "Normal" / f"norm_{i}.jpg", seed=i)
    for i in range(6):
        _write_img(rgb / "Patches" / "Abnormal" / f"ab_{i}.jpg", seed=100 + i)
    _write_img(rgb / "TestSet" / "t_0.jpg", seed=200)
    # exact duplicate: same bytes in Normal and Abnormal -> ulcer wins
    dup_src = rgb / "Patches" / "Normal" / "norm_0.jpg"
    (rgb / "Patches" / "Abnormal" / "dup.jpg").write_bytes(
        dup_src.read_bytes())

    th = tmp_path / "DFU_Thermal"
    for split in ("train", "val"):
        for i in range(4):
            _write_img(th / "ThermoDataBase" / split / "Control Group"
                       / f"c_{split}_{i}.jpg", seed=300 + i * 7)
            _write_img(th / "ThermoDataBase" / split / "DM Group"
                       / f"d_{split}_{i}.jpg", seed=400 + i * 7)
    return rgb, th


def test_organizer_dedup_split_manifest(raw_tree, tmp_path):
    rgb, th = raw_tree
    out = tmp_path / "data"
    results = org.organize_clean_dataset(rgb, th, out, verbose=False)

    r = results["rgb"]
    # 13 rgb files, 1 duplicate pair -> 12 unique; dup hash -> ulcer
    assert r.dedupe_report["total_candidate_files"] == 14
    assert r.dedupe_report["unique_hashes"] == 13
    assert r.dedupe_report["duplicates_removed"] == 1
    assert r.healthy == 5 and r.ulcer == 8   # norm_0 stolen by ulcer

    manifest = json.loads((out / "dataset_manifest.json").read_text())
    assert set(manifest["rgb"]) == {f"{i:06d}.jpg" for i in range(1, 14)}
    # every split dir exists and file counts match manifest
    for split in ("train", "val", "test"):
        for cls in ("healthy", "ulcer"):
            n_files = len(list((out / "rgb" / split / cls).glob("*.jpg")))
            n_manifest = sum(1 for v in manifest["rgb"].values()
                             if v["split"] == split and v["class"] == cls)
            assert n_files == n_manifest
    assert (out / "rgb_dedupe_report.json").exists()
    assert (out / "thermal_dedupe_report.json").exists()
    assert (out / "dataset_summary.txt").exists()

    # the duplicate's manifest entry lists both originals
    dup_entries = [v for v in manifest["rgb"].values()
                   if len(v["originals"]) == 2]
    assert len(dup_entries) == 1 and dup_entries[0]["class"] == "ulcer"


def test_organizer_is_deterministic(raw_tree, tmp_path):
    rgb, th = raw_tree
    out1, out2 = tmp_path / "d1", tmp_path / "d2"
    m1 = org.organize_clean_dataset(rgb, th, out1, verbose=False)
    m2 = org.organize_clean_dataset(rgb, th, out2, verbose=False)
    assert m1["rgb"].manifest == m2["rgb"].manifest


def test_patient_split_no_group_leakage(tmp_path):
    src = tmp_path / "flat"
    items = []
    for cls in ("healthy", "ulcer"):
        for i in range(40):
            p = _write_img(src / cls / f"img_{i}.jpg", seed=i)
            items.append((p, cls))
    groups = sp.group_items(items, group_size=5)
    assert len(groups) == 8    # 40 imgs / 5 per group, same ids both classes
    train, val, test = sp.patient_level_split(groups)
    split_items = {"train": train, "val": val, "test": test}
    assert sp.leakage_check_groups(split_items) == 0
    assert len(train) + len(val) + len(test) == 80


def test_random_split_sizes():
    items = list(range(100))
    train, val, test = sp.random_split_70_15_15(items)
    assert len(train) == 70 and len(val) == 15 and len(test) == 15
    assert sorted(train + val + test) == items


def test_standardize_and_verify(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _write_img(src / "a" / "wide.jpg", size=(100, 40))
    _write_img(src / "tall.jpg", size=(40, 100))
    result = std.standardize_tree(src, dst, target=64, verbose=False)
    assert result == {"processed": 2, "errors": 0}
    check = std.verify_standardization(dst, target=64, verbose=False)
    assert check == {"ok": 2, "bad": 0}
    with Image.open(dst / "a" / "wide.jpg") as img:
        arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)
    assert arr[:10].sum() == 0           # black padding top (wide image)


def test_analyze(tmp_path):
    root = tmp_path / "imgs"
    _write_img(root / "a.jpg", size=(100, 40))
    _write_img(root / "b.jpg", size=(50, 50))
    stats = an.analyze_image_sizes(root, verbose=False)
    assert stats["count"] == 2
    assert stats["width"]["max"] == 100
    assert "pad" in stats["recommendation"]


def test_verify_structure(raw_tree, tmp_path):
    rgb, th = raw_tree
    out = tmp_path / "data"
    org.organize_clean_dataset(rgb, th, out, verbose=False)
    res = vf.verify_structure(rgb_source=rgb, thermal_source=th,
                              organized=out, verbose=False)
    assert all(res["rgb"].values())
    assert all(res["thermal"].values())
    assert all(res["organized"].values())


def test_prepare_legacy_raw(raw_tree, tmp_path):
    from dfu_multimodal_tpu.tools.prepare_legacy import prepare_datasets
    rgb, th = raw_tree
    out = tmp_path / "legacy_data"
    counts = prepare_datasets(rgb, th, out, verbose=False)
    # rgb: 7 Normal (incl dup? no — Normal has 6+0... norm_0..5=6) per split sums
    assert sum(counts["rgb"][s]["healthy"] for s in counts["rgb"]) == 6
    # thermal: raw val -> val; raw train carved 85/15 into train/test
    th_counts = counts["thermal"]
    assert th_counts["val"]["healthy"] == 4
    assert th_counts["train"]["healthy"] + th_counts["test"]["healthy"] == 4
    assert th_counts["test"]["healthy"] >= 0
    info = (out / "dataset_info.txt").read_text()
    assert "DFU Multimodal Dataset Information" in info
    assert "TRAIN Split:" in info


def test_download_datasets_without_kaggle(tmp_path, monkeypatch):
    import shutil as _shutil
    from dfu_multimodal_tpu.cli.download_datasets import main
    monkeypatch.setattr(_shutil, "which", lambda _: None)
    assert main(["--out", str(tmp_path)]) == 1    # instructions path


def test_fix_checkpoint_keys(tmp_path):
    import torch
    from dfu_multimodal_tpu.cli.fix_checkpoint_keys import fix_checkpoint_keys
    ckpt = {"model_state_dict": {"backbone.layer1.w": torch.zeros(2),
                                 "other.w": torch.ones(2)},
            "epoch": 3}
    path = tmp_path / "best_model.pt"
    torch.save(ckpt, path)
    n = fix_checkpoint_keys(path, "resnet")
    assert n == 1
    reloaded = torch.load(path, weights_only=False)
    assert set(reloaded["model_state_dict"]) == {"resnet.layer1.w",
                                                 "other.w"}


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """Reference-style torch checkpoint -> our checkpoint -> eval CLI."""
    import torch
    from tests.test_convert_torch import (make_resnet50_state_dict,
                                          torch_resnet50_forward)
    from dfu_multimodal_tpu.cli.convert_checkpoint import main as conv_main
    from dfu_multimodal_tpu.train.engine import Trainer
    from dfu_multimodal_tpu import config as cfg_mod
    import jax.numpy as jnp

    sd = make_resnet50_state_dict(prefix="backbone.")
    torch.save({"model_state_dict": sd, "epoch": 7, "val_f1": 0.9,
                "history": {}}, tmp_path / "best_model.pt")
    out = tmp_path / "converted"
    conv_main(["--model", "rgb_only",
               "--torch-checkpoint", str(tmp_path / "best_model.pt"),
               "--output", str(out), "--image-size", "64"])

    cfg = cfg_mod.TrainConfig(batch_size=2, compute_dtype="float32",
                              mesh=cfg_mod.MeshConfig(data=1))
    trainer = Trainer("rgb_only", cfg, {"rgb": cfg_mod.rgb_modality()})
    state = trainer.restore(out, image_size=64)

    x = torch.randn(2, 3, 64, 64)
    ref = torch_resnet50_forward(
        {k[len("backbone."):]: v for k, v in sd.items()}, x).numpy()
    ours = np.asarray(trainer.module.apply(
        trainer.variables(state),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
