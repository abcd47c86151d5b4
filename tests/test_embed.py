"""Embedding extraction + retrieval (eval/embed.py, cli/embed.py)."""

from pathlib import Path

import numpy as np
import pytest

from dfu_multimodal_tpu.eval.embed import (cosine_topk, l2_normalize,
                                           load_embeddings,
                                           save_embeddings,
                                           uncertainty_order)


def test_l2_normalize_unit_rows():
    x = np.array([[3.0, 4.0], [0.0, 0.0], [1.0, 0.0]])
    n = l2_normalize(x)
    np.testing.assert_allclose(n[0], [0.6, 0.8], atol=1e-6)
    np.testing.assert_allclose(n[2], [1.0, 0.0], atol=1e-6)
    assert np.all(np.isfinite(n[1]))          # zero row stays finite


def test_cosine_topk_exact():
    index = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    queries = np.array([[2.0, 0.1]])
    top, sims = cosine_topk(queries, index, k=2)
    assert top[0, 0] == 0                      # most aligned with e_x
    assert top[0, 1] == 2                      # then the diagonal
    assert sims[0, 0] > sims[0, 1] > 0
    # k larger than the index clamps
    top3, _ = cosine_topk(queries, index, k=10)
    assert top3.shape == (1, 3)


def test_uncertainty_order():
    probs = np.array([0.9, 0.5, 0.1, 0.45])
    order = uncertainty_order(probs)
    assert order[0] == 1                       # exactly 0.5 first
    assert order[1] == 3
    assert set(order[2:]) == {0, 2}
    # deployed operating point recenters the triage boundary
    order_t = uncertainty_order(probs, center=0.9)
    assert order_t[0] == 0


def test_save_load_roundtrip(tmp_path):
    out = {"feat_rgb": np.random.default_rng(0).normal(
               size=(4, 8)).astype(np.float32),
           "probs": np.array([0.1, 0.9, 0.5, 0.3], np.float32),
           "preds": np.array([0, 1, 1, 0])}
    f = tmp_path / "emb.npz"
    save_embeddings(f, out, paths=["a.jpg", "b.jpg", "c.jpg", "d.jpg"],
                    labels=np.array([0, 1, 1, 0]), model="rgb_only",
                    embedding="rgb")
    back = load_embeddings(f)
    np.testing.assert_allclose(back["feat_rgb"], out["feat_rgb"])
    assert str(back["model"]) == "rgb_only"
    assert list(back["paths"]) == ["a.jpg", "b.jpg", "c.jpg", "d.jpg"]
    np.testing.assert_array_equal(back["labels"], [0, 1, 1, 0])


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train tiny_rgb briefly and checkpoint it for the CLI tests."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data import (load_single_modality,
                                         make_synthetic_dataset)
    from dfu_multimodal_tpu.train.engine import Trainer

    root = tmp_path_factory.mktemp("embed_synth")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=12, size=32)
    train = load_single_modality(data / "rgb", "train", image_size=32)
    val = load_single_modality(data / "rgb", "val", image_size=32)
    cfg = config.TrainConfig(batch_size=8, num_epochs=2,
                             learning_rate=3e-3, save_best_after_epoch=1,
                             compute_dtype="float32", seed=0)
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()},
                      class_weights=np.array([1.0, 1.0], np.float32))
    ckpt = root / "ckpt"
    trainer.fit(train, val, checkpoint_dir=ckpt, image_size=32,
                log=lambda s: None)
    return data, ckpt, trainer, train


def test_extract_features_shapes_and_probs(tiny_run):
    from dfu_multimodal_tpu.eval.embed import extract_features
    data, ckpt, trainer, train = tiny_run
    state = trainer.restore(ckpt, image_size=32)
    out = extract_features(trainer, state, train)
    n = len(train)
    assert out["feat_rgb"].shape == (n, 32)    # TinyCNN pooled channels
    assert out["feat_rgb"].dtype == np.float32
    assert out["probs"].shape == (n,)
    assert np.all((out["probs"] >= 0) & (out["probs"] <= 1))
    # probs must match the plain eval path (same forward, same weights)
    _, arrays = trainer.run_eval_epoch(state, train)
    np.testing.assert_allclose(out["probs"], arrays["y_probs"],
                               rtol=1e-5, atol=1e-5)


def test_embed_cli_index_then_retrieve(tiny_run, tmp_path):
    from dfu_multimodal_tpu.cli.embed import main
    data, ckpt, trainer, train = tiny_run

    index = tmp_path / "train_index.npz"
    res = main(["--checkpoint", str(ckpt), "--model", "tiny_rgb",
                "--data-dir", str(data), "--split", "train",
                "--image-size", "32", "--batch-size", "8",
                "--compute-dtype", "float32",
                "--output", str(index)])
    assert res["embedding"] == "rgb" and res["dims"] == 32
    stored = load_embeddings(index)
    assert "labels" in stored and "paths" in stored

    csv_out = tmp_path / "retrieval.csv"
    res2 = main(["--checkpoint", str(ckpt), "--model", "tiny_rgb",
                 "--images", str(data / "rgb" / "val" / "healthy"),
                 "--image-size", "32", "--batch-size", "8",
                 "--compute-dtype", "float32",
                 "--index", str(index), "--neighbors", "3",
                 "--csv", str(csv_out)])
    assert res2["n"] >= 1
    lines = csv_out.read_text().splitlines()
    header = lines[0].split(",")
    assert header[:3] == ["path", "prob_ulcer", "prediction"]
    assert "nn1_path" in header and "nn3_sim" in header
    # neighbor labels come from the stored index labels
    assert any(c in lines[1] for c in ("healthy", "ulcer"))


def test_embed_cli_rank_uncertainty(tiny_run, tmp_path):
    from dfu_multimodal_tpu.cli.embed import main
    data, ckpt, _, _ = tiny_run
    csv_out = tmp_path / "triage.csv"
    main(["--checkpoint", str(ckpt), "--model", "tiny_rgb",
          "--images", str(data / "rgb" / "val" / "healthy"),
          "--image-size", "32", "--batch-size", "8",
          "--compute-dtype", "float32",
          "--rank-uncertainty", "--csv", str(csv_out)])
    lines = csv_out.read_text().splitlines()[1:]
    margins = [abs(float(l.split(",")[1]) - 0.5) for l in lines]
    assert margins == sorted(margins)          # most uncertain first


def test_cross_split_near_duplicates():
    from dfu_multimodal_tpu.eval.embed import cross_split_near_duplicates
    rng = np.random.default_rng(0)
    train = rng.normal(size=(10, 16)).astype(np.float32)
    test = rng.normal(size=(4, 16)).astype(np.float32)
    test[2] = train[7] * 3.0              # same direction = cosine 1.0
    hits = cross_split_near_duplicates(
        {"train": train, "test": test},
        {"train": [f"t{i}" for i in range(10)],
         "test": [f"x{i}" for i in range(4)]}, threshold=0.99)
    assert len(hits) == 1
    h = hits[0]
    assert (h["path_a"], h["path_b"]) == ("t7", "x2")
    assert h["sim"] == pytest.approx(1.0, abs=1e-5)
    # same-split duplicates are NOT reported (cross-split only)
    train2 = np.concatenate([train, train[:1]])
    hits2 = cross_split_near_duplicates(
        {"train": train2, "test": test},
        {"train": [f"t{i}" for i in range(11)],
         "test": [f"x{i}" for i in range(4)]}, threshold=0.99)
    assert all(h["split_a"] != h["split_b"] for h in hits2)


def test_embed_cli_near_dup_check(tiny_run, tmp_path):
    """Plant a pixel-identical copy of a training image in the test split
    under a different name (invisible to the SHA gate only if re-encoded;
    here it IS byte-identical, which the embedding audit must flag too)."""
    import shutil

    from dfu_multimodal_tpu.cli.embed import main
    data, ckpt, _, _ = tiny_run
    src = next((data / "rgb" / "train" / "ulcer").glob("*.jpg"))
    planted = data / "rgb" / "test" / "ulcer" / "planted_copy.jpg"
    shutil.copy(src, planted)
    try:
        res = main(["--checkpoint", str(ckpt), "--model", "tiny_rgb",
                    "--data-dir", str(data), "--image-size", "32",
                    "--batch-size", "8", "--compute-dtype", "float32",
                    "--near-dup-check", "--near-dup-threshold", "0.9999",
                    "--csv", str(tmp_path / "dups.csv")])
        names = {(Path(h["path_a"]).name, Path(h["path_b"]).name)
                 for h in res["near_duplicates"]}
        assert (src.name, "planted_copy.jpg") in names
        assert (tmp_path / "dups.csv").exists()
    finally:
        planted.unlink()


@pytest.fixture(scope="module")
def tiny_fusion_run(tmp_path_factory):
    """Train the two-input tiny_fusion briefly — exercises the full
    multimodal path (paired loading, dual trunks, fused embedding)."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data import make_synthetic_dataset
    from dfu_multimodal_tpu.data.loader import load_paired
    from dfu_multimodal_tpu.train.engine import Trainer

    root = tmp_path_factory.mktemp("embed_fusion")
    data = root / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    train = load_paired(data, "train", 32, strategy="pseudo", seed=0)
    val = load_paired(data, "val", 32, strategy="pseudo", seed=0)
    cfg = config.TrainConfig(batch_size=8, num_epochs=1,
                             learning_rate=3e-3, save_best_after_epoch=1,
                             compute_dtype="float32", seed=0)
    trainer = Trainer("tiny_fusion", cfg,
                      {"rgb": config.rgb_modality(),
                       "thermal": config.thermal_modality()},
                      class_weights=np.array([1.0, 1.0], np.float32))
    ckpt = root / "ckpt"
    trainer.fit(train, val, checkpoint_dir=ckpt, image_size=32,
                log=lambda s: None)
    return data, ckpt, trainer, train


def test_extract_features_multimodal_fused_layout(tiny_fusion_run):
    """Two trunk spaces plus feat_fused in the fusion head's [rgb |
    thermal] concat order."""
    from dfu_multimodal_tpu.eval.embed import extract_features
    _, ckpt, trainer, train = tiny_fusion_run
    state = trainer.restore(ckpt, image_size=32)
    out = extract_features(trainer, state, train)
    n = len(train)
    assert out["feat_rgb"].shape == (n, 32)
    assert out["feat_thermal"].shape == (n, 32)
    assert out["feat_fused"].shape == (n, 64)
    np.testing.assert_array_equal(out["feat_fused"][:, :32],
                                  out["feat_rgb"])
    np.testing.assert_array_equal(out["feat_fused"][:, 32:],
                                  out["feat_thermal"])


def test_near_dup_check_multimodal_audits_per_trunk(tiny_fusion_run,
                                                    tmp_path):
    """A duplicated RGB image must be flagged in the rgb trunk space even
    though its pseudo-paired thermal partners differ per split (which
    dilutes the fused space — the reason the audit is per-trunk)."""
    import shutil

    from dfu_multimodal_tpu.cli.embed import main
    data, ckpt, _, _ = tiny_fusion_run
    src = next((data / "rgb" / "train" / "ulcer").glob("*.jpg"))
    planted = data / "rgb" / "test" / "ulcer" / "planted_rgb.jpg"
    shutil.copy(src, planted)
    try:
        res = main(["--checkpoint", str(ckpt), "--model", "tiny_fusion",
                    "--data-dir", str(data), "--image-size", "32",
                    "--batch-size", "8", "--compute-dtype", "float32",
                    "--near-dup-check", "--near-dup-threshold", "0.9999"])
        rgb_hits = {(Path(h["path_a"]).name, Path(h["path_b"]).name)
                    for h in res["near_duplicates"]
                    if h["embedding"] == "rgb"}
        assert (src.name, "planted_rgb.jpg") in rgb_hits
    finally:
        planted.unlink()


def test_embed_cli_multimodal_images_mode(tiny_fusion_run, tmp_path):
    """--images + --thermal-images retrieval on a two-input model: the
    fused space indexes and queries consistently."""
    from dfu_multimodal_tpu.cli.embed import main
    data, ckpt, _, _ = tiny_fusion_run

    index = tmp_path / "idx.npz"
    res = main(["--checkpoint", str(ckpt), "--model", "tiny_fusion",
                "--data-dir", str(data), "--split", "train",
                "--image-size", "32", "--batch-size", "8",
                "--compute-dtype", "float32", "--output", str(index)])
    assert res["embedding"] == "fused" and res["dims"] == 64

    res2 = main(["--checkpoint", str(ckpt), "--model", "tiny_fusion",
                 "--images", str(data / "rgb" / "val" / "healthy"),
                 "--thermal-images",
                 str(data / "thermal" / "val" / "healthy"),
                 "--image-size", "32", "--batch-size", "8",
                 "--compute-dtype", "float32",
                 "--index", str(index), "--neighbors", "2"])
    assert res2["embedding"] == "fused"
    assert res2["n"] >= 1


def test_embed_cli_input_validation(tiny_run):
    from dfu_multimodal_tpu.cli.embed import main
    _, ckpt, _, _ = tiny_run
    with pytest.raises(SystemExit, match="exactly one"):
        main(["--checkpoint", str(ckpt), "--model", "tiny_rgb"])


def test_trunk_scope_mapping_covers_zoo():
    """Every non-tiny registered model has a trunk-scope mapping (or is
    knowingly absent) so extract_features can't silently miss a family."""
    from dfu_multimodal_tpu.eval.embed import TRUNK_SCOPES, _TINY
    from dfu_multimodal_tpu.models import zoo
    for name in zoo.available():
        assert name in TRUNK_SCOPES or name in _TINY, name


@pytest.mark.parametrize("name", ["rgb_only", "thermal_only", "multimodal",
                                  "efficientnet_rgb",
                                  "legacy_gated_fusion",
                                  "legacy_rgb_resnet_fusion",
                                  "tiny_fusion"])
def test_trunk_scopes_resolve_abstractly(name):
    """TRUNK_SCOPES names must match the real Flax auto/explicit scope
    names, with the documented feature dims — verified without compiling
    via jax.eval_shape over the captured apply."""
    import jax
    import jax.numpy as jnp

    from dfu_multimodal_tpu.eval.embed import TRUNK_SCOPES
    from dfu_multimodal_tpu.models import zoo

    kwargs = ({"attention_impl": "xla"}
              if name in ("thermal_only", "multimodal") else {})
    module, spec = zoo.build(name, **kwargs)
    variables = zoo.init_shapes(module, spec, image_size=32)
    scopes = TRUNK_SCOPES[name]
    want = set(scopes.values())

    def filt(mdl, meth):
        return (meth == "__call__" and len(mdl.path) == 1
                and mdl.path[0] in want)

    def run(variables):
        dummy = tuple(jnp.zeros((2, 32, 32, 3), jnp.float32)
                      for _ in spec.inputs)
        return module.apply(variables, *dummy, train=False,
                            capture_intermediates=filt,
                            mutable=["intermediates"])

    _, inter = jax.eval_shape(run, variables)
    inter = inter["intermediates"]
    dims = {"ResNet_0": 2048, "ViT_0": 768,
            "rgb_branch": 2048 if name == "multimodal" else 32,
            "thermal_branch": 768 if name == "multimodal" else 32,
            "EfficientNetB0_0": 1280,
            "rgb_encoder": None, "thermal_encoder": 1280}
    for emb, scope in scopes.items():
        assert scope in inter, (name, scope, sorted(inter))
        feat = inter[scope]["__call__"][0]
        assert feat.shape[0] == 2 and feat.ndim == 2, (name, feat.shape)
        if dims.get(scope) is not None:
            assert feat.shape[1] == dims[scope], (name, feat.shape)
