"""jax.export serving bundles (serve/export.py + cli/export_model.py):
freeze a checkpoint's eval forward into versioned StableHLO programs and
replay them — without model source — with row-for-row parity."""

import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.serve.engine import ServingEngine
from dfu_multimodal_tpu.serve.export import (META_NAME, PARAMS_NAME,
                                             default_buckets, export_bundle,
                                             load_bundle)
from dfu_multimodal_tpu.train.engine import Trainer
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

SIZE = 32


def tiny_trainer(name="tiny_rgb"):
    cfg = config.TrainConfig(batch_size=4, eval_batch_size=4,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    mods = {"rgb": config.rgb_modality(),
            "thermal": config.thermal_modality(blur=False)}
    trainer = Trainer(name, cfg, mods, attention_impl="xla")
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    return trainer, state


def rand_batch(inputs, n, seed=0):
    rng = np.random.default_rng(seed)
    batch = {m: rng.integers(0, 255, (n, SIZE, SIZE, 3)).astype(np.uint8)
             for m in inputs}
    batch["label"] = rng.integers(0, 2, n).astype(np.int32)
    batch["valid"] = np.ones(n, np.float32)
    return batch


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    trainer, state = tiny_trainer()
    out = tmp_path_factory.mktemp("export") / "tiny_rgb"
    meta = export_bundle(trainer, state, out, image_size=SIZE,
                         buckets=(1, 4))
    return trainer, state, out, meta


def test_default_bucket_ladder():
    assert default_buckets(64) == (1, 2, 4, 8, 16, 32, 64)
    assert default_buckets(1) == (1,)


def test_bundle_files_and_meta(bundle):
    _, _, out, meta = bundle
    assert (out / META_NAME).exists() and (out / PARAMS_NAME).exists()
    assert (out / "forward_b1.jaxexp").exists()
    assert (out / "forward_b4.jaxexp").exists()
    disk = json.loads((out / META_NAME).read_text())
    assert disk == meta
    assert meta["model"] == "tiny_rgb"
    assert meta["inputs"] == ["rgb"]
    assert meta["buckets"] == [1, 4]
    assert meta["image_size"] == SIZE
    assert jax.devices()[0].platform in meta["platforms"]
    assert meta["jax_version"] == jax.__version__


def test_roundtrip_parity_with_live_eval_step(bundle):
    trainer, state, out, _ = bundle
    servable = load_bundle(out)
    batch = rand_batch(trainer.spec.inputs, 4, seed=1)
    live = trainer.eval_step(trainer.variables(state), batch)
    frozen = servable.eval_step(servable.variables(), batch)
    np.testing.assert_allclose(np.asarray(frozen["probs"]),
                               np.asarray(live["probs"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(frozen["preds"]),
                                  np.asarray(live["preds"]))
    np.testing.assert_allclose(float(frozen["loss"]), float(live["loss"]),
                               rtol=1e-6)


def test_unexported_bucket_raises(bundle):
    trainer, _, out, _ = bundle
    servable = load_bundle(out)
    with pytest.raises(KeyError, match="no exported program"):
        servable.eval_step(servable.variables(),
                           rand_batch(trainer.spec.inputs, 3))


def test_format_version_guard(bundle, tmp_path):
    _, _, out, _ = bundle
    meta = json.loads((out / META_NAME).read_text())
    meta["format_version"] = 999
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / META_NAME).write_text(json.dumps(meta))
    (bad / PARAMS_NAME).write_bytes((out / PARAMS_NAME).read_bytes())
    for b in meta["buckets"]:
        name = f"forward_b{b}.jaxexp"
        (bad / name).write_bytes((out / name).read_bytes())
    with pytest.raises(ValueError, match="format"):
        load_bundle(bad)


def test_serving_engine_on_bundle(bundle):
    """The dynamic batcher serves a loaded bundle (trainer=None model
    source) with the same probabilities as the live checkpoint."""
    trainer, state, out, _ = bundle
    servable = load_bundle(out)
    imgs = rand_batch(trainer.spec.inputs, 6, seed=2)["rgb"]
    engine = ServingEngine(servable, None, image_size=SIZE,
                           buckets=servable.buckets, max_wait_ms=100.0)
    assert engine.buckets == (1, 4)
    engine.warmup()
    with engine:
        got = engine.predict([{"rgb": img} for img in imgs])
    live = trainer.eval_step(trainer.variables(state),
                             rand_batch(trainer.spec.inputs, 6, seed=2))
    np.testing.assert_allclose([p for p, _ in got],
                               np.asarray(live["probs"])[:6],
                               rtol=1e-5, atol=1e-6)


def test_export_cli_with_verify(tmp_path):
    """End-to-end: save a checkpoint, export via the CLI (--verify reloads
    and parity-checks the bundle), reload it."""
    from dfu_multimodal_tpu.cli import export_model

    trainer, state = tiny_trainer()
    ckpt = tmp_path / "ckpt"
    ckpt_mod.save_checkpoint(ckpt, epoch=1,
                             model_state=trainer.variables(state),
                             opt_state=state.opt_state, val_f1=0.5,
                             history={},
                             extra_meta={"model": "tiny_rgb"})
    from dfu_multimodal_tpu.eval import deployment as dep_mod
    dep_mod.save_deployment(ckpt, threshold=0.42, temperature=1.5)
    out = tmp_path / "bundle"
    meta = export_model.main([
        "--checkpoint", str(ckpt), "--out", str(out),
        "--image-size", str(SIZE), "--buckets", "1,2",
        "--compute-dtype", "float32", "--attention-impl", "xla",
        "--verify"])
    assert meta["buckets"] == [1, 2]
    assert meta["int8"] is False
    # the checkpoint's val-tuned deployment config rides into the bundle
    dep = dep_mod.load_deployment(out)
    assert dep["threshold"] == 0.42 and dep["temperature"] == 1.5
    servable = load_bundle(out)
    assert servable.spec.name == "tiny_rgb"
    assert servable.buckets == (1, 2)


class _TinyFusion(nn.Module):
    """Two-trunk concat fusion, small enough for a CPU unit test (the real
    multimodal model is 110M params; what's under test is the two-input
    batch contract surviving export, not the trunks)."""

    num_classes: int = 2
    drop_rate: float = 0.2
    dtype: object = None

    @nn.compact
    def __call__(self, rgb, thermal, *, train: bool = False, taps=None):
        def trunk(x, name):
            h = nn.Conv(8, (3, 3), strides=(2, 2), name=name)(
                x.astype(jnp.float32))
            return jnp.mean(nn.relu(h), axis=(1, 2))

        h = jnp.concatenate([trunk(rgb, "rgb_trunk"),
                             trunk(thermal, "thermal_trunk")], axis=-1)
        return nn.Dense(self.num_classes, name="head")(h)


def test_two_input_bundle_parity(tmp_path):
    """A two-modality batch dict (rgb + thermal + label + valid) survives
    export/replay with exact routing of each modality to its trunk."""
    from dfu_multimodal_tpu.models import zoo

    if "tiny_fusion_export" not in zoo.available():
        zoo.register(zoo.ModelSpec("tiny_fusion_export", _TinyFusion,
                                   ("rgb", "thermal"), 16))
    trainer, state = tiny_trainer("tiny_fusion_export")
    out = tmp_path / "mm"
    export_bundle(trainer, state, out, image_size=SIZE, buckets=(2,))
    servable = load_bundle(out)
    assert set(servable.spec.inputs) == {"rgb", "thermal"}
    batch = rand_batch(trainer.spec.inputs, 2, seed=3)
    live = trainer.eval_step(trainer.variables(state), batch)
    frozen = servable.eval_step(servable.variables(), batch)
    np.testing.assert_allclose(np.asarray(frozen["probs"]),
                               np.asarray(live["probs"]),
                               rtol=1e-6, atol=1e-7)


def test_export_distilled_student_bundle(tmp_path):
    """Distilled ResNet-18 students export and replay like any checkpoint
    (the edge-deployment path: distill -> export -> serve --exported)."""
    trainer, state = tiny_trainer("resnet18_rgb")
    out = tmp_path / "resnet18_rgb"
    meta = export_bundle(trainer, state, out, image_size=SIZE, buckets=(2,))
    assert meta["model"] == "resnet18_rgb"
    servable = load_bundle(out)
    batch = rand_batch(("rgb",), 2, seed=3)
    engine = ServingEngine(servable, None, image_size=SIZE,
                           buckets=servable.buckets, max_wait_ms=100.0)
    with engine:
        got = engine.predict([{"rgb": img} for img in batch["rgb"]])
    live = trainer.eval_step(trainer.variables(state), batch)
    np.testing.assert_allclose([p for p, _ in got],
                               np.asarray(live["probs"]), rtol=1e-5,
                               atol=1e-6)


def test_export_cli_token_merge(tmp_path):
    """A token-merge ViT bundle exports and replays: the checkpoint's
    single-scan encoder params split at load (split_encoder_variables via
    serve.restore_trainer), the frozen program runs the two-scan merged
    forward, and --verify parity-checks it against the live merged step."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.cli import export_model
    from dfu_multimodal_tpu.train.engine import Trainer

    cfg = config.TrainConfig(batch_size=2, eval_batch_size=2,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1, model=1))
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    ckpt = tmp_path / "ckpt"
    ckpt_mod.save_checkpoint(ckpt, epoch=1,
                             model_state=trainer.variables(state),
                             opt_state=state.opt_state, val_f1=0.5,
                             history={},
                             extra_meta={"model": "thermal_only"})
    out = tmp_path / "bundle"
    meta = export_model.main([
        "--checkpoint", str(ckpt), "--out", str(out),
        "--image-size", str(SIZE), "--buckets", "1,2",
        "--compute-dtype", "float32", "--attention-impl", "xla",
        "--token-merge", "2:3", "--verify"])
    assert meta["token_merge"] == "2:3"
    servable = load_bundle(out)
    assert servable.spec.name == "thermal_only"
