"""Legacy lineage variants, random pairing, resume, throughput meter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.data.pairing import random_pairs
from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.utils.logging import ThroughputMeter


def test_random_pairs_label_matched():
    pairs = random_pairs([10, 4], [6, 8], seed=0)
    healthy = [p for p in pairs if p.label == 0]
    ulcer = [p for p in pairs if p.label == 1]
    assert len(healthy) == 6 and len(ulcer) == 4    # min per class
    assert all(0 <= p.rgb < 10 and 0 <= p.thermal < 6 for p in healthy)
    assert random_pairs([5, 5], [5, 5], seed=3) == \
        random_pairs([5, 5], [5, 5], seed=3)


@pytest.mark.parametrize("name", ["legacy_gated_fusion",
                                  "legacy_rgb_resnet_fusion"])
def test_legacy_fusion_models_forward(name):
    module, spec = zoo.build(name, drop_rate=0.3)
    assert spec.inputs == ("rgb", "thermal")
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               image_size=32)
    batch = {k: jnp.ones((2, 32, 32, 3)) for k in spec.inputs}
    out = zoo.apply_model(module, spec, variables, batch, train=False)
    assert out.shape == (2, 2)


def test_legacy_smoke_cli(tmp_path):
    from dfu_multimodal_tpu.cli.train_legacy import main
    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=6, size=32)
    res = main(["--variant", "smoke", "--data-dir", str(data),
                "--checkpoint-root", str(tmp_path / "logs"),
                "--model", "tiny_rgb", "--image-size", "32",
                "--batch-size", "4", "--compute-dtype", "float32",
                "--skip-test-eval"])
    assert "best_val_f1" in res


def test_resume_continues_training(tmp_path):
    import dataclasses
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data import load_single_modality
    from dfu_multimodal_tpu.train.engine import Trainer
    from dfu_multimodal_tpu.utils.checkpoint import load_meta

    data = tmp_path / "data"
    make_synthetic_dataset(data, images_per_class=10, size=32)
    train = load_single_modality(data / "rgb", "train", image_size=32)
    val = load_single_modality(data / "rgb", "val", image_size=32)
    ckpt = tmp_path / "ckpt"

    cfg = config.TrainConfig(batch_size=8, num_epochs=2, learning_rate=3e-3,
                             save_best_after_epoch=1,
                             compute_dtype="float32", seed=0)
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    _, hist1, best1 = trainer.fit(train, val, checkpoint_dir=ckpt,
                                  image_size=32, log=lambda s: None)
    assert len(hist1["train_loss"]) == 2
    meta1 = load_meta(ckpt)

    # resume with a larger budget: history extends past the saved epochs
    trainer2 = Trainer("tiny_rgb", dataclasses.replace(cfg, num_epochs=4),
                       {"rgb": config.rgb_modality()})
    logs = []
    _, hist2, best2 = trainer2.fit(train, val, checkpoint_dir=ckpt,
                                   image_size=32, resume_from=ckpt,
                                   log=logs.append)
    assert any("Resumed" in line for line in logs)
    saved_epochs = meta1["epoch"]
    # epochs before the resume point come from the saved history
    assert hist2["train_loss"][:saved_epochs] == \
        meta1["history"]["train_loss"][:saved_epochs]
    assert len(hist2["train_loss"]) == 4
    assert best2 >= best1


def test_throughput_meter():
    import time
    m = ThroughputMeter(n_chips=4)
    m.update(32)
    m.update(32)
    m.start_time = time.perf_counter() - 2.0     # pretend 2s elapsed
    assert m.images == 64 and m.steps == 2
    assert m.images_per_sec == pytest.approx(32.0, rel=0.01)
    assert m.images_per_sec_per_chip == pytest.approx(8.0, rel=0.01)
    assert "img/s" in m.summary()
