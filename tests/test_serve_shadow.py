"""Shadow deployment (serve/shadow.py): candidate scoring on live
traffic, agreement ledger, modality-subset shadows, router attachment,
and the HTTP integration — tiny models on single-device CPU."""

import io
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.serve.engine import ModelRouter, ServingEngine
from dfu_multimodal_tpu.serve.http import make_server
from dfu_multimodal_tpu.serve.shadow import ShadowTracker, attach_shadow
from dfu_multimodal_tpu.train.engine import Trainer

SIZE = 32


def _make(model, modalities):
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer(model, cfg, modalities)
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    return trainer, state


def rand_images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, SIZE, SIZE, 3), dtype=np.uint8)


def _wait_compared(tracker, n, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        s = tracker.stats()
        if s["compared"] + s["errors"] + s["skipped_no_input"] >= n:
            return s
        time.sleep(0.02)
    raise AssertionError(f"shadow never caught up: {tracker.stats()}")


def test_identical_shadow_agrees_fully():
    """Same weights, same tuning -> every live decision agrees and the
    probability delta is ~0."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    shadow_eng = ServingEngine(trainer, state, image_size=SIZE,
                               max_batch=8)
    tracker = ShadowTracker(shadow_eng, "tiny_rgb")
    with primary, shadow_eng:
        imgs = rand_images(6, seed=1)
        for img in imgs:
            (prob, pred), = primary.predict([{"rgb": img}])
            tracker.observe({"rgb": img}, prob, pred)
        s = _wait_compared(tracker, len(imgs))
    assert s["compared"] == 6 and s["errors"] == 0
    assert s["agreement"] == 1.0 and s["decision_flips"] == 0
    assert s["mean_abs_prob_delta"] < 1e-5


def test_disagreeing_shadow_counts_flips_by_direction():
    """Primary thresholded to always-healthy, shadow to always-ulcer:
    every comparison is a healthy->ulcer flip (the McNemar discordant
    cell dfu compare tests offline)."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                            threshold=2.0)       # prob >= 2 never
    shadow_eng = ServingEngine(trainer, state, image_size=SIZE,
                               max_batch=8, threshold=0.0)  # always ulcer
    tracker = ShadowTracker(shadow_eng, "tiny_rgb")
    primary.shadow = tracker
    with primary, shadow_eng:
        for img in rand_images(4, seed=2):
            (prob, pred), = primary.predict([{"rgb": img}])
            assert pred == 0
            tracker.observe({"rgb": img}, prob, pred)
        s = _wait_compared(tracker, 4)
    assert s["compared"] == 4
    assert s["agreement"] == 0.0 and s["decision_flips"] == 4
    assert s["flips_healthy_to_ulcer"] == 4
    assert s["flips_ulcer_to_healthy"] == 0
    # the primary's stats() surfaces the ledger
    assert primary.stats()["shadow"]["decision_flips"] == 4


def test_subset_input_shadow_filters_and_skips():
    """An rgb-only candidate shadowing the fusion primary: fusion
    requests compare on the rgb branch; thermal-only requests are
    skipped, never erred."""
    ftrainer, fstate = _make("tiny_fusion",
                             {"rgb": config.rgb_modality(),
                              "thermal": config.thermal_modality()})
    rtrainer, rstate = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(ftrainer, fstate, image_size=SIZE, max_batch=8)
    shadow_eng = ServingEngine(rtrainer, rstate, image_size=SIZE,
                               max_batch=8)
    tracker = ShadowTracker(shadow_eng, "tiny_fusion")
    rgb, thermal = rand_images(2, seed=3)
    with primary, shadow_eng:
        (prob, pred), = primary.predict([{"rgb": rgb, "thermal": thermal}])
        tracker.observe({"rgb": rgb, "thermal": thermal}, prob, pred)
        (prob2, pred2), = primary.predict([{"thermal": thermal}])
        tracker.observe({"thermal": thermal}, prob2, pred2)
        s = _wait_compared(tracker, 2)
    assert s["compared"] == 1
    assert s["skipped_no_input"] == 1
    assert s["errors"] == 0


def test_attach_shadow_routes_and_rejects_double():
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    router = ModelRouter({"tiny_rgb": primary})
    cand = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    tracker = attach_shadow(router, cand)
    assert tracker.primary_name == "tiny_rgb"
    assert primary.shadow is tracker
    with pytest.raises(KeyError, match="already has shadow"):
        attach_shadow(router, cand)


def test_attach_shadow_rejects_disjoint_inputs():
    """A thermal-only shadow on an rgb-only primary would skip 100% of
    traffic (compared=0, silently): attach must fail at startup."""
    rtrainer, rstate = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    ttrainer, tstate = _make("tiny_thermal",
                             {"thermal": config.thermal_modality()})
    primary = ServingEngine(rtrainer, rstate, image_size=SIZE, max_batch=8)
    router = ModelRouter({"tiny_rgb": primary})
    cand = ServingEngine(ttrainer, tstate, image_size=SIZE, max_batch=8)
    with pytest.raises(KeyError, match="no shared modality"):
        attach_shadow(router, cand)
    assert getattr(primary, "shadow", None) is None


def test_overloaded_shadow_counts_drops_not_errors():
    """A bounded shadow queue overflowing under live traffic is
    sampling, not failure: overflow lands in dropped_overloaded and the
    requests that did fit still compare."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    shadow_eng = ServingEngine(trainer, state, image_size=SIZE,
                               max_batch=8, max_queue=1)
    tracker = ShadowTracker(shadow_eng, "tiny_rgb")
    imgs = rand_images(3, seed=5)
    # engine not started yet: the first observe occupies the queue slot,
    # the rest overflow deterministically
    for img in imgs:
        tracker.observe({"rgb": img}, 0.5, 1)
    s = tracker.stats()
    assert s["dropped_overloaded"] == 2 and s["errors"] == 0
    with shadow_eng:
        s = _wait_compared(tracker, 1)
    assert s["compared"] == 1 and s["errors"] == 0
    assert s["dropped_overloaded"] == 2


def test_http_predict_feeds_shadow_and_metrics_report():
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    router = ModelRouter({"tiny_rgb": primary})
    cand = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    tracker = attach_shadow(router, cand)
    server = make_server(router, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rand_images(1, seed=4)[0]).save(buf, format="PNG")
    try:
        with primary, cand:
            req = urllib.request.Request(
                f"{url}/v1/predict", data=buf.getvalue(),
                headers={"Content-Type": "image/png"})
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read())["model"] == "tiny_rgb"
            _wait_compared(tracker, 1)
            with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
                metrics = json.loads(r.read())
            assert metrics["shadow"]["model"] == "tiny_rgb"
            assert metrics["shadow"]["compared"] == 1
            assert metrics["shadow"]["agreement"] == 1.0
            with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["shadows"] == {"tiny_rgb": "tiny_rgb"}
    finally:
        server.shutdown()
        server.server_close()


def test_attach_shadow_rejects_image_size_mismatch():
    """A size-mismatched shadow would reject 100% of the primary's
    samples as validation errors (compared=0 silently): fail at
    startup."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    primary = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    router = ModelRouter({"tiny_rgb": primary})
    cand = ServingEngine(trainer, state, image_size=SIZE * 2, max_batch=8)
    with pytest.raises(KeyError, match="px"):
        attach_shadow(router, cand)
