"""Serving subsystem: dynamic batcher parity/coalescing + the HTTP front
end, on the CPU mesh with a single-device trainer (the serving topology —
one chip, one batcher thread — is single-device by construction)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data.loader import ArrayDataset
from dfu_multimodal_tpu.serve.engine import (ModelRouter, ServingEngine,
                                             quantize_for_serving)
from dfu_multimodal_tpu.serve.http import decode_image_bytes, make_server
from dfu_multimodal_tpu.train.engine import Trainer

SIZE = 32


def make_serving_trainer():
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    return trainer, state


@pytest.fixture(scope="module")
def served():
    trainer, state = make_serving_trainer()
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           max_wait_ms=100.0)
    engine.warmup()
    with engine:
        yield trainer, state, engine


def rand_images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, SIZE, SIZE, 3), dtype=np.uint8)


def test_submit_validates_sample_shape(served):
    """One malformed direct-API sample must raise to ITS caller at
    submit(), never reach the batcher and fail a coalesced batch."""
    _, _, engine = served
    with pytest.raises(ValueError, match="uint8"):
        engine.submit({"rgb": np.zeros((SIZE, SIZE, 3), np.float32)})
    with pytest.raises(ValueError, match="must be"):
        engine.submit({"rgb": np.zeros((SIZE + 1, SIZE, 3), np.uint8)})
    with pytest.raises(ValueError, match="unknown modality"):
        engine.submit({"depth": np.zeros((SIZE, SIZE, 3), np.uint8)})
    # valid requests continue to work after the rejects
    (prob, pred), = engine.predict([{"rgb": rand_images(1)[0]}])
    assert 0.0 <= prob <= 1.0


def test_router_rejects_ambiguous_modalities(served):
    """Two engines with identical input sets: implicit routing must
    refuse (which model answered could otherwise flip per restart)."""
    trainer, state, engine = served
    other = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    router = ModelRouter({"rgb_a": engine, "rgb_b": other})
    with pytest.raises(KeyError, match="ambiguous"):
        router.select(["rgb"])
    # explicit selection still works
    assert router.select(["rgb"], explicit="rgb_b") is other


def test_engine_matches_eval_epoch(served):
    """Row-for-row parity with the offline eval path: the batcher pads to
    buckets and masks with valid=0, which must not change any real row's
    probability."""
    trainer, state, engine = served
    imgs = rand_images(12)
    _, out = trainer.run_eval_epoch(
        state, ArrayDataset(arrays={"rgb": imgs},
                            labels=np.zeros(12, np.int32)))
    got = engine.predict([{"rgb": img} for img in imgs])
    np.testing.assert_allclose([p for p, _ in got], out["y_probs"],
                               rtol=1e-5, atol=1e-6)
    assert [p for _, p in got] == list(out["y_pred"])


def test_batcher_coalesces_concurrent_requests(served):
    """8 requests submitted inside one batching window must not run as 8
    singleton batches (the whole point of the dynamic batcher)."""
    _, _, engine = served
    before = sum(engine.stats()["batch_size_hist"].values())
    futs = [engine.submit({"rgb": img}) for img in rand_images(8, seed=1)]
    for f in futs:
        prob, pred = f.result(timeout=30)
        assert 0.0 <= prob <= 1.0 and pred in (0, 1)
    stats = engine.stats()
    n_batches = sum(stats["batch_size_hist"].values()) - before
    assert n_batches < 8, f"no coalescing: {stats['batch_size_hist']}"
    assert max(int(k) for k in stats["batch_size_hist"]) > 1
    assert stats["latency_ms"]["p50"] > 0


def test_bucket_ladder_and_padding(served):
    """Buckets are powers of two padded to the mesh multiple; any request
    count maps to the smallest covering bucket."""
    _, _, engine = served
    assert engine.buckets == (1, 2, 4, 8)
    assert engine._bucket(3) == 4
    assert engine._bucket(8) == 8
    assert engine._bucket(9) == 8        # clamped to max_batch


def test_pipelined_batcher_matches_sequential(served):
    """pipeline_depth=2 (dispatch N+1 before fetching N) must return the
    same row results as the default sequential batcher."""
    trainer, state, engine = served
    imgs = rand_images(24, seed=4)
    want = engine.predict([{"rgb": img} for img in imgs])
    pipelined = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                              max_wait_ms=5.0, pipeline_depth=2)
    with pipelined:
        got = pipelined.predict([{"rgb": img} for img in imgs])
    assert pipelined.stats()["errors"] == 0
    np.testing.assert_allclose([p for p, _ in got], [p for p, _ in want],
                               rtol=1e-6, atol=1e-7)


def test_quantize_for_serving_requires_calibration():
    # rgb_only (a production trunk): non-production models are rejected
    # before the calibration check (tests/test_distill.py)
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("rgb_only", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    with pytest.raises(ValueError, match="calib"):
        quantize_for_serving(trainer, state, image_size=SIZE)


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_bytes_matches_loader_contract():
    img = rand_images(1, seed=2)[0]
    out = decode_image_bytes(_encode_png(img), SIZE)
    np.testing.assert_array_equal(out, img)      # PNG is lossless
    # resize path: a 2x image comes back at the serving size
    big = np.kron(img, np.ones((2, 2, 1))).astype(np.uint8)
    assert decode_image_bytes(_encode_png(big), SIZE).shape == (SIZE, SIZE, 3)


@pytest.fixture(scope="module")
def http_url(served):
    _, _, engine = served
    server = make_server(engine, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_http_predict_binary_and_json(served, http_url):
    trainer, state, engine = served
    img = rand_images(1, seed=3)[0]
    png = _encode_png(img)

    out_bin = _post(f"{http_url}/v1/predict", png, "image/png")
    assert out_bin["prediction"] in ("ulcer", "healthy")
    assert out_bin["model"] == "tiny_rgb"

    payload = json.dumps(
        {"image": base64.b64encode(png).decode()}).encode()
    out_json = _post(f"{http_url}/v1/predict", payload, "application/json")
    assert out_json["prob_ulcer"] == pytest.approx(out_bin["prob_ulcer"],
                                                   abs=1e-6)

    # parity with the engine's direct path
    (prob, _), = engine.predict([{"rgb": img}])
    assert out_bin["prob_ulcer"] == pytest.approx(prob, abs=1e-5)


def test_http_health_metrics_and_errors(http_url):
    with urllib.request.urlopen(f"{http_url}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health == {"status": "ok", "model": "tiny_rgb",
                      "inputs": ["rgb"],
                      "models": {"tiny_rgb": ["rgb"]}}

    with urllib.request.urlopen(f"{http_url}/metrics", timeout=30) as r:
        metrics = json.loads(r.read())
    assert metrics["requests"] > 0 and metrics["errors"] == 0

    for data, ctype in ((b"", "image/png"),
                        (b"not an image", "text/plain"),
                        (json.dumps({"rgb": "!!!"}).encode(),
                         "application/json"),
                        (json.dumps({"other": "x"}).encode(),
                         "application/json")):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{http_url}/v1/predict", data, ctype)
        assert err.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{http_url}/nope", b"{}", "application/json")
    assert err.value.code == 404


def test_http_body_size_cap(http_url):
    """Oversized uploads are rejected up front (header check), not read."""
    req = urllib.request.Request(
        f"{http_url}/v1/predict", data=b"x",
        headers={"Content-Type": "image/png",
                 "Content-Length": str(64 * 1024 * 1024)})
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


@pytest.fixture(scope="module")
def routed_url(served):
    """Two single-modality engines behind a ModelRouter."""
    trainer_rgb, state_rgb, _ = served
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer_th = Trainer("tiny_thermal", cfg,
                         {"thermal": config.thermal_modality()})
    state_th = trainer_th.init_state(jax.random.PRNGKey(1), image_size=SIZE)
    router = ModelRouter({
        "tiny_rgb": ServingEngine(trainer_rgb, state_rgb, image_size=SIZE,
                                  max_batch=8, max_wait_ms=20.0),
        "tiny_thermal": ServingEngine(trainer_th, state_th, image_size=SIZE,
                                      max_batch=8, max_wait_ms=20.0)})
    router.warmup()
    server = make_server(router, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    with router:
        thread.start()
        yield f"http://127.0.0.1:{server.server_address[1]}"
        server.shutdown()
        server.server_close()


def test_router_selects_by_modality(routed_url):
    img = rand_images(1, seed=5)[0]
    png = _encode_png(img)
    b64 = base64.b64encode(png).decode()

    out = _post(f"{routed_url}/v1/predict", png, "image/png")
    assert out["model"] == "tiny_rgb"          # binary body -> rgb

    out = _post(f"{routed_url}/v1/predict",
                json.dumps({"thermal": b64}).encode(), "application/json")
    assert out["model"] == "tiny_thermal"

    out = _post(f"{routed_url}/v1/predict",
                json.dumps({"rgb": b64}).encode(), "application/json")
    assert out["model"] == "tiny_rgb"


def test_router_explicit_model_path(routed_url):
    img = rand_images(1, seed=6)[0]
    b64 = base64.b64encode(_encode_png(img)).decode()
    out = _post(f"{routed_url}/v1/predict/tiny_thermal",
                json.dumps({"thermal": b64}).encode(), "application/json")
    assert out["model"] == "tiny_thermal"

    # explicit model that lacks the provided modality -> 400
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{routed_url}/v1/predict/tiny_thermal",
              json.dumps({"rgb": b64}).encode(), "application/json")
    assert err.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{routed_url}/v1/predict/nope",
              json.dumps({"rgb": b64}).encode(), "application/json")
    assert err.value.code == 404


def test_router_health_and_metrics(routed_url):
    with urllib.request.urlopen(f"{routed_url}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["models"] == {"tiny_rgb": ["rgb"],
                                "tiny_thermal": ["thermal"]}
    assert "model" not in health               # multi-model shape

    with urllib.request.urlopen(f"{routed_url}/metrics", timeout=30) as r:
        metrics = json.loads(r.read())
    assert set(metrics["models"]) == {"tiny_rgb", "tiny_thermal"}
    assert metrics["requests"] >= 4 and metrics["errors"] == 0


def test_serving_engine_on_8dev_mesh(served):
    """Serving over a DP mesh: the engine pads buckets to the data-axis
    multiple and device_puts with the batch sharding, so the same code
    serves a multi-chip mesh; rows must match the single-device engine."""
    _, _, single = served
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=-1))  # all 8
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    assert trainer.mesh.shape["data"] == 8
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=16,
                           max_wait_ms=50.0)
    assert engine.buckets == (8, 16)     # pow2 ladder padded to the mesh
    with engine:
        imgs = rand_images(12, seed=7)
        got = engine.predict([{"rgb": img} for img in imgs])
    want = single.predict([{"rgb": img} for img in imgs])
    np.testing.assert_allclose([p for p, _ in got], [p for p, _ in want],
                               rtol=1e-5, atol=1e-6)


def test_engine_threshold_operating_point():
    """threshold=t must flip predictions to P(ulcer) >= t while leaving
    probabilities untouched (eval/threshold.py semantics)."""
    trainer, state = make_serving_trainer()
    imgs = rand_images(10, seed=3)
    with ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                       max_wait_ms=100.0) as default_engine:
        base = default_engine.predict([{"rgb": img} for img in imgs])
    probs = np.array([p for p, _ in base])
    t = float(np.median(probs))            # guarantees both classes
    with ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                       max_wait_ms=100.0, threshold=t) as engine:
        got = engine.predict([{"rgb": img} for img in imgs])
    np.testing.assert_allclose([p for p, _ in got], probs, atol=1e-6)
    np.testing.assert_array_equal([pr for _, pr in got],
                                  (probs >= t).astype(int))


def test_engine_temperature_scales_probs(served):
    """A temperature-configured engine responds sigmoid(logit(p)/T) while
    argmax predictions stay identical (T preserves rankings and the 0.5
    fixed point)."""
    from dfu_multimodal_tpu.eval.calibration import apply_temperature
    trainer, state, base_engine = served
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           max_wait_ms=100.0, temperature=2.5)
    with engine:
        imgs = rand_images(6, seed=5)
        reqs = [{"rgb": img} for img in imgs]
        base = base_engine.predict(reqs)
        scaled = engine.predict(reqs)
    np.testing.assert_allclose(
        [p for p, _ in scaled],
        apply_temperature(np.array([p for p, _ in base]), 2.5),
        rtol=1e-6, atol=1e-7)
    assert [c for _, c in scaled] == [c for _, c in base]
    with pytest.raises(ValueError, match="temperature"):
        ServingEngine(trainer, state, image_size=SIZE, temperature=0.0)


def test_healthz_reports_deployment_tuning(served):
    """/healthz exposes per-model applied threshold/temperature when set
    (absent otherwise — the untuned schema is unchanged)."""
    import json
    import urllib.request
    trainer, state, _ = served
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           max_wait_ms=50.0, threshold=0.3, temperature=2.0)
    from dfu_multimodal_tpu.serve.engine import ModelRouter
    from dfu_multimodal_tpu.serve.http import make_server
    router = ModelRouter({"tiny_rgb": engine})
    with engine:
        server = make_server(router, host="127.0.0.1", port=0)
        import threading
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{server.server_address[1]}"
            with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
                health = json.loads(r.read())
        finally:
            server.shutdown()
    assert health["deployment"]["tiny_rgb"] == {"threshold": 0.3,
                                                "temperature": 2.0}


def test_engine_backpressure_bounded_queue(served):
    """max_queue bounds admission: overflow raises EngineOverloaded
    (mapped to HTTP 503), counted in stats as 'rejected'."""
    from dfu_multimodal_tpu.serve.engine import EngineOverloaded
    trainer, state, _ = served
    engine = ServingEngine(trainer, state, image_size=SIZE, max_queue=1)
    img = rand_images(1)[0]
    fut = engine.submit({"rgb": img})            # fills the queue
    with pytest.raises(EngineOverloaded, match="queue full"):
        engine.submit({"rgb": img})
    assert engine.stats()["rejected"] == 1
    engine.stop()                                # fails the straggler
    assert fut.exception() is not None


def test_binary_body_routes_to_explicit_models_modality(routed_url):
    """POST /v1/predict/tiny_thermal with a raw image body must map the
    image to THAT model's primary modality (was hardcoded 'rgb', making
    thermal models unreachable via binary upload in multi-model
    serving)."""
    png = _encode_png(rand_images(1, seed=7)[0])
    out = _post(f"{routed_url}/v1/predict/tiny_thermal", png, "image/png")
    assert out["model"] == "tiny_thermal"
    out = _post(f"{routed_url}/v1/predict/tiny_rgb", png, "image/png")
    assert out["model"] == "tiny_rgb"


def test_malformed_content_length_gets_json_400(routed_url):
    import http.client
    host, port = routed_url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    conn.putrequest("POST", "/v1/predict")
    conn.putheader("Content-Type", "image/png")
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"Content-Length" in resp.read()
    conn.close()


def test_submit_rejects_empty_sample(served):
    trainer, state, _ = served
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    with pytest.raises(ValueError, match="at least one modality"):
        engine.submit({})


def test_http_path_with_query_string(served, http_url):
    """Load balancers/clients append query params (trace ids, cache
    busters); routing must be on the path alone, not exact-match 404."""
    img = rand_images(1, seed=9)[0]
    png = _encode_png(img)
    out = _post(f"{http_url}/v1/predict?trace_id=abc", png, "image/png")
    assert out["prediction"] in ("ulcer", "healthy")
    with urllib.request.urlopen(f"{http_url}/healthz?probe=1",
                                timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_http_unknown_json_field_is_400_not_reroute(http_url):
    """A typo'd modality key ("termal") must 400 naming the field —
    silently dropping it would reroute the request to a different
    (single-modality) model and return a wrong-model 200."""
    png = _encode_png(rand_images(1, seed=10)[0])
    payload = json.dumps({
        "rgb": base64.b64encode(png).decode(),
        "termal": base64.b64encode(png).decode()}).encode()
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{http_url}/v1/predict", payload, "application/json")
    assert err.value.code == 400
    assert "termal" in json.loads(err.value.read())["error"]


def test_submit_after_stop_raises_not_hangs():
    """submit() on a stopped engine must raise immediately — enqueueing
    into a queue no batcher drains would park predict() forever (the
    future has no timeout on the direct API)."""
    trainer, state = make_serving_trainer()
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=4,
                           max_wait_ms=20.0)
    with engine:
        (p1, _), = engine.predict([{"rgb": rand_images(1)[0]}])
    with pytest.raises(RuntimeError, match="stopped"):
        engine.submit({"rgb": rand_images(1)[0]})
    # start() re-opens the engine
    with engine:
        (p2, _), = engine.predict([{"rgb": rand_images(1)[0]}])
    assert p2 == pytest.approx(p1, abs=1e-6)


def test_warmup_failfast_on_broken_program():
    """A serving program that cannot execute must fail STARTUP in
    warmup(), not come up 'healthy' and 500 every live request."""
    trainer, state = make_serving_trainer()
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=4)

    def boom(variables, batch):
        raise RuntimeError("bucket program exploded")

    engine._eval_step = boom
    with pytest.raises(RuntimeError, match="exploded"):
        engine.warmup()
