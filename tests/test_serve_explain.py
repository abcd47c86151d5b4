"""Serving-time Grad-CAM (/v1/explain): engine path, HTTP surface, and
parity with the offline gradcam module's semantics — on tiny models
(tapped tiny_rgb -> true Grad-CAM; untapped tiny_fusion -> input
saliency), single-device CPU like the other serving tests."""

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
from dfu_multimodal_tpu.serve.engine import (ExplainUnavailable,
                                             ServingEngine)
from dfu_multimodal_tpu.serve.explain import Explainer
from dfu_multimodal_tpu.serve.http import make_server
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


@pytest.fixture(scope="module")
def explained_rgb():
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           max_wait_ms=50.0,
                           explainer=Explainer(trainer, state))
    engine.warmup()
    with engine:
        yield engine


def test_explain_rgb_gradcam(explained_rgb):
    """Tapped model: true Grad-CAM at the tap's spatial resolution, in
    [0,1]; probability equals the predict path's (same variables, same
    fp32 normalize)."""
    engine = explained_rgb
    img = rand_images(1, seed=1)[0]
    out = engine.submit_explain({"rgb": img}).result(timeout=60)
    assert set(out) == {"prob_ulcer", "prediction", "class_explained",
                        "cams"}
    assert 0.0 <= out["prob_ulcer"] <= 1.0
    assert out["prediction"] in (0, 1)
    # no threshold configured: the served decision IS argmax, and that
    # is the class the CAM explained
    assert out["class_explained"] == out["prediction"]
    cam_out = out["cams"]["rgb"]
    assert cam_out["method"] == "gradcam"
    cam = cam_out["cam"]
    # TinyCNN 'features' tap: two stride-2 convs -> SIZE/4 x SIZE/4
    assert cam.shape == (SIZE // 4, SIZE // 4)
    assert cam.dtype == np.float32
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0

    (prob, pred), = engine.predict([{"rgb": img}])
    assert out["prob_ulcer"] == pytest.approx(prob, abs=1e-5)
    assert out["prediction"] == pred


def test_explain_validates_and_requires_explainer():
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    bare = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    with pytest.raises(ExplainUnavailable, match="--explain"):
        bare.submit_explain({"rgb": rand_images(1)[0]})
    eng = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                        explainer=Explainer(trainer, state))
    with pytest.raises(ValueError, match="unknown modality"):
        eng.submit_explain({"depth": rand_images(1)[0]})
    with pytest.raises(ValueError, match="uint8"):
        eng.submit_explain(
            {"rgb": np.zeros((SIZE, SIZE, 3), np.float32)})


def test_explain_applies_deployment_tuning():
    """The explained decision is the SERVED decision: threshold and
    temperature apply to the explain response exactly as to predict."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           threshold=0.0, temperature=2.0,
                           explainer=Explainer(trainer, state))
    img = rand_images(1, seed=2)[0]
    with engine:
        out = engine.submit_explain({"rgb": img}).result(timeout=60)
        (prob, pred), = engine.predict([{"rgb": img}])
    assert out["prediction"] == 1 == pred      # threshold 0 -> always ulcer
    assert out["prob_ulcer"] == pytest.approx(prob, abs=1e-5)
    # the CAM explains the THRESHOLDED decision even when the raw-logit
    # argmax disagrees (the borderline case explanations exist for)
    assert out["class_explained"] == 1


def test_explain_borderline_cam_matches_served_class():
    """With a threshold that flips the decision away from argmax, the
    returned CAM must equal the fixed-class CAM for the served class,
    not the argmax CAM."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    img = rand_images(1, seed=6)[0]
    ex = Explainer(trainer, state)
    base = ex.explain_one({"rgb": img})
    argmax = int(np.argmax(base["probs"]))
    flipped = 1 - argmax
    # force the served decision to the non-argmax class
    thr = 0.0 if flipped == 1 else 2.0
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           threshold=thr,
                           explainer=Explainer(trainer, state))
    with engine:
        out = engine.submit_explain({"rgb": img}).result(timeout=60)
    assert out["prediction"] == flipped
    assert out["class_explained"] == flipped
    want = ex.explain_one({"rgb": img}, class_override=flipped)
    np.testing.assert_allclose(out["cams"]["rgb"]["cam"],
                               want["cams"]["rgb"]["cam"], atol=1e-5)


def test_explain_fusion_saliency_provided_modalities_only():
    """Untapped fusion model: input-saliency fallback, full-resolution
    cams, and ONLY for the modalities the request actually provided (a
    black fill-in must not get an 'evidence' heatmap)."""
    trainer, state = _make("tiny_fusion",
                           {"rgb": config.rgb_modality(),
                            "thermal": config.thermal_modality()})
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           explainer=Explainer(trainer, state))
    rgb, thermal = rand_images(2, seed=3)
    with engine:
        both = engine.submit_explain(
            {"rgb": rgb, "thermal": thermal}).result(timeout=60)
        rgb_only = engine.submit_explain({"rgb": rgb}).result(timeout=60)
    assert set(both["cams"]) == {"rgb", "thermal"}
    assert set(rgb_only["cams"]) == {"rgb"}
    for m, cam_out in both["cams"].items():
        assert cam_out["method"] == "saliency"
        assert cam_out["cam"].shape == (SIZE, SIZE)


def test_explain_class_index_zero_matches_offline_cli_quirk():
    """class_index=0 reproduces the offline CLI's reference-parity CAM
    (class-0 logit); it must differ from the 'pred' CAM when the
    prediction is class 1 somewhere, but probs are identical."""
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    ex_pred = Explainer(trainer, state, class_index="pred")
    ex_zero = Explainer(trainer, state, class_index=0)
    img = rand_images(1, seed=4)[0]
    out_p = ex_pred.explain_one({"rgb": img})
    out_0 = ex_zero.explain_one({"rgb": img})
    np.testing.assert_allclose(out_p["probs"], out_0["probs"], atol=1e-6)
    # offline-module parity: Explainer(class 0) == compute_cam_batch
    from dfu_multimodal_tpu.data.transforms import eval_normalize
    from dfu_multimodal_tpu.eval import gradcam
    import jax.numpy as jnp
    x = eval_normalize(jnp.asarray(img[None]),
                       trainer.modalities["rgb"], jnp.float32)
    ref = gradcam.compute_cam_batch(trainer.module,
                                    trainer.variables(state), (x,),
                                    "features", class_index=0)[0]
    np.testing.assert_allclose(out_0["cams"]["rgb"]["cam"], ref["cam"],
                               atol=1e-5)


@pytest.fixture(scope="module")
def explain_url(explained_rgb):
    server = make_server(explained_rgb, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def _encode_png(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_http_explain(explained_rgb, explain_url):
    from PIL import Image
    img = rand_images(1, seed=5)[0]
    out = _post(f"{explain_url}/v1/explain", _encode_png(img), "image/png")
    assert out["prediction"] in ("ulcer", "healthy")
    assert out["model"] == "tiny_rgb"
    pred_int = 1 if out["prediction"] == "ulcer" else 0
    assert out["class_explained"] == pred_int
    exp = out["explanations"]["rgb"]
    assert exp["method"] == "gradcam"
    overlay = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(exp["overlay_png"]))))
    assert overlay.shape == (SIZE, SIZE, 3)     # resized onto the input
    heat = np.asarray(Image.open(io.BytesIO(
        base64.b64decode(exp["cam_png"]))))
    assert heat.shape == (SIZE // 4, SIZE // 4, 3)

    # healthz advertises the explain-enabled model; metrics count it
    with urllib.request.urlopen(f"{explain_url}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["explain"] == ["tiny_rgb"]
    with urllib.request.urlopen(f"{explain_url}/metrics", timeout=30) as r:
        metrics = json.loads(r.read())
    assert metrics["explains"] >= 1
    assert metrics["explain_enabled"] is True


def test_http_explain_501_without_explainer():
    trainer, state = _make("tiny_rgb", {"rgb": config.rgb_modality()})
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8)
    server = make_server(engine, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with engine:
            with pytest.raises(urllib.error.HTTPError) as err:
                _post(f"{url}/v1/explain",
                      _encode_png(rand_images(1)[0]), "image/png")
            assert err.value.code == 501
    finally:
        server.shutdown()
        server.server_close()


def test_explainer_cam_method_rollout_and_chefer():
    """--cam-method wires through the serving Explainer: the ViT branch
    gets transformer attribution (patch-grid CAM, method label), models
    without a ViT branch reject non-saliency methods at startup."""
    trainer, state = _make("thermal_only",
                           {"thermal": config.thermal_modality()})
    img = rand_images(1, seed=7)[0]
    for method in ("rollout", "chefer"):
        ex = Explainer(trainer, state, cam_method=method)
        out = ex.explain_one({"thermal": img})
        cam_out = out["cams"]["thermal"]
        assert cam_out["method"] == method
        assert cam_out["cam"].shape == (SIZE // 16, SIZE // 16)
        assert cam_out["cam"].min() >= 0.0 and cam_out["cam"].max() <= 1.0
    # reference-parity default unchanged: saliency full-resolution map
    base = Explainer(trainer, state)
    out = base.explain_one({"thermal": img})
    assert out["cams"]["thermal"]["method"] == "saliency"

    rgb_trainer, rgb_state = _make("tiny_rgb",
                                   {"rgb": config.rgb_modality()})
    with pytest.raises(ValueError, match="needs a ViT branch"):
        Explainer(rgb_trainer, rgb_state, cam_method="rollout")


def test_rollout_class_agnostic_skips_borderline_reexplain():
    """rollout on a ViT-only model is class-agnostic: the engine must
    not re-run the explanation for a borderline thresholded decision
    (the CAM would be identical) but still report the served class."""
    trainer, state = _make("thermal_only",
                           {"thermal": config.thermal_modality()})
    ex = Explainer(trainer, state, cam_method="rollout")
    assert ex.class_agnostic is True
    assert Explainer(trainer, state,
                     cam_method="chefer").class_agnostic is False
    img = rand_images(1, seed=8)[0]
    base = ex.explain_one({"thermal": img})
    argmax = int(np.argmax(base["probs"]))
    flipped = 1 - argmax
    thr = 0.0 if flipped == 1 else 2.0
    engine = ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                           threshold=thr,
                           explainer=Explainer(trainer, state,
                                               cam_method="rollout"))
    with engine:
        out = engine.submit_explain({"thermal": img}).result(timeout=60)
    assert out["prediction"] == flipped
    assert out["class_explained"] == flipped
    # identical CAM to the single-pass rollout (no re-explain happened)
    np.testing.assert_allclose(out["cams"]["thermal"]["cam"],
                               base["cams"]["thermal"]["cam"], atol=1e-6)


def test_efficientnet_explainer_gets_true_gradcam():
    """EfficientNet-B0 exposes a 4-D 'features' tap: served explanations
    must be true Grad-CAM, not the input-saliency downgrade."""
    trainer, state = _make("efficientnet_rgb",
                           {"rgb": config.rgb_modality()})
    ex = Explainer(trainer, state)
    out = ex.explain_one({"rgb": rand_images(1, seed=9)[0]})
    cam_out = out["cams"]["rgb"]
    assert cam_out["method"] == "gradcam"
    # pre-head tap: 32px through B0's 5 stride-2 stages -> 1x1 grid at
    # toy size; what matters is the 4-D tap produced a spatial cam
    assert cam_out["cam"].ndim == 2
