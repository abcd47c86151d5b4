"""Prometheus exposition of the serving metrics (serve/prometheus.py):
line format, one HELP/TYPE per metric, drift + shadow sections, and the
HTTP endpoint content type."""

import json
import threading
import urllib.request

import jax
import numpy as np

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.eval import drift as drift_mod
from dfu_multimodal_tpu.serve.engine import ModelRouter, ServingEngine
from dfu_multimodal_tpu.serve.http import make_server
from dfu_multimodal_tpu.serve.prometheus import render_prometheus
from dfu_multimodal_tpu.serve.shadow import attach_shadow
from dfu_multimodal_tpu.train.engine import Trainer

SIZE = 32


def _engine(**kw):
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    return ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                         **kw)


def rand_images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, SIZE, SIZE, 3), dtype=np.uint8)


def _parse(text):
    """Prometheus text -> {metric_with_labels: float}; validates HELP/TYPE
    uniqueness and that every sample line parses."""
    samples = {}
    helps = []
    types = []
    for line in text.strip().split("\n"):
        if line.startswith("# HELP"):
            helps.append(line.split()[2])
            continue
        if line.startswith("# TYPE"):
            types.append(line.split()[2])
            continue
        name_labels, value = line.rsplit(" ", 1)
        samples[name_labels] = float(value)
    assert len(helps) == len(set(helps)), "duplicate HELP lines"
    assert helps == types
    return samples


def test_render_prometheus_counters_and_shadow():
    imgs = rand_images(3, seed=1)
    baseline = drift_mod.baseline_from_arrays({"rgb": imgs})
    primary = _engine(drift_monitor=drift_mod.DriftMonitor(baseline))
    router = ModelRouter({"tiny_rgb": primary})
    cand = _engine()
    tracker = attach_shadow(router, cand)
    with primary, cand:
        for img in imgs:
            (prob, pred), = primary.predict([{"rgb": img}])
            tracker.observe({"rgb": img}, prob, pred)
        import time
        deadline = time.monotonic() + 30
        while (tracker.stats()["compared"] < 3
               and time.monotonic() < deadline):
            time.sleep(0.02)
    text = render_prometheus(router)
    s = _parse(text)
    assert s['dfu_requests_total{model="tiny_rgb"}'] == 3.0
    assert s['dfu_errors_total{model="tiny_rgb"}'] == 0.0
    assert ('dfu_request_latency_ms{quantile="0.5",model="tiny_rgb"}'
            in s)
    assert (s['dfu_shadow_compared_total'
              '{model="tiny_rgb",shadow="tiny_rgb"}'] == 3.0)
    assert (s['dfu_shadow_agreement'
              '{model="tiny_rgb",shadow="tiny_rgb"}'] == 1.0)
    # drift: warming_up active (3 images < min window), exactly one
    # verdict label set per modality
    verdict_lines = {k: v for k, v in s.items()
                     if k.startswith("dfu_drift_verdict")
                     and 'modality="rgb"' in k}
    assert sum(verdict_lines.values()) == 1.0
    assert (verdict_lines['dfu_drift_verdict{modality="rgb",'
                          'verdict="warming_up",model="tiny_rgb"}']
            == 1.0)


def test_http_prometheus_endpoint():
    primary = _engine()
    server = make_server(primary, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with primary:
            primary.predict([{"rgb": rand_images(1)[0]}])
            with urllib.request.urlopen(f"{url}/metrics/prometheus",
                                        timeout=30) as r:
                assert r.headers["Content-Type"].startswith("text/plain")
                text = r.read().decode()
            s = _parse(text)
            assert s['dfu_requests_total{model="tiny_rgb"}'] >= 1.0
            # JSON endpoint unchanged
            with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
                assert json.loads(r.read())["requests"] >= 1
    finally:
        server.shutdown()
        server.server_close()


def _thermal_engine(**kw):
    cfg = config.TrainConfig(batch_size=8, eval_batch_size=8,
                             compute_dtype="float32",
                             mesh=config.MeshConfig(data=1))
    trainer = Trainer("tiny_thermal", cfg,
                      {"thermal": config.thermal_modality()})
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=SIZE)
    return ServingEngine(trainer, state, image_size=SIZE, max_batch=8,
                         **kw)


def test_multi_model_families_are_contiguous():
    """Text-format 0.0.4 requires ALL samples of a metric family to form
    one group right after its HELP/TYPE.  With two served models the
    per-engine sections must not interleave families: every
    dfu_requests_total{model=...} line (etc.) appears in one contiguous
    block."""
    router = ModelRouter({"tiny_rgb": _engine(),
                          "tiny_thermal": _thermal_engine()})
    text = render_prometheus(router)
    current = None
    seen_families = []
    for line in text.strip().split("\n"):
        if line.startswith("# HELP"):
            name = line.split()[2]
            assert name not in seen_families, (
                f"family {name} split into multiple groups")
            seen_families.append(name)
            current = name
        elif line.startswith("# TYPE"):
            assert line.split()[2] == current
        else:
            name = line.split("{")[0].split(" ")[0]
            assert name == current, (
                f"sample {name} outside its family group ({current})")
    # both models contributed to the shared families
    s = _parse(text)
    assert s['dfu_requests_total{model="tiny_rgb"}'] == 0.0
    assert s['dfu_requests_total{model="tiny_thermal"}'] == 0.0
