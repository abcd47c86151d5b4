"""Dependency-free HTTP front end for :class:`ServingEngine`.

Stdlib ``ThreadingHTTPServer``: each request thread decodes its own image
bytes (PIL decode + the exact bilinear-resize contract of the training
loader, data/loader.py::load_image) and blocks on the engine future while
the single batcher thread owns the device — concurrency comes from request
coalescing, not from parallel device access.

Endpoints:

- ``POST /v1/predict`` —
  * body ``image/jpeg`` / ``image/png``: one image for the model's primary
    modality (single-modality models);
  * body ``application/json``: ``{"<modality>": <base64 image bytes>}``
    per model input (``"image"`` accepted as an alias for the primary
    modality).  Missing modalities fill black, the loader's
    masked-modality convention.
  Response: ``{"prob_ulcer", "prediction", "model", "latency_ms"}``.
- ``GET /healthz`` — liveness + model identity.
- ``GET /metrics`` — engine counters and latency percentiles (JSON).
"""

from __future__ import annotations

import base64
import binascii
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np

from dfu_multimodal_tpu.serve.engine import ServingEngine


def decode_image_bytes(data: bytes, image_size: int) -> np.ndarray:
    """Bytes -> (S, S, 3) uint8 with the training loader's exact decode
    contract (RGB convert + PIL BILINEAR resize, data/loader.py:31-40)."""
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        img = img.convert("RGB")
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


class _BadRequest(ValueError):
    pass


class PredictHandler(BaseHTTPRequestHandler):
    """One instance per request (stdlib contract); the shared engine hangs
    off the server object (:func:`make_server`)."""

    server_version = "dfu-serve/1.0"
    # silence per-request stderr logging; metrics carry the signal
    def log_message(self, fmt, *args):          # noqa: D102
        pass

    @property
    def engine(self) -> ServingEngine:
        return self.server.engine               # type: ignore[attr-defined]

    def _send_json(self, code: int, payload: Dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:                   # noqa: N802
        if self.path == "/healthz":
            self._send_json(200, {"status": "ok",
                                  "model": self.engine.model_name,
                                  "inputs": list(self.engine.inputs)})
        elif self.path == "/metrics":
            self._send_json(200, self.engine.stats())
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def _parse_sample(self) -> Dict[str, np.ndarray]:
        length = int(self.headers.get("Content-Length", 0))
        if length <= 0:
            raise _BadRequest("empty body")
        data = self.rfile.read(length)
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        size = self.engine.image_size
        if ctype.startswith("image/"):
            primary = self.engine.inputs[0]
            if len(self.engine.inputs) > 1:
                raise _BadRequest(
                    f"model {self.engine.model_name!r} needs "
                    f"{list(self.engine.inputs)} — send application/json "
                    "with one base64 image per modality")
            return {primary: decode_image_bytes(data, size)}
        if ctype == "application/json":
            try:
                payload = json.loads(data)
            except json.JSONDecodeError as exc:
                raise _BadRequest(f"bad JSON: {exc}") from exc
            if not isinstance(payload, dict):
                raise _BadRequest("JSON body must be an object")
            if "image" in payload and self.engine.inputs[0] not in payload:
                payload[self.engine.inputs[0]] = payload.pop("image")
            sample = {}
            for m in self.engine.inputs:
                if m not in payload:
                    continue
                try:
                    raw = base64.b64decode(payload[m], validate=True)
                except (binascii.Error, TypeError) as exc:
                    raise _BadRequest(
                        f"field {m!r} is not valid base64") from exc
                try:
                    sample[m] = decode_image_bytes(raw, size)
                except Exception as exc:
                    raise _BadRequest(
                        f"field {m!r} is not a decodable image: "
                        f"{exc}") from exc
            if not sample:
                raise _BadRequest(
                    f"no model input present; expected one of "
                    f"{list(self.engine.inputs)}")
            return sample
        raise _BadRequest(f"unsupported Content-Type {ctype!r}")

    def do_POST(self) -> None:                  # noqa: N802
        if self.path not in ("/v1/predict", "/predict"):
            self._send_json(404, {"error": f"unknown path {self.path}"})
            return
        t0 = time.monotonic()
        try:
            sample = self._parse_sample()
        except _BadRequest as exc:
            self._send_json(400, {"error": str(exc)})
            return
        try:
            prob, pred = self.engine.submit(sample).result(timeout=60.0)
        except Exception as exc:
            self._send_json(500, {"error": f"inference failed: {exc}"})
            return
        self._send_json(200, {
            "prob_ulcer": round(prob, 6),
            "prediction": "ulcer" if pred == 1 else "healthy",
            "model": self.engine.model_name,
            "latency_ms": round((time.monotonic() - t0) * 1e3, 3)})


def make_server(engine: ServingEngine, host: str = "0.0.0.0",
                port: int = 8000) -> ThreadingHTTPServer:
    """Bind (but do not start) the HTTP server; ``serve_forever()`` to run.
    ``port=0`` picks an ephemeral port (tests)."""
    server = ThreadingHTTPServer((host, port), PredictHandler)
    server.engine = engine                      # type: ignore[attr-defined]
    return server
