"""Online serving: dynamic micro-batching engine + stdlib HTTP front end.

No reference counterpart — ShreenathKR2000/DFU-Multimodal ends at offline
evaluation scripts over labeled split directories.  This package is the
deployment path the framework is built for: a batcher thread that owns the
device and coalesces concurrent requests into padded power-of-two batch
buckets (one warmed XLA program per bucket), fronted by a dependency-free
HTTP server.
"""

from dfu_multimodal_tpu.serve.engine import (     # noqa: F401
    ModelRouter, ServingEngine, quantize_for_serving)
