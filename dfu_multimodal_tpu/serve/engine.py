"""Dynamic micro-batching serving engine over the jitted eval step.

TPU-native online serving design (no reference counterpart — the reference
repo's inference surface is offline evaluation of labeled split dirs, e.g.
reference notebooks/evaluate_rgb_only.py):

- ONE thread owns the device.  Request threads enqueue (inputs, Future)
  pairs; the batcher thread drains the queue, coalescing up to
  ``max_batch`` requests or waiting at most ``max_wait_ms`` after the
  first, then runs a single forward and fans the rows back out.
- Batches are padded to POWER-OF-TWO buckets (each rounded up to the mesh
  data-axis multiple).  XLA compiles one program per static shape, so a
  fixed bucket ladder bounds compile count; :meth:`warmup` pre-compiles
  every bucket so no request ever pays a compile.  Padding rows carry
  ``valid=0`` — the same masked-batch convention the training loader uses
  (data/loader.py).
- The forward is the Trainer's own jitted eval step (train/engine.py):
  uint8 host batch -> device normalize -> fused bf16 (or int8 Pallas /
  int8-conv) trunks -> probabilities.  fp32<->uint8 conversion and
  normalization stay inside the compiled program; the host only stacks
  uint8 rows.
- Latency accounting is end-to-end per request (submit -> result on the
  caller's future), kept in a bounded reservoir for p50/p99.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import Counter, deque
from concurrent.futures import Future, InvalidStateError
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dfu_multimodal_tpu.parallel import mesh as mesh_mod

# models with an int8 serving path, and the subset whose ResNet trunk
# needs activation-scale calibration images (models/resnet_q8.py infers
# ResNet-50 vs the distilled ResNet-18 from the param tree)
RESNET_TRUNK_MODELS = frozenset(
    {"rgb_only", "multimodal", "resnet18_rgb", "resnet18_thermal"})
INT8_MODELS = RESNET_TRUNK_MODELS | {"thermal_only"}
# re-export: the registry owns the ViT-trunk model set (zoo.py); the
# Trainer's token-merge guard and the predict/serve CLIs all consult it
from dfu_multimodal_tpu.models.zoo import VIT_TRUNK_MODELS  # noqa: E402,F401


def quantize_for_serving(trainer, state, image_size: int = 224,
                         calib_u8: Optional[np.ndarray] = None,
                         attention_impl: str = "auto"):
    """Rebuild a restored fp32/bf16 (trainer, state) around the int8
    serving paths: fused int8 Pallas blocks for the ViT branch
    (models/vit.py::quantize_variables), calibrated static-scale int8 XLA
    convs for the ResNet branch (models/resnet_q8.py).

    ``calib_u8``: (N, S, S, 3) uint8 images used to calibrate the ResNet
    activation scales (first 32 used).  Required when the model has an RGB
    trunk; pin a fixed set for reproducible deployments.

    Returns the new (trainer, state).  Decision-level cost of this path is
    measured at 0% prediction flips on all four serving configurations
    (RESULTS_REHEARSAL.md).
    """
    import jax
    import jax.numpy as jnp

    from dfu_multimodal_tpu.train.engine import Trainer

    model_name = trainer.spec.name
    if model_name not in INT8_MODELS:
        # the int8 paths are trunk-specific (ResNet conv PTQ + fused q8
        # ViT encoder kernels) — reject other models with the contract
        # instead of failing deep inside calibration with a shape error
        raise ValueError(
            f"int8 serving is not supported for model {model_name!r}: "
            f"it covers {sorted(INT8_MODELS)}. Serve other models "
            "fp32/bf16.")
    qvars = trainer.variables(state)
    vit_impl = "auto"
    rgb_impl = "auto"
    if model_name in ("thermal_only", "multimodal"):
        from dfu_multimodal_tpu.models.vit import quantize_variables

        qvars = quantize_variables(qvars)
        from dfu_multimodal_tpu.models.common import mosaic_kernels_ok
        # int8 ViT serving exists only as Mosaic kernels (+ an interpret
        # fallback).  They run single-device, or on a pure-DP mesh via
        # the shard_map-wrapped eval step (train/engine.py
        # build_eval_step) — each device then traces a per-device
        # program, so no auto-partitioning is involved.  Param-sharded
        # meshes (TP/FSDP) cannot host them; reject up front.
        pure_dp = (trainer.mesh.size > 1 and not trainer.fsdp
                   and trainer.mesh.shape[mesh_mod.MODEL_AXIS] == 1)
        on_tpu = jax.devices()[0].platform == "tpu"
        if on_tpu and not (mosaic_kernels_ok() or pure_dp):
            raise ValueError(
                "int8 serving needs a single-device TPU process or a "
                "pure data-parallel mesh (the fused int8 ViT kernels run "
                "under shard_map over the data axis): param-sharded "
                "TP/FSDP meshes cannot host them. Serve bf16 there.")
        vit_impl = "fused_q8" if on_tpu else "fused_q8_interpret"
    if model_name in RESNET_TRUNK_MODELS:
        from dfu_multimodal_tpu.data.transforms import eval_normalize
        from dfu_multimodal_tpu.models.resnet_q8 import quantize_rgb_trunks

        if calib_u8 is None or len(calib_u8) == 0:
            raise ValueError(
                "int8 serving of a ResNet trunk needs calibration images "
                "(calib_u8) to fix the static activation scales")
        # calibrate with the modality that actually feeds the ResNet
        # trunk: rgb for rgb_only/multimodal/resnet18_rgb, thermal for
        # the resnet18_thermal student
        calib_modality = ("rgb" if "rgb" in trainer.spec.inputs
                          else trainer.spec.inputs[0])
        calib = eval_normalize(jnp.asarray(calib_u8[:32]),
                               trainer.modalities[calib_modality],
                               trainer.compute_dtype)
        qvars = quantize_rgb_trunks(qvars, [calib],
                                    dtype=trainer.compute_dtype)
        rgb_impl = "int8"

    # mesh=trainer.mesh: the admission guard above vetted THAT mesh — a
    # cfg-derived rebuild could land on a different one (e.g. a source
    # trainer constructed with an explicit mesh= argument)
    qtrainer = Trainer(model_name, trainer.cfg, trainer.modalities,
                       mesh=trainer.mesh,
                       attention_impl=attention_impl,
                       block_impl=vit_impl, rgb_impl=rgb_impl)
    qstate = qtrainer.init_state(jax.random.PRNGKey(0),
                                 image_size=image_size)
    qstate = qstate.replace(params=qvars["params"],
                            batch_stats=qvars.get("batch_stats", {}))
    return qtrainer, qstate


def parse_token_merge(spec: str) -> Tuple[int, int]:
    """Parse a CLI ``--token-merge`` value 'L:K' -> (merge_at, keep) —
    the ONE definition of that flag's format, shared by the serve and
    predict CLIs (both feed :func:`tome_for_serving`)."""
    try:
        merge_at, keep = (int(v) for v in spec.split(":"))
    except ValueError:
        raise SystemExit("--token-merge expects L:K (e.g. 4:128)")
    return merge_at, keep


def tome_for_serving(trainer, state, merge_at: int, keep: int,
                     image_size: int = 224, attention_impl: str = "auto",
                     prop_attn: bool = False):
    """Rebuild a restored (trainer, state) around the token-merge ViT
    serving path (models/vit.py ``token_merge``, ops/token_merge.py):
    blocks [0, merge_at) run on the full token set, one bipartite merge
    reduces to ``keep`` tokens, the remaining blocks run reduced —
    measured 1.33-1.47x on the 12-block encoder chain at b128
    (scripts_dev/bench_tome.py, docs/DESIGN.md).

    Inference-only. Composes with int8: pass the quantize_for_serving
    output in and the quantized block impls are preserved (the split is
    purely structural) — measured 4092 -> 5300 img/s/chip b128 with
    int8 + L=2 K=128 (docs/DESIGN.md). The checkpoint's stacked
    ``encoder`` params split into ``encoder``/``encoder2``
    (split_encoder_variables). Returns the new (trainer, state).

    ``prop_attn``: ToMe PROPORTIONAL attention (the full Bolya et al.
    recipe) — post-merge blocks bias each key's attention scores by
    log(token size).  Opt-in; default keeps the size-unweighted scores
    round 3 shipped."""
    import jax

    from dfu_multimodal_tpu.models.vit import split_encoder_variables
    from dfu_multimodal_tpu.train.engine import Trainer

    model_name = trainer.spec.name
    svars = split_encoder_variables(trainer.variables(state), merge_at)
    ttrainer = Trainer(model_name, trainer.cfg, trainer.modalities,
                       mesh=trainer.mesh,
                       attention_impl=attention_impl,
                       block_impl=getattr(trainer.module, "block_impl",
                                          "auto"),
                       rgb_impl=getattr(trainer.module, "rgb_impl",
                                        "auto"),
                       token_merge=(merge_at, keep),
                       tome_prop_attn=prop_attn)
    tstate = ttrainer.init_state(jax.random.PRNGKey(0),
                                 image_size=image_size)
    tstate = tstate.replace(params=svars["params"],
                            batch_stats=svars.get("batch_stats", {}))
    return ttrainer, tstate


class EngineOverloaded(RuntimeError):
    """Raised by :meth:`ServingEngine.submit` when the bounded request
    queue (``max_queue``) is full — backpressure instead of unbounded
    memory growth under overload.  The HTTP layer maps it to 503."""


class ExplainUnavailable(RuntimeError):
    """Raised by :meth:`ServingEngine.submit_explain` when the engine was
    built without an :class:`serve.explain.Explainer` (exported bundles
    have no model source to differentiate; checkpoint engines opt in via
    ``serve --explain``).  The HTTP layer maps it to 501."""


class ServingEngine:
    """Coalesce concurrent single-image requests into bucketed batches.

    Thread-safe entry points:

    - :meth:`submit` — enqueue one sample, get a ``Future`` resolving to
      ``(prob_ulcer, prediction)``.
    - :meth:`predict` — synchronous convenience over :meth:`submit` for a
      host batch (used by tests and warmup).
    - :meth:`stats` — counters + latency percentiles.

    Use as a context manager (``with ServingEngine(...) as eng``) or call
    :meth:`start`/:meth:`stop`.
    """

    def __init__(self, trainer, state, *, image_size: int = 224,
                 max_batch: int = 64, max_wait_ms: float = 2.0,
                 pipeline_depth: int = 1, latency_window: int = 4096,
                 buckets: Optional[Sequence[int]] = None,
                 threshold: Optional[float] = None,
                 temperature: Optional[float] = None,
                 max_queue: Optional[int] = None,
                 drift_monitor=None, explainer=None):
        # clinical operating point: predict Ulcer when P(ulcer) >=
        # threshold instead of argmax (eval/threshold.py picks one on a
        # validation split); None keeps the default argmax prediction
        self.threshold = None if threshold is None else float(threshold)
        # probability calibration: temperature-scale the responded probs
        # (eval/calibration.py fits T on a validation split); argmax
        # predictions are invariant, an explicit threshold applies to
        # the SCALED probabilities (thresholds should be picked on
        # scaled val probs when both are configured)
        self.temperature = (None if temperature is None
                            else float(temperature))
        if self.temperature is not None and self.temperature <= 0:
            raise ValueError(f"temperature must be > 0: {temperature}")
        self.trainer = trainer
        self.image_size = int(image_size)
        self.inputs: Tuple[str, ...] = tuple(trainer.spec.inputs)
        self.model_name: str = trainer.spec.name
        self._variables = trainer.variables(state)
        self._eval_step = trainer.eval_step          # jitted, shape-cached
        self.max_wait_s = float(max_wait_ms) * 1e-3
        if buckets is not None:
            # Explicit ladder (export bundles pin the bucket set their
            # serialized programs were traced at, serve/export.py).
            self.buckets = tuple(sorted(set(int(b) for b in buckets)))
            self.max_batch = self.buckets[-1]
        else:
            # Power-of-two ladder, each rounded up to the mesh multiple so
            # device_put with the data-axis sharding always divides evenly.
            self.max_batch = mesh_mod.pad_batch_to_mesh(int(max_batch),
                                                        trainer.mesh)
            ladder: List[int] = []
            b = 1
            while b < self.max_batch:
                ladder.append(mesh_mod.pad_batch_to_mesh(b, trainer.mesh))
                b *= 2
            ladder.append(self.max_batch)
            self.buckets = tuple(sorted(set(ladder)))

        self.pipeline_depth = max(1, int(pipeline_depth))
        # input drift monitoring (eval/drift.py::DriftMonitor): fold live
        # request statistics in on the batcher thread, score against the
        # training-split baseline in stats(). None = off.
        self.drift_monitor = drift_monitor
        # bounded admission: reject (EngineOverloaded -> HTTP 503) once
        # max_queue requests are waiting, instead of queueing without
        # limit; None keeps the unbounded legacy behavior
        self.max_queue = None if max_queue is None else int(max_queue)
        self._queue: "queue.Queue" = queue.Queue(
            maxsize=0 if self.max_queue is None else self.max_queue)
        # serving-time Grad-CAM (serve/explain.py::Explainer, built from
        # the full-fidelity checkpoint, NOT the int8/tome rebuild); None
        # disables /v1/explain for this model.  Explain requests wait in
        # their own small bounded queue and run one-at-a-time on the
        # batcher thread between predict batches — rare, human-initiated
        # traffic that must never starve the predict path.
        self.explainer = explainer
        self._explain_queue: "queue.Queue" = queue.Queue(maxsize=64)
        # shadow deployment (serve/shadow.py::ShadowTracker): a candidate
        # engine fed this engine's live traffic fire-and-forget; set via
        # shadow.attach_shadow, never answers requests
        self.shadow = None
        self._stop = threading.Event()
        self._closed = False        # stop() sets; submit() then raises
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self._latencies = deque(maxlen=latency_window)
        self._batch_sizes: Counter = Counter()
        self._requests = 0
        self._errors = 0
        self._rejected = 0
        self._explains = 0

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "ServingEngine":
        if self._thread is not None and self._thread.is_alive():
            if not self._stop.is_set():
                return self                       # already running
            # the thread outlived a timed-out stop(): clearing the flag
            # to "resume" it races its loop-exit check — it may already
            # be past the check and exit regardless, leaving the engine
            # with NO batcher and every future submit() hanging.  It was
            # told to stop and exits after its in-flight batch; wait it
            # out (bounded — a wedged device RPC must fail the restart,
            # not hang it forever) and spawn a fresh batcher.
            self._thread.join(timeout=60.0)
            if self._thread.is_alive():
                raise RuntimeError(
                    "previous batcher thread is still wedged in a device "
                    "call 60s after stop(); cannot safely restart")
        self._stop.clear()
        self._closed = False
        self._thread = threading.Thread(target=self._loop,
                                        name="dfu-serve-batcher",
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0) -> None:
        # refuse NEW work first: a submit() after stop() would enqueue
        # into a queue no batcher will ever drain, and predict() waits
        # on the future with no timeout — a permanent hang for direct-
        # API callers.  start() re-opens.
        self._closed = True
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            if self._thread.is_alive():
                # a stalled fetch outlived the join window (possible over
                # a slow tunnel RPC): KEEP the reference so a later
                # start() can wait it out (bounded join) before spawning
                # a fresh batcher — never two batchers side by side
                return
            self._thread = None
        # fail any stragglers enqueued after the drain
        for q in (self._queue, self._explain_queue):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                if not item[1].done():
                    item[1].set_exception(
                        RuntimeError("serving engine stopped"))

    def __enter__(self) -> "ServingEngine":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------- serving

    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        """Enqueue one sample (``{modality: (S, S, 3) uint8}``; missing
        modalities fill black, matching the loader's masked-modality
        convention).  Returns a Future of ``(prob_ulcer, pred_int)``.

        Shape/dtype are validated HERE so one malformed direct-API
        sample raises to its own caller instead of blowing up inside the
        batcher's shared assembly and failing every request coalesced
        into the same batch."""
        if self._closed:
            raise RuntimeError("serving engine stopped")
        if not sample:
            # an empty dict would fill every modality black and return a
            # confident prediction computed on nothing (submit_explain
            # already guards this; the predict path must too)
            raise ValueError("sample needs at least one modality")
        self._validate_sample(sample)
        fut: Future = Future()
        try:
            self._queue.put_nowait((sample, fut, time.monotonic()))
        except queue.Full:
            with self._lock:
                self._rejected += 1
            raise EngineOverloaded(
                f"request queue full ({self.max_queue} waiting); retry")
        if self._closed and not fut.done():
            # raced a concurrent stop() past its straggler drain: fail
            # the future here rather than leave it parked forever (the
            # batcher may legitimately win this race mid-drain, hence
            # the InvalidStateError guard)
            try:
                fut.set_exception(RuntimeError("serving engine stopped"))
            except InvalidStateError:
                pass
        return fut

    def predict(self, samples: Sequence[Dict[str, np.ndarray]]
                ) -> List[Tuple[float, int]]:
        """Synchronous batch convenience: submit all, wait for all."""
        futs = [self.submit(s) for s in samples]
        return [f.result() for f in futs]

    def _validate_sample(self, sample: Dict[str, np.ndarray]) -> None:
        S = self.image_size
        for m, arr in sample.items():
            if m not in self.inputs:
                raise ValueError(
                    f"unknown modality {m!r}; model takes "
                    f"{list(self.inputs)}")
            a = np.asarray(arr)
            if a.shape != (S, S, 3) or a.dtype != np.uint8:
                raise ValueError(
                    f"sample[{m!r}] must be ({S}, {S}, 3) uint8, got "
                    f"{a.shape} {a.dtype}")

    def submit_explain(self, sample: Dict[str, np.ndarray]) -> Future:
        """Enqueue one Grad-CAM explanation request.  Returns a Future of
        ``{"prob_ulcer", "prediction", "class_explained", "cams":
        {modality: {"cam", "method"}}}`` — probabilities carry the
        engine's deployment tuning (temperature/threshold), exactly like
        :meth:`submit` results, and when the tuned decision diverges from
        the raw-logit argmax the CAM is recomputed for the tuned class,
        so the explained decision IS the served decision
        (``class_explained`` states it explicitly).
        Raises :class:`ExplainUnavailable` when the engine was built
        without an explainer (HTTP maps it to 501)."""
        if self._closed:
            raise RuntimeError("serving engine stopped")
        if self.explainer is None:
            raise ExplainUnavailable(
                f"model {self.model_name!r} is served without "
                "explanations (start the daemon with --explain)")
        self._validate_sample(sample)
        if not sample:
            raise ValueError("explanation needs at least one modality")
        fut: Future = Future()
        try:
            self._explain_queue.put_nowait((sample, fut, time.monotonic()))
        except queue.Full:
            with self._lock:
                self._rejected += 1
            raise EngineOverloaded("explanation queue full; retry")
        return fut

    def _run_explains(self, max_items: int = 4) -> None:
        """Drain up to ``max_items`` queued explanation requests on the
        batcher thread (one forward+backward each)."""
        for _ in range(max_items):
            try:
                sample, fut, _t0 = self._explain_queue.get_nowait()
            except queue.Empty:
                return
            try:
                out = self.explainer.explain_one(sample)
                # explainer probs are the (2,) softmax; the serving
                # contract is P(ulcer) + the deployment-tuned decision
                probs, preds = self._apply_deployment(
                    np.asarray([out["probs"][1]], np.float64))
                decided = int(preds[0])
                if (self.explainer.class_index == "pred"
                        and out["class_explained"] != decided):
                    # borderline request: the configured threshold on
                    # temperature-scaled P(ulcer) decided the OTHER
                    # class from the raw-logit argmax the CAM explained.
                    # Re-explain the served decision — the heatmap must
                    # be evidence for what the caller was actually told.
                    # (Unless every CAM is class-agnostic — rollout-only
                    # — where a re-run would return the identical map.)
                    if self.explainer.class_agnostic:
                        out = {**out, "class_explained": decided}
                    else:
                        out = self.explainer.explain_one(
                            sample, class_override=decided)
                fut.set_result({"prob_ulcer": float(probs[0]),
                                "prediction": decided,
                                "class_explained": out["class_explained"],
                                "cams": out["cams"]})
                with self._lock:
                    self._explains += 1
            except Exception as exc:
                if not fut.done():
                    fut.set_exception(exc)
                with self._lock:
                    self._errors += 1

    def warmup(self) -> None:
        """Compile every bucket's program before taking traffic (first
        compile is seconds; steady-state must never pay it).

        Fail-fast contract: a bucket program that cannot compile or
        execute must fail STARTUP here — ``_execute`` routes failures
        into the request futures, so warmup re-raises from them instead
        of letting a broken daemon come up 'healthy' and 500 every live
        request mapped to that bucket."""
        zero = {m: np.zeros((self.image_size, self.image_size, 3), np.uint8)
                for m in self.inputs}
        for bucket in self.buckets:
            futs = [Future() for _ in range(bucket)]
            self._execute([(dict(zero), f, time.monotonic())
                           for f in futs], record=False)
            for f in futs:   # _execute is synchronous: settled either way
                f.result(timeout=0)
        if self.explainer is not None:
            # the forward+backward explanation program compiles too —
            # a clinician's first click must not pay an XLA compile.
            # With a threshold the decision can diverge from argmax and
            # _run_explains re-explains with a fixed class: warm both
            # fixed-class programs so borderline clicks don't compile.
            classes = ((0, 1) if (self.threshold is not None
                                  and self.explainer.class_index == "pred"
                                  and not self.explainer.class_agnostic)
                       else ())
            self.explainer.warmup(self.image_size, classes=classes)

    # ------------------------------------------------------------- batcher

    def _collect(self, first_timeout: float):
        """Coalesce up to ``max_batch`` queued requests: block up to
        ``first_timeout`` for the first, then keep the window open
        ``max_wait_ms`` after it.  Returns [] on timeout."""
        try:
            first = self._queue.get(timeout=first_timeout)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # drain anything already queued, but stop waiting
                try:
                    items.append(self._queue.get_nowait())
                    continue
                except queue.Empty:
                    break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self) -> None:
        """Sequential by default (``pipeline_depth=1``): collect, dispatch,
        fetch, repeat — requests queue up during the fetch, which is what
        produces full buckets under load.

        ``pipeline_depth=2`` enables a software pipeline: dispatch batch
        N+1 (host assembly + async device_put + async jit dispatch) BEFORE
        fetching batch N's results, overlapping input transfer with the
        result wait.  MEASURED NEGATIVE under the axon tunnel (2026-08-18,
        multimodal b128 load test, scripts_dev/bench_serve.py): 165 req/s
        sequential vs 79-49 req/s pipelined — interleaving the next
        batch's ~38.5 MB upload with the previous batch's result RPC
        head-of-line-blocks the tunnel link, which is already the
        bottleneck (~30-60 MB/s H2D; device compute is 38.7 ms/batch).
        Kept as an opt-in for direct-attached hosts, where input DMA is
        GB/s and overlap can only help."""
        pending = None
        while not self._stop.is_set():
            # With a batch in flight, don't sleep waiting for more work —
            # grab whatever is already queued and get back to fetching.
            items = self._collect(0.0 if pending else 0.05)
            handle = self._dispatch(items) if items else None
            if self.pipeline_depth < 2 and handle is not None:
                self._resolve(*handle)
                handle = None
            if pending is not None:
                self._resolve(*pending)
            pending = handle
            if self.explainer is not None:
                # between predict batches; ≤4 per pass so a burst of
                # explain clicks cannot starve the predict path
                self._run_explains()
        if pending is not None:
            self._resolve(*pending)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _dispatch(self, items, record: bool = True):
        """Assemble + enqueue one batch on the device (non-blocking).
        Returns (items, out, record) for :meth:`_resolve`, or None if the
        dispatch itself failed (futures already failed)."""
        import jax

        n = len(items)
        bucket = self._bucket(n)
        S = self.image_size
        try:
            batch = {m: np.zeros((bucket, S, S, 3), np.uint8)
                     for m in self.inputs}
            for i, (sample, _, _) in enumerate(items):
                for m in self.inputs:
                    if m in sample:
                        batch[m][i] = sample[m]
            batch["label"] = np.zeros(bucket, np.int32)
            batch["valid"] = (np.arange(bucket) < n).astype(np.float32)
            if self.drift_monitor is not None and record:
                # per provided modality only — black fill-ins for absent
                # modalities are padding, not camera output
                for m in self.inputs:
                    rows = [i for i, (s, _, _) in enumerate(items)
                            if m in s]
                    if rows:
                        self.drift_monitor.update(m, batch[m][rows])
            batch = jax.device_put(batch, self.trainer.batch_sharding)
            out = self._eval_step(self._variables, batch)
        except Exception as exc:                     # fan the failure out
            self._fail(items, exc, record)
            return None
        return items, out, record

    def _resolve(self, items, out, record: bool = True) -> None:
        """Fetch a dispatched batch's results (blocks on device + link)
        and fan them out to the request futures."""
        n = len(items)
        try:
            probs, preds = self._apply_deployment(
                np.asarray(out["probs"])[:n],
                np.asarray(out["preds"])[:n])
        except Exception as exc:
            self._fail(items, exc, record)
            return
        now = time.monotonic()
        for (_, fut, t0), prob, pred in zip(items, probs, preds):
            if not fut.done():
                fut.set_result((float(prob), int(pred)))
            if record:
                with self._lock:
                    self._latencies.append(now - t0)
        if record:
            with self._lock:
                self._requests += n
                self._batch_sizes[n] += 1

    def _apply_deployment(self, probs: np.ndarray,
                          preds: Optional[np.ndarray] = None):
        """Deployment tuning on a (B,) P(ulcer) vector: temperature-scale
        the probabilities, then decide by the explicit threshold when one
        is configured (else keep the model's argmax ``preds``, or the
        equivalent 0.5 cut when the caller has none)."""
        if self.temperature is not None:
            from dfu_multimodal_tpu.eval.calibration import (
                apply_temperature)
            probs = apply_temperature(probs, self.temperature)
        if self.threshold is not None:
            preds = (probs >= self.threshold).astype(np.int64)
        elif preds is None:
            preds = (probs >= 0.5).astype(np.int64)
        return probs, preds

    def _fail(self, items, exc, record: bool) -> None:
        for _, fut, _ in items:
            if not fut.done():
                fut.set_exception(exc)
        if record:
            with self._lock:
                self._errors += len(items)

    def _execute(self, items, record: bool = True) -> None:
        """Synchronous dispatch+resolve (warmup and tests)."""
        handle = self._dispatch(items, record)
        if handle is not None:
            self._resolve(*handle)

    # ------------------------------------------------------------- metrics

    def stats(self) -> Dict:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64) * 1e3
            sizes = dict(sorted(self._batch_sizes.items()))
            requests, errors = self._requests, self._errors
            rejected, explains = self._rejected, self._explains
        out = {"model": self.model_name,
               "inputs": list(self.inputs),
               "requests": requests,
               "errors": errors,
               "rejected": rejected,
               "explains": explains,
               "explain_enabled": self.explainer is not None,
               "queue_depth": self._queue.qsize(),
               "buckets": list(self.buckets),
               "batch_size_hist": sizes}
        if lat.size:
            out["latency_ms"] = {
                "p50": round(float(np.percentile(lat, 50)), 3),
                "p90": round(float(np.percentile(lat, 90)), 3),
                "p99": round(float(np.percentile(lat, 99)), 3),
                "mean": round(float(lat.mean()), 3),
                "window": int(lat.size)}
        if self.drift_monitor is not None:
            # monitoring must never take down the metrics/liveness
            # surface — a reporting bug degrades to an error string
            try:
                out["drift"] = self.drift_monitor.report()
            except Exception as exc:            # pragma: no cover
                out["drift"] = {"verdict": "error", "error": str(exc)}
        if self.shadow is not None:
            out["shadow"] = self.shadow.stats()
        return out


class ModelRouter:
    """Serve several models from one daemon, routing each request to the
    engine whose input set matches the modalities the request carries.

    The clinical deployment shape: one box holds the rgb_only,
    thermal_only and multimodal checkpoints; a request with only an RGB
    photo hits the RGB model, one with both modalities hits the fusion
    model — no client-side model selection needed (an explicit
    ``/v1/predict/<model>`` path still forces one).  Each engine keeps its
    own batcher thread and queue; the XLA runtime serializes their device
    programs, so mixed traffic shares the chip fairly without any
    cross-engine locking.
    """

    def __init__(self, engines: Dict[str, "ServingEngine"]):
        if not engines:
            raise ValueError("ModelRouter needs at least one engine")
        self.engines = dict(engines)

    # Lifecycle fans out to every engine.
    def start(self) -> "ModelRouter":
        for e in self.engines.values():
            e.start()
        return self

    def stop(self, timeout: float = 5.0) -> None:
        for e in self.engines.values():
            e.stop(timeout=timeout)

    def warmup(self) -> None:
        for e in self.engines.values():
            e.warmup()

    def __enter__(self) -> "ModelRouter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def single(self) -> Optional["ServingEngine"]:
        """The one engine when exactly one is registered, else None."""
        if len(self.engines) == 1:
            return next(iter(self.engines.values()))
        return None

    def select(self, modalities, explicit: Optional[str] = None
               ) -> "ServingEngine":
        """Explicit model name wins; otherwise prefer the engine whose
        inputs EXACTLY match the provided modalities, then the
        largest-input engine fully covered by them."""
        if explicit is not None:
            try:
                return self.engines[explicit]
            except KeyError:
                raise KeyError(
                    f"unknown model {explicit!r}; serving "
                    f"{sorted(self.engines)}") from None
        if self.single is not None:
            return self.single
        mods = set(modalities)
        exact = [(n, e) for n, e in self.engines.items()
                 if set(e.inputs) == mods]
        if len(exact) > 1:
            # two served models take the same inputs (e.g. two RGB
            # checkpoints): implicit routing would pick one silently, and
            # WHICH one could flip across restarts — refuse, like the
            # explicit path 404s on an unknown name
            raise KeyError(
                "ambiguous request: models "
                + ", ".join(sorted(n for n, _ in exact))
                + f" all take {sorted(mods)} — use /v1/predict/<model>")
        if exact:
            return exact[0][1]
        covered = [e for e in self.engines.values()
                   if set(e.inputs) <= mods]
        if covered:
            best = max(len(e.inputs) for e in covered)
            top = [(n, e) for n, e in self.engines.items()
                   if e in covered and len(e.inputs) == best]
            if len(top) > 1:
                raise KeyError(
                    "ambiguous request: models "
                    + ", ".join(sorted(n for n, _ in top))
                    + " match equally — use /v1/predict/<model>")
            return top[0][1]
        raise KeyError(
            f"no served model accepts modalities {sorted(mods)}; "
            f"serving " + ", ".join(
                f"{n}={list(e.inputs)}" for n, e in self.engines.items()))

    def stats(self) -> Dict:
        if self.single is not None:     # back-compat single-model shape
            return self.single.stats()
        per = {n: e.stats() for n, e in self.engines.items()}
        return {"models": per,
                "requests": sum(s["requests"] for s in per.values()),
                "errors": sum(s["errors"] for s in per.values())}
