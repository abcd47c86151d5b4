"""Serialized serving artifacts: ahead-of-time export via ``jax.export``.

Production deployments should not have to carry the model-building Python
(flax modules, Pallas kernels, zoo configs) or pay trace+lower time at
process start.  This module freezes a trained checkpoint's SERVING forward
into a self-contained on-disk bundle (no reference counterpart — the
reference repo, e.g. notebooks/extended_metrics.py, rebuilds torch modules
from source at every use):

- one StableHLO program per batch bucket (``jax.export`` — versioned,
  platform-checked, replayable without the model source),
- the variables pytree (msgpack, same flax serialization the checkpoints
  use),
- a JSON manifest recording model name / inputs / buckets / platforms /
  dtype / jax version.

The exported program is the Trainer's own jitted ``eval_step`` (uint8 batch
-> on-device normalize -> trunks -> probs/preds/loss/counts), traced per
bucket of the serving ladder, so a bundle drops into the dynamic-batching
:class:`~dfu_multimodal_tpu.serve.engine.ServingEngine` with row-for-row
parity against the checkpoint (tests/test_export.py).  Int8 bundles work
the same way: quantize first (serve.engine.quantize_for_serving), then
export — the int8 weights land in ``params.msgpack`` and the Mosaic kernel
custom-calls serialize inside the StableHLO program.

Note the platform contract: a program exported on TPU replays on TPU (the
manifest records ``platforms``); export on the deployment platform or pass
``platforms=[...]`` for multi-platform lowering where every op supports it.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

FORMAT_VERSION = 1
META_NAME = "export_meta.json"
PARAMS_NAME = "params.msgpack"

# Mosaic TPU kernels and host-callback-free sharding annotations appear as
# custom calls that jax.export does not list as officially stable; they are
# produced and consumed by the same jaxlib here, so replay is safe as long
# as bundles are re-exported on jaxlib upgrades (the manifest records the
# version for exactly that check).
_CUSTOM_CALL_ALLOWLIST = ("tpu_custom_call", "Sharding",
                          "annotate_device_placement")


def _program_name(bucket: int) -> str:
    return f"forward_b{bucket}.jaxexp"


def default_buckets(max_batch: int) -> Tuple[int, ...]:
    """The ServingEngine's power-of-two ladder on a single-device mesh."""
    ladder, b = [], 1
    while b < max_batch:
        ladder.append(b)
        b *= 2
    ladder.append(int(max_batch))
    return tuple(sorted(set(ladder)))


def _batch_specs(inputs: Sequence[str], bucket: int, image_size: int):
    import jax
    import jax.numpy as jnp

    s = int(image_size)
    spec = {m: jax.ShapeDtypeStruct((bucket, s, s, 3), jnp.uint8)
            for m in inputs}
    spec["label"] = jax.ShapeDtypeStruct((bucket,), jnp.int32)
    spec["valid"] = jax.ShapeDtypeStruct((bucket,), jnp.float32)
    return spec


def export_bundle(trainer, state, out_dir: Path, *, image_size: int = 224,
                  max_batch: int = 64,
                  buckets: Optional[Sequence[int]] = None,
                  platforms: Optional[Sequence[str]] = None,
                  extra_meta: Optional[Dict] = None) -> Dict:
    """Export ``trainer.eval_step`` on ``state``'s variables for every batch
    bucket into ``out_dir``.  Returns the manifest dict.

    ``trainer``/``state`` may already be int8-quantized
    (serve.engine.quantize_for_serving) — whatever program the Trainer
    serves is what gets frozen.
    """
    import jax
    from flax import serialization

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    variables = jax.tree.map(np.asarray, trainer.variables(state))
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables)

    buckets = tuple(sorted(set(int(b) for b in (
        buckets if buckets is not None else default_buckets(max_batch)))))
    disabled = [jax.export.DisabledSafetyCheck.custom_call(t)
                for t in _CUSTOM_CALL_ALLOWLIST]

    exported_platforms = None
    for bucket in buckets:
        exp = jax.export.export(
            trainer.eval_step,
            platforms=list(platforms) if platforms else None,
            disabled_checks=disabled,
        )(var_specs, _batch_specs(trainer.spec.inputs, bucket, image_size))
        exported_platforms = list(exp.platforms)
        (out_dir / _program_name(bucket)).write_bytes(exp.serialize())

    (out_dir / PARAMS_NAME).write_bytes(
        serialization.msgpack_serialize(
            serialization.to_state_dict(variables)))

    meta = {
        "format_version": FORMAT_VERSION,
        "model": trainer.spec.name,
        "inputs": list(trainer.spec.inputs),
        "image_size": int(image_size),
        "buckets": list(buckets),
        "platforms": exported_platforms,
        "compute_dtype": str(trainer.compute_dtype.__name__
                             if hasattr(trainer.compute_dtype, "__name__")
                             else trainer.compute_dtype),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    (out_dir / META_NAME).write_text(json.dumps(meta, indent=2))
    return meta


@dataclass(frozen=True)
class _Spec:
    name: str
    inputs: Tuple[str, ...]


class ExportedServable:
    """A loaded export bundle with the Trainer surface the ServingEngine
    needs (``spec``, ``mesh``, ``batch_sharding``, ``variables``,
    ``eval_step``) — so ``ServingEngine(servable, state=None)`` serves a
    bundle with no model source present.

    ``eval_step(variables, batch)`` routes on the batch's leading dim to
    the matching exported bucket program; unexported sizes raise.
    """

    def __init__(self, meta: Dict, variables: Dict, programs: Dict[int, bytes],
                 device=None):
        import jax
        from jax.sharding import Mesh

        from dfu_multimodal_tpu.parallel import mesh as mesh_mod

        self.meta = dict(meta)
        self.spec = _Spec(meta["model"], tuple(meta["inputs"]))
        self.image_size = int(meta["image_size"])
        self.buckets: Tuple[int, ...] = tuple(sorted(meta["buckets"]))
        self.platforms: Tuple[str, ...] = tuple(meta.get("platforms") or ())
        self._variables = variables
        self._blobs = dict(programs)
        self._calls: Dict[int, object] = {}

        device = device if device is not None else jax.devices()[0]
        grid = np.asarray([device]).reshape(1, 1)
        self.mesh = Mesh(grid, (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS))
        self.batch_sharding = mesh_mod.batch_sharding(self.mesh)

    # ---- Trainer-surface shims -------------------------------------------
    def variables(self, state=None) -> Dict:
        return self._variables

    def _call_for(self, bucket: int):
        import jax

        call = self._calls.get(bucket)
        if call is None:
            exp = jax.export.deserialize(self._blobs[bucket])
            call = jax.jit(exp.call)
            self._calls[bucket] = call
        return call

    def eval_step(self, variables: Dict, batch: Dict):
        n = int(batch["valid"].shape[0])
        if n not in self._blobs:
            raise KeyError(
                f"batch size {n} has no exported program; bundle buckets "
                f"are {list(self.buckets)} (re-export with --max-batch / "
                f"--buckets covering it)")
        return self._call_for(n)(variables, batch)

    def warmup_programs(self) -> None:
        """Deserialize every bucket program (XLA compiles lazily on first
        call; the ServingEngine's own warmup drives that)."""
        for b in self.buckets:
            self._call_for(b)


def load_bundle(path: Path, device=None) -> ExportedServable:
    """Load an export bundle directory into an :class:`ExportedServable`."""
    from flax import serialization

    path = Path(path)
    meta = json.loads((path / META_NAME).read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported export bundle format {meta.get('format_version')} "
            f"(this build reads {FORMAT_VERSION})")
    variables = serialization.msgpack_restore(
        (path / PARAMS_NAME).read_bytes())
    programs = {}
    for b in meta["buckets"]:
        blob_path = path / _program_name(int(b))
        if not blob_path.exists():
            raise FileNotFoundError(f"bundle is missing {blob_path.name}")
        programs[int(b)] = blob_path.read_bytes()
    return ExportedServable(meta, variables, programs, device=device)
