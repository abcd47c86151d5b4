"""Tensor-parallel parameter partitioning over the mesh's ``model`` axis.

The classifiers here (23–110M params) don't *need* TP (SURVEY.md §2.3), but
the mesh reserves a ``model`` axis and this module gives it real semantics:
Megatron-style column/row sharding of the widest matmuls, expressed purely
as parameter shardings — XLA inserts the activation collectives under jit.

Rules are (regex over the param path, PartitionSpec). Defaults shard:
- ViT MLP: fc1 kernel column-wise (hidden -> 4·hidden over ``model``),
  fc2 kernel row-wise (4·hidden -> hidden), so the pair needs exactly one
  reduce-scatter/all-reduce per block;
- the qkv projection column-wise and attn out-proj row-wise;
- the fusion MLP's first layer column-wise.
Biases of column-sharded layers shard on the same axis; everything else is
replicated.  Stacked (scanned) block params keep their leading depth axis
unsharded.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfu_multimodal_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

def put_global(value, sharding: NamedSharding):
    """Place a value onto a (possibly multi-process) mesh sharding.

    Single-process: plain ``jax.device_put``.  Multi-process, host
    values: the mesh spans non-addressable devices, where ``device_put``
    of a host value raises — build the global array from each process's
    addressable shards instead (``jax.make_array_from_callback``).
    Correct because every process holds the IDENTICAL host value
    (deterministic seeded init / the same restored checkpoint), so
    slicing it locally yields consistent global contents.

    Multi-process, already-GLOBAL device arrays (e.g. the fresh-init
    leaves ``load_flexible`` keeps when a checkpoint lacks a key, or a
    restored state's untouched opt_state): these cannot be fetched to
    host (`np.asarray` raises on non-addressable spans) — pass them
    through when already placed as requested, else reshard with a jitted
    identity whose ``out_shardings`` is the target (a collective every
    process executes).
    """
    if jax.process_count() > 1:
        if isinstance(value, jax.Array) and not value.is_fully_addressable:
            if value.sharding == sharding:
                return value
            return jax.jit(lambda x: x, out_shardings=sharding)(value)
        v = np.asarray(value)
        return jax.make_array_from_callback(v.shape, sharding,
                                            lambda idx: v[idx])
    return jax.device_put(value, sharding)


# (path regex, spec builder(ndim) -> PartitionSpec)
# Paths are '/'-joined param paths like
# 'params/ViT_0/encoder/mlp_fc1/kernel' (leading depth axis when scanned).
DEFAULT_TP_RULES: List[Tuple[str, str]] = [
    (r".*/(mlp_fc1|qkv)/kernel$", "col"),
    (r".*/(mlp_fc1|qkv)/bias$", "col_bias"),
    (r".*/(mlp_fc2|proj)/kernel$", "row"),
    (r".*/fusion/fc1/kernel$", "col"),
    (r".*/fusion/fc1/bias$", "col_bias"),
    (r".*/fusion/fc2/kernel$", "row"),
]


def _spec_for(kind: str, ndim: int) -> P:
    """Shard the minor (column) or second-minor (row) matmul dim; any
    leading axes (scan depth) stay unsharded."""
    lead = (None,) * (ndim - 2)
    if kind == "col":
        return P(*lead, None, MODEL_AXIS) if ndim >= 2 else P(MODEL_AXIS)
    if kind == "row":
        return P(*lead, MODEL_AXIS, None) if ndim >= 2 else P()
    if kind == "col_bias":
        return P(*((None,) * (ndim - 1)), MODEL_AXIS)
    raise ValueError(kind)


def tp_param_specs(variables: Dict, rules=None) -> Dict:
    """PartitionSpec pytree matching ``variables`` under the TP rules."""
    rules = rules if rules is not None else DEFAULT_TP_RULES
    flat = traverse_util.flatten_dict(variables)
    specs = {}
    for path, value in flat.items():
        key = "/".join(str(p) for p in path)
        spec = P()
        ndim = np.ndim(value)
        for pattern, kind in rules:
            if re.match(pattern, key):
                spec = _spec_for(kind, ndim)
                break
        specs[path] = spec
    return traverse_util.unflatten_dict(specs)


def tp_shardings(variables: Dict, mesh: Mesh, rules=None) -> Dict:
    """NamedSharding pytree for the TP layout (replicated over ``data``),
    with the divisibility guard applied: a dim not divisible by the
    model-axis size falls back to replication.  Works on shape-carrying
    leaves (arrays or ShapeDtypeStructs), so it can also serve as a jit
    ``out_shardings`` tree."""
    model_size = mesh.shape[MODEL_AXIS]
    specs = tp_param_specs(variables, rules)

    def guard(value, spec):
        shape = getattr(value, "shape", ())
        for axis_idx, name in enumerate(spec):
            if name == MODEL_AXIS and shape[axis_idx] % model_size:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    flat_v = traverse_util.flatten_dict(variables)
    flat_s = traverse_util.flatten_dict(specs)
    return traverse_util.unflatten_dict(
        {k: guard(v, flat_s[k]) for k, v in flat_v.items()})


def shard_variables(variables: Dict, mesh: Mesh, rules=None) -> Dict:
    """Place every param with its TP sharding (multi-process safe via
    :func:`put_global`)."""
    return jax.tree.map(put_global, variables,
                        tp_shardings(variables, mesh, rules))


# ---------------------------------------------------------------- FSDP

def fsdp_param_specs(variables: Dict, mesh: Mesh,
                     min_size: int = 1024) -> Dict:
    """ZeRO-3-style fully-sharded specs: each large parameter shards its
    largest ``data``-divisible dimension over the DATA axis, so per-device
    parameter + optimizer memory scales as 1/data_parallel_size. XLA's SPMD
    partitioner inserts the per-use all-gather (forward/backward) and keeps
    gradient reduction + the AdamW update sharded — the classic FSDP
    schedule, expressed purely as placement (no wrapper modules, no
    hand-written collectives; contrast torch FSDP's module wrappers).

    Leaves smaller than ``min_size`` elements (biases, LN scales) replicate:
    sharding them saves nothing and adds collective launches.
    """
    data = mesh.shape[DATA_AXIS]
    flat = traverse_util.flatten_dict(variables)
    specs = {}
    for path, value in flat.items():
        # .shape-attr access (not np.shape): the tree may carry
        # ShapeDtypeStructs when building a jit out_shardings tree
        shape = tuple(getattr(value, "shape", ()) or ())
        size = int(np.prod(shape)) if shape else 1
        spec = P()
        if data > 1 and size >= min_size:
            divisible = [i for i, d in enumerate(shape) if d and d % data == 0]
            if divisible:
                axis = max(divisible, key=lambda i: shape[i])
                parts = [None] * len(shape)
                parts[axis] = DATA_AXIS
                spec = P(*parts)
        specs[path] = spec
    return traverse_util.unflatten_dict(specs)


def fsdp_shardings(variables: Dict, mesh: Mesh,
                   min_size: int = 1024) -> Dict:
    """NamedSharding pytree of :func:`fsdp_param_specs`."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        fsdp_param_specs(variables, mesh, min_size),
                        is_leaf=lambda s: isinstance(s, P))


def fsdp_shard_variables(variables: Dict, mesh: Mesh,
                         min_size: int = 1024) -> Dict:
    """Place every param with its FSDP sharding (multi-process safe via
    :func:`put_global`)."""
    return jax.tree.map(put_global, variables,
                        fsdp_shardings(variables, mesh, min_size))
