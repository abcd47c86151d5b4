"""Device mesh construction and sharding rules.

The reference is single-GPU (``DEVICE = cuda if available else cpu``,
reference notebooks/train_rgb_only.py:32) with no distributed code at all
(SURVEY.md §2.3).  Here data parallelism is first-class: a 2-D
``(data, model)`` mesh where the batch is sharded over ``data`` (ICI within a
slice) and parameters are replicated.  Gradient reduction needs no explicit
``psum`` — ``jit`` over sharded batch + replicated-params output shardings
makes XLA insert the all-reduce over ICI automatically.  The ``model`` axis
exists so tensor-parallel layouts can be expressed later without reshaping
the mesh (SURVEY.md §2.3: "leave room for a model axis"); at the 25M–110M
parameter scale of these classifiers it stays 1.

Multi-host: per-process data loading is sharded by ``jax.process_index``
(data/loader.py); device order within the mesh follows jax.devices() so DP
collectives ride ICI before DCN.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfu_multimodal_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = cfg.data if cfg.data > 0 else max(1, n // cfg.model)
    used = data * cfg.model
    if used > n:
        raise ValueError(f"mesh {data}x{cfg.model} needs {used} devices, "
                         f"have {n}")
    grid = np.asarray(devices[:used]).reshape(data, cfg.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_mesh(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= requested that divides evenly over ``data``."""
    d = mesh.shape[DATA_AXIS]
    return ((batch_size + d - 1) // d) * d


def process_shard(n: int) -> Tuple[int, int]:
    """(start, stop) of this process's slice of a length-``n`` batch for
    multi-host loading (each host feeds only its addressable shard)."""
    pi, pc = jax.process_index(), jax.process_count()
    per = n // pc
    return pi * per, (pi + 1) * per if pi < pc - 1 else n
