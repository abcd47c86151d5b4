"""Shared Pallas BlockSpec helpers used by every fused kernel module.

One definition of the interpret-aware memory-space convention: real TPU
compiles pin operands in VMEM; the Pallas interpreter (CPU numerics
tests) takes ``pl.ANY`` because it has no VMEM to pin.  Previously each
ops module carried its own copy of these two helpers and they had
started to drift (fused_mlp hard-coded VMEM); a convention change now
lands in exactly one place.
"""

from __future__ import annotations

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def vmem(interpret: bool):
    """Operand memory space: VMEM on hardware, ANY under the
    interpreter."""
    return pl.ANY if interpret else pltpu.VMEM


def const_spec(shape, interpret: bool) -> pl.BlockSpec:
    """Whole-array operand with a constant index map: Pallas loads it
    into VMEM once and keeps it resident across all grid steps."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=vmem(interpret))
