"""GPipe-style pipeline parallelism over the ViT encoder depth.

The reference is single-GPU with no distributed code at all (SURVEY.md
§2.3); this framework already provides data parallelism (`parallel/mesh.py`)
and Megatron tensor parallelism (`parallel/sharding.py`).  This module adds
the third classical axis — PIPELINE parallelism — as a first-class mesh
capability, expressed the idiomatic TPU way:

- the scanned encoder's stacked ``(depth, ...)`` block params shard on
  their leading axis over a ``stage`` mesh axis (no parameter reshaping:
  each stage's shard IS its contiguous block slice);
- the GPipe schedule is a single ``lax.scan`` over ``M + S - 1`` ticks
  inside ``jax.shard_map``; stage boundaries are ``lax.ppermute`` hops that
  ride ICI;
- ``jax.grad`` differentiates straight through it — the scan transpose
  yields the mirrored reverse pipeline (backward microbatches flow last
  stage -> first over the inverse permutation), so a pipelined TRAIN step
  needs no hand-written schedule.

At this project's model scale (23–110M params) pipeline parallelism is
never *needed* — a v5e chip holds hundreds of these models — so the
production trainer keeps its (data, model) mesh.  The module exists so the
framework's parallelism story is complete (dp / tp / pp; sequence and
expert parallelism are N/A: 197 fixed tokens, no MoE — SURVEY.md §5) and is
validated by forward+gradient parity tests on the 8-virtual-device CPU mesh
(tests/test_parallel.py) and by the multi-chip dryrun.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from dfu_multimodal_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"


def make_pp_mesh(data: int, stage: int, devices=None) -> Mesh:
    """A ``(data, stage)`` mesh: batch sharded over ``data``, encoder depth
    pipelined over ``stage``.  Stage neighbours are adjacent in device
    order, so ppermute hops ride single ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = data * stage
    if n > len(devices):
        raise ValueError(f"mesh {data}x{stage} needs {n} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, stage)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def gpipe(stage_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
          local_params: Any, microbatches: jnp.ndarray, *,
          num_stages: int, axis_name: str = STAGE_AXIS) -> jnp.ndarray:
    """Run ``microbatches`` through a ``num_stages``-deep pipeline.

    Must be called INSIDE ``jax.shard_map`` over ``axis_name``:

    - ``stage_apply(local_params, x)`` applies THIS stage's layer slice;
    - ``local_params`` is this stage's parameter shard (leading depth axis
      already sharded away by the shard_map in_spec);
    - ``microbatches`` has shape ``(M, mb, ...)`` and must be identical on
      every stage (only stage 0 reads it).

    Returns the pipeline output, ``(M, mb, ...)``, replicated across the
    stage axis (a psum broadcast from the last stage — negligible next to
    the per-tick activation hops it joins, and it keeps the caller free to
    consume the result on any stage).

    The schedule is plain GPipe: tick ``t`` has stage ``s`` processing
    microbatch ``t - s`` (bubble ticks compute on garbage that is never
    recorded and therefore carries zero gradient).  Total ``M + S - 1``
    ticks; bubble fraction ``(S-1)/(M+S-1)``.
    """
    num_mb = microbatches.shape[0]
    sid = jax.lax.axis_index(axis_name)
    fwd_perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    # The carry varies per stage while the zeros literals don't; mark them
    # device-varying over the stage axis (jax>=0.9 VMA typing rule).
    buf0 = jax.lax.pcast(jnp.zeros_like(microbatches[0]), (axis_name,),
                         to="varying")
    outs0 = jax.lax.pcast(jnp.zeros_like(microbatches), (axis_name,),
                          to="varying")

    def tick(carry, t):
        buf, outs = carry
        feed = jax.lax.dynamic_index_in_dim(
            microbatches, jnp.clip(t, 0, num_mb - 1), 0, keepdims=False)
        x = jnp.where(sid == 0, feed, buf)
        y = stage_apply(local_params, x)
        # The last stage finishes microbatch t-(S-1) at tick t.
        out_idx = jnp.clip(t - (num_stages - 1), 0, num_mb - 1)
        record = jnp.logical_and(sid == num_stages - 1,
                                 t >= num_stages - 1)
        prev = jax.lax.dynamic_index_in_dim(outs, out_idx, 0,
                                            keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(record, y, prev), out_idx, 0)
        buf = jax.lax.ppermute(y, axis_name, fwd_perm)
        return (buf, outs), None

    (_, outs), _ = jax.lax.scan(
        tick, (buf0, outs0), jnp.arange(num_mb + num_stages - 1))
    # Broadcast the last stage's result to all stages (provably replicated,
    # so shard_map out_specs may omit the stage axis).
    outs = jnp.where(sid == num_stages - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, axis_name)


def vit_pipeline_fn(mesh: Mesh, *, depth: int, num_heads: int = 12,
                    mlp_ratio: int = 4, num_microbatches: int = 2,
                    dtype: Any = jnp.float32, patch_size: int = 16,
                    attention_impl: str = "xla",
                    block_impl: str = "flax") -> Callable:
    """Build ``f(trunk_params, images) -> cls_features`` with the encoder
    blocks GPipe-pipelined over the mesh's ``stage`` axis and the batch
    sharded over ``data``.

    ``trunk_params`` is a scanned ViT trunk tree (models/vit.py::ViT with
    ``scan_blocks=True``): patch_embed / cls_token / pos_embed / encoder
    (stacked ``(depth, ...)`` leaves) / norm.  Patch embedding and the
    final LayerNorm are tiny next to the blocks and run replicated across
    ``stage`` (sharded over ``data``) outside the pipeline; they reuse the
    exact flax modules of the ViT so numerics match the plain forward
    bit-for-bit.

    The pipelined program differentiates: ``jax.grad`` of a loss through
    the returned function yields the reversed-pipeline backward schedule
    automatically (see module docstring).
    """
    from dfu_multimodal_tpu.models.vit import (EncoderBlock,
                                               FusedEncoderBlock)

    num_stages = mesh.shape[STAGE_AXIS]
    if depth % num_stages:
        raise ValueError(f"depth {depth} not divisible by "
                         f"{num_stages} pipeline stages")
    if block_impl == "flax":
        block = EncoderBlock(num_heads, mlp_ratio, dtype, attention_impl)
    elif block_impl in ("fused", "fused_interpret"):
        block = FusedEncoderBlock(num_heads, mlp_ratio, dtype,
                                  block_impl == "fused_interpret")
    else:
        raise ValueError(f"unknown block impl: {block_impl!r}")

    def stage_apply(stack, x):
        def body(c, p):
            y, _ = block.apply({"params": p}, c, None)
            return y, None
        y, _ = jax.lax.scan(body, x, stack)
        return y

    def pipeline_body(enc_params, tokens):
        # tokens: this data-shard's (B_local, N, C); split into microbatches
        b, n, c = tokens.shape
        if b % num_microbatches:
            raise ValueError(f"local batch {b} not divisible by "
                             f"{num_microbatches} microbatches")
        mb = tokens.reshape(num_microbatches, b // num_microbatches, n, c)
        out = gpipe(stage_apply, enc_params, mb, num_stages=num_stages)
        return out.reshape(b, n, c)

    def fn(trunk_params, images):
        hidden = trunk_params["patch_embed"]["kernel"].shape[-1]
        b, h, w, ch = images.shape
        p = patch_size
        gh, gw = h // p, w // p
        # Patch embedding — same ops/modules as ViT.__call__ (vit.py:499).
        x = images.astype(dtype)
        x = x.reshape(b, gh, p, gw, p, ch).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * ch)
        x = nn.Dense(hidden, dtype=dtype, param_dtype=jnp.float32).apply(
            {"params": trunk_params["patch_embed"]}, x)
        cls = jnp.broadcast_to(trunk_params["cls_token"],
                               (b, 1, hidden)).astype(dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + trunk_params["pos_embed"].astype(dtype)

        enc_specs = jax.tree.map(
            lambda a: P(STAGE_AXIS, *([None] * (a.ndim - 1))),
            trunk_params["encoder"])
        pp = jax.shard_map(
            pipeline_body, mesh=mesh,
            in_specs=(enc_specs, P(DATA_AXIS, None, None)),
            out_specs=P(DATA_AXIS, None, None))
        x = pp(trunk_params["encoder"], x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=dtype,
                         param_dtype=jnp.float32).apply(
            {"params": trunk_params["norm"]}, x)
        return x[:, 0].astype(jnp.float32)

    return fn
