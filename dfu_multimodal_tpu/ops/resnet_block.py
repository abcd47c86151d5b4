"""Fused ResNet bottleneck kernel (Pallas, TPU) — OPT-IN alternative path.

MEASURED OUTCOME (b128, v5e, docs/DESIGN.md): XLA's eval-mode conv blocks
already sit at the HBM roofline (a 28x28x512 bottleneck runs in 0.27 ms =
its exact read+write bound — XLA fuses BN/ReLU/residual into its conv
epilogues), and this kernel's 3x3-as-9-shifted-matmuls decomposition pays
a 2-4x MXU-efficiency penalty (K=64/N=64 half-lane matmuls + roll/mask
VPU traffic that does not hide under such small MXU ops).  The default
ResNet path therefore stays on XLA convs (models/resnet.py block_impl
"auto" -> "flax"); this kernel remains available (block_impl="fused") as
a correctness-tested substrate for future WHOLE-STAGE fusion, where
chaining several blocks in VMEM could amortize its compute overhead
against 2 fewer HBM round-trips per block.

This kernel computes one whole stride-1 bottleneck block
(reference torchvision Bottleneck, used by notebooks/train_rgb_only.py:200)
with every intermediate VMEM-resident:

    out = relu( bn3(conv3(relu(bn2(conv2(relu(bn1(conv1(x)))))))) + sc(x) )

where sc is identity or a 1x1 projection (stage1 block0).  HBM sees one
read of x, one read of the (BN-folded, bf16-cast) weights — constant index
maps keep them VMEM-resident across the batch grid — and one write of the
output.

TPU-native layout: activations are (rows, C) with rows = image-major
flattened H*W (a FREE reshape of NHWC in HBM).  The 3x3 conv is 9
shifted matmuls: for tap (dy, dx) the contribution is

    mask(dy,dx) * roll(y1, -(dy*W + dx))  @  w2[dy, dx]

`pltpu.roll` is a VMEM sublane rotate (no HBM traffic); the mask zeroes
rows whose (dy, dx) neighbour falls outside the image (including rows that
wrap across image boundaries when several images share one grid step).
Batch-norm is an affine per-channel op at eval time, folded into the conv
weights/biases OUTSIDE the kernel (models/resnet.py::FusedBottleneck) —
inside the step it costs nothing.

Trainable (Grad-CAM differentiates the serving forward): the custom VJP
rematerializes through a plain-jnp oracle with identical numerics, so no
forward intermediate is ever saved to HBM.  Training itself uses the flax
path (BN batch statistics need the unfused graph).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = ((-1, -1), (-1, 0), (-1, 1),
         (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1))


def _conv3x3_rows(y1, width, height, w2_ref):
    """3x3 same-padding conv on image-major flattened rows via 9 shifted
    matmuls.  y1: (rows, Cmid) compute dtype; w2_ref: (9*Cmid, Cmid).
    Returns fp32 (rows, Cmid)."""
    rows, cmid = y1.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col = jax.lax.rem(i, width)
    row = jax.lax.rem(jax.lax.div(i, width), height)

    # Mosaic's sublane rotate only handles 32-bit element types, so the
    # shifts run on an fp32 copy; the cast back to compute dtype fuses with
    # the mask select.
    y1f = y1.astype(jnp.float32)
    acc = jnp.zeros((rows, cmid), jnp.float32)
    for t, (dy, dx) in enumerate(_TAPS):
        shift = dy * width + dx
        shifted = pltpu.roll(y1f, (-shift) % rows, 0) if shift else y1f
        mask = ((col + dx >= 0) & (col + dx < width)
                & (row + dy >= 0) & (row + dy < height))
        masked = jnp.where(mask, shifted,
                           jnp.zeros_like(shifted)).astype(y1.dtype)
        acc = acc + jax.lax.dot_general(
            masked, w2_ref[t * cmid:(t + 1) * cmid, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _ident_block_body(x, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, *,
                      height: int, width: int):
    """One identity-shortcut bottleneck on VMEM-resident rows; returns the
    new (rows, C) activation in compute dtype."""
    y1 = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[0].astype(jnp.float32), 0.0).astype(x.dtype)

    y2 = _conv3x3_rows(y1, width, height, w2_ref)
    y2 = jnp.maximum(y2 + b2_ref[0].astype(jnp.float32), 0.0).astype(x.dtype)

    y3 = jax.lax.dot_general(
        y2, w3_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # residual add in compute dtype — matches the flax path, and halves the
    # fp32 VMEM pressure of the widest (rows, 4*Cmid) tensors
    y3 = (y3 + b3_ref[0].astype(jnp.float32)).astype(x.dtype)
    return jnp.maximum(x + y3, jnp.zeros_like(x))


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       o_ref, *, height: int, width: int):
    """Identity-shortcut bottleneck: Cin == Cout == 4*Cmid."""
    o_ref[...] = _ident_block_body(x_ref[...], w1_ref, b1_ref, w2_ref,
                                   b2_ref, w3_ref, b3_ref, height=height,
                                   width=width)


def _stage_kernel(*refs, height: int, width: int, nblocks: int):
    """WHOLE-STAGE fusion: ``nblocks`` identity bottlenecks chained with
    every inter-block activation VMEM-resident — HBM sees one read of x,
    one read of each block's folded weights, one write of the output
    (2*(nblocks-1) fewer activation round-trips than per-block calls)."""
    x_ref, o_ref = refs[0], refs[-1]
    wrefs = refs[1:-1]
    x = x_ref[...]
    for k in range(nblocks):
        x = _ident_block_body(x, *wrefs[6 * k:6 * (k + 1)], height=height,
                              width=width)
    o_ref[...] = x


def _bottleneck_proj_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                            b3_ref, wd_ref, bd_ref, o_ref, *, height: int,
                            width: int):
    """Projection-shortcut (1x1, stride 1) bottleneck: stage1 block0."""
    x = x_ref[...]
    y1 = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[0].astype(jnp.float32), 0.0).astype(x.dtype)

    y2 = _conv3x3_rows(y1, width, height, w2_ref)
    y2 = jnp.maximum(y2 + b2_ref[0].astype(jnp.float32), 0.0).astype(x.dtype)

    y3 = jax.lax.dot_general(
        y2, w3_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y3 = (y3 + b3_ref[0].astype(jnp.float32)).astype(x.dtype)

    sc = jax.lax.dot_general(
        x, wd_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sc = (sc + bd_ref[0].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = jnp.maximum(sc + y3, jnp.zeros_like(sc))


def _bottleneck_ref(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, *,
                    height, width):
    """Plain-jnp oracle with the kernel's numerics (fp32 accumulation,
    compute-dtype intermediates/residual).  x: (B, H, W, Cin); w2 is the
    kernel's (9*Cmid, Cmid) row-stacked 3x3.  Doubles as the custom-VJP
    rematerialized backward and the CPU/interpret test oracle."""
    b, h, w, cin = x.shape
    cmid = w1.shape[1]
    y1 = jnp.einsum("bhwc,cm->bhwm", x, w1,
                    preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    w2k = w2.reshape(3, 3, cmid, cmid)
    y2 = jax.lax.conv_general_dilated(
        y1, w2k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y2 = jnp.maximum(y2 + b2.astype(jnp.float32), 0.0).astype(x.dtype)
    y3 = jnp.einsum("bhwc,cm->bhwm", y2, w3,
                    preferred_element_type=jnp.float32)
    y3 = (y3 + b3.astype(jnp.float32)).astype(x.dtype)
    if wd is None:
        sc = x
    else:
        sc = jnp.einsum("bhwc,cm->bhwm", x, wd,
                        preferred_element_type=jnp.float32)
        sc = (sc + bd.astype(jnp.float32)).astype(x.dtype)
    return jnp.maximum(sc + y3, jnp.zeros_like(sc))


def _pick_ipp(batch: int, hw: int, cout: int) -> int:
    """Images per grid step: the largest divisor of batch whose row count
    keeps the widest fp32 intermediates — (rows, cout) before the residual
    cast — inside the scoped-VMEM budget."""
    max_rows = min(4096, (12 * 1024 * 1024) // (4 * cout))
    ipp = max(1, max_rows // hw)
    while batch % ipp:
        ipp -= 1
    return ipp


from dfu_multimodal_tpu.ops.pallas_common import (const_spec as
                                                   _const_spec,
                                                   vmem as _vmem)


def _call(x, weights, kernel, height, width, cout, interpret):
    b = x.shape[0]
    hw = height * width
    ipp = _pick_ipp(b, hw, cout)
    xf = x.reshape(b * hw, x.shape[-1])          # free reshape in HBM

    def row_block(i):
        return (i, 0)

    rows = ipp * hw
    in_specs = [pl.BlockSpec((rows, x.shape[-1]), row_block,
                             memory_space=_vmem(interpret))]
    for wgt in weights:
        in_specs.append(_const_spec(wgt.shape, interpret))

    cmid = weights[0].shape[1]
    flops = 2 * b * hw * (x.shape[-1] * cmid + 9 * cmid * cmid
                          + cmid * cout)
    out = pl.pallas_call(
        functools.partial(kernel, height=height, width=width),
        grid=(b // ipp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, cout), row_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((b * hw, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + b * hw * cout) * x.dtype.itemsize,
            transcendentals=0),
        # stage1's 3136-row blocks need ~19 MB of scoped VMEM for the fp32
        # conv intermediates — above the 16 MB default, well under the
        # 128 MB physical VMEM of v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xf, *weights)
    return out.reshape(b, height, width, cout)


def _ident_call(x, w1, b1, w2, b2, w3, b3, interpret):
    b, h, w, c = x.shape
    weights = (w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
               w3, b3.reshape(1, -1))
    return _call(x, weights, _bottleneck_kernel, h, w, c, interpret)


def _proj_call(x, w1, b1, w2, b2, w3, b3, wd, bd, interpret):
    b, h, w, _ = x.shape
    cout = w3.shape[1]
    weights = (w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
               w3, b3.reshape(1, -1), wd, bd.reshape(1, -1))
    return _call(x, weights, _bottleneck_proj_kernel, h, w, cout, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret):
    return _ident_call(x, w1, b1, w2, b2, w3, b3, interpret)


def _fb_fwd(x, w1, b1, w2, b2, w3, b3, interpret):
    return (_ident_call(x, w1, b1, w2, b2, w3, b3, interpret),
            (x, w1, b1, w2, b2, w3, b3))


def _fb_bwd(interpret, res, g):
    x = res[0]
    _, vjp = jax.vjp(
        functools.partial(_bottleneck_ref, height=x.shape[1],
                          width=x.shape[2]), *res)
    return vjp(g)


_fused_bottleneck.defvjp(_fb_fwd, _fb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_bottleneck_proj(x, w1, b1, w2, b2, w3, b3, wd, bd, interpret):
    return _proj_call(x, w1, b1, w2, b2, w3, b3, wd, bd, interpret)


def _fbp_fwd(x, w1, b1, w2, b2, w3, b3, wd, bd, interpret):
    return (_proj_call(x, w1, b1, w2, b2, w3, b3, wd, bd, interpret),
            (x, w1, b1, w2, b2, w3, b3, wd, bd))


def _fbp_bwd(interpret, res, g):
    x = res[0]
    _, vjp = jax.vjp(
        functools.partial(_bottleneck_ref, height=x.shape[1],
                          width=x.shape[2]), *res)
    return vjp(g)


_fused_bottleneck_proj.defvjp(_fbp_fwd, _fbp_bwd)


def _stage_call(x, block_weights, interpret):
    b, h, w, c = x.shape
    hw = h * w
    ipp = _pick_ipp(b, hw, c)
    xf = x.reshape(b * hw, c)

    def row_block(i):
        return (i, 0)

    rows = ipp * hw
    in_specs = [pl.BlockSpec((rows, c), row_block,
                             memory_space=_vmem(interpret))]
    flat = []
    for (w1, b1, w2, b2, w3, b3) in block_weights:
        for g in (w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                  w3, b3.reshape(1, -1)):
            in_specs.append(_const_spec(g.shape, interpret))
            flat.append(g)
    cmid = block_weights[0][0].shape[1]
    n = len(block_weights)
    flops = 2 * b * hw * n * (c * cmid + 9 * cmid * cmid + cmid * c)
    out = pl.pallas_call(
        functools.partial(_stage_kernel, height=h, width=w, nblocks=n),
        grid=(b // ipp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c), row_block,
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((b * hw, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + b * hw * c) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xf, *flat)
    return out.reshape(b, h, w, c)


def _stage_ref(x, block_weights):
    for (w1, b1, w2, b2, w3, b3) in block_weights:
        x = _bottleneck_ref(x, w1, b1, w2, b2, w3, b3,
                            height=x.shape[1], width=x.shape[2])
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_stage(x, block_weights, interpret):
    return _stage_call(x, block_weights, interpret)


def _fstage_fwd(x, block_weights, interpret):
    return _stage_call(x, block_weights, interpret), (x, block_weights)


def _fstage_bwd(interpret, res, g):
    x, block_weights = res
    _, vjp = jax.vjp(_stage_ref, x, block_weights)
    return vjp(g)


_fused_stage.defvjp(_fstage_fwd, _fstage_bwd)


def fused_stage(x: jnp.ndarray, blocks, interpret: bool = False
                ) -> jnp.ndarray:
    """WHOLE-STAGE fusion experiment (ROADMAP item 5 / round-1 VERDICT
    next #6): chain the stride-1 identity bottlenecks of one ResNet stage
    inside ONE Pallas kernel, amortizing the per-block kernel's measured
    MXU inefficiency (docs/DESIGN.md) against 2*(len(blocks)-1) fewer HBM
    activation round-trips.

    x: (B, H, W, C); ``blocks``: sequence of (w1, b1, w2, b2, w3, b3)
    BN-folded weight tuples, each an identity-shortcut bottleneck with
    Cin == Cout == C (reference torchvision layerN blocks 1.., used by
    notebooks/train_rgb_only.py:200).  Trainable (rematerializing VJP).
    """
    return _fused_stage(x, tuple(tuple(bw) for bw in blocks), interpret)


def fused_bottleneck(x: jnp.ndarray,
                     w1: jnp.ndarray, b1: jnp.ndarray,
                     w2: jnp.ndarray, b2: jnp.ndarray,
                     w3: jnp.ndarray, b3: jnp.ndarray,
                     wd: jnp.ndarray | None = None,
                     bd: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """One stride-1 ResNet bottleneck, VMEM-resident, BN pre-folded.

    x: (B, H, W, Cin) compute dtype.  w1 (Cin, Cmid), w2 (9*Cmid, Cmid)
    row-stacked 3x3 taps, w3 (Cmid, Cout) — BN-folded and cast to the
    compute dtype; biases fp32.  wd/bd: optional 1x1 projection shortcut.
    Trainable (rematerializing custom VJP).
    """
    if wd is None:
        return _fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret)
    return _fused_bottleneck_proj(x, w1, b1, w2, b2, w3, b3, wd, bd,
                                  interpret)
