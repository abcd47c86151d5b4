"""Device-side image transform pipeline (pure jit-able functions).

The reference augments on the host with torchvision PIL ops inside DataLoader
worker processes (reference notebooks/train_rgb_only.py:102-111,
train_thermal_only.py:103-112, scripts/dataloader.py:136-196).  Here the host
only decodes and resizes once; augmentation runs *on device inside the jitted
train step* on uint8 batches:

- all geometric ops (h/v flip, rotation ±30°, random affine ±20° /
  translate 0.1 / scale 0.8-1.2) compose into a SINGLE 3x3 matrix per sample
  and execute as one bilinear resample — one gather pass instead of
  torchvision's four sequential PIL warps;
- photometric ops (brightness/contrast/saturation jitter, Gaussian blur) are
  vectorized elementwise/conv ops XLA fuses into the surrounding step;
- normalization maps uint8 -> (x/255 - mean)/std in the model compute dtype.

Randomness is JAX PRNG: one key per batch, split per sample, fully
reproducible and mesh-shardable (each data-parallel shard consumes its own
fold of the key).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.config import AugmentConfig, ModalityConfig


def normalize(images: jnp.ndarray, mean: Tuple[float, ...],
              std: Tuple[float, ...], dtype=jnp.float32) -> jnp.ndarray:
    """uint8/float [0,255] NHWC -> normalized float NHWC."""
    x = images.astype(jnp.float32) / 255.0
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return ((x - m) / s).astype(dtype)


def _rot_mat(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _scale_mat(sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([[sx, 0.0, 0.0], [0.0, sy, 0.0], [0.0, 0.0, 1.0]])


def _translate_mat(tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([[1.0, 0.0, tx], [0.0, 1.0, ty], [0.0, 0.0, 1.0]])


def sample_inverse_affine(key: jax.Array, cfg: AugmentConfig,
                          height: int, width: int) -> jnp.ndarray:
    """Draw one random geometric transform; return the INVERSE 3x3 matrix
    mapping output pixel coords (centered) to input coords."""
    k = jax.random.split(key, 8)
    deg = math.pi / 180.0

    hflip = jax.random.bernoulli(k[0], cfg.horizontal_flip_prob)
    vflip = jax.random.bernoulli(k[1], cfg.vertical_flip_prob)
    theta1 = jax.random.uniform(
        k[2], minval=-cfg.rotation_degrees, maxval=cfg.rotation_degrees) * deg

    apply_affine = jnp.logical_and(
        jnp.asarray(cfg.affine), jax.random.bernoulli(k[3], cfg.aug_prob))
    theta2 = jnp.where(
        apply_affine,
        jax.random.uniform(k[4], minval=-cfg.affine_degrees,
                           maxval=cfg.affine_degrees) * deg, 0.0)
    tx = jnp.where(
        apply_affine,
        jax.random.uniform(k[5], minval=-cfg.affine_translate,
                           maxval=cfg.affine_translate) * width, 0.0)
    ty = jnp.where(
        apply_affine,
        jax.random.uniform(k[6], minval=-cfg.affine_translate,
                           maxval=cfg.affine_translate) * height, 0.0)
    lo, hi = cfg.affine_scale
    scale = jnp.where(apply_affine,
                      jax.random.uniform(k[7], minval=lo, maxval=hi), 1.0)

    # Forward: flip -> rotate(theta1) -> affine(rotate theta2, scale,
    # translate).  Inverse composes in reverse with each op inverted.
    inv_flip = _scale_mat(jnp.where(hflip, -1.0, 1.0),
                          jnp.where(vflip, -1.0, 1.0))     # self-inverse
    inv_rot1 = _rot_mat(-theta1)
    inv_aff = (_scale_mat(1.0 / scale, 1.0 / scale)
               @ _rot_mat(-theta2) @ _translate_mat(-tx, -ty))
    return inv_flip @ inv_rot1 @ inv_aff


def affine_warp(image: jnp.ndarray, inv_matrix: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of one (H, W, C) float image about its center.
    Out-of-bounds samples fill with 0 (torchvision's default fill).

    TPU note: gathers are index-count bound, so the four bilinear corners
    are packed into ONE wide-row table (shift the image right/down/both and
    concatenate on the channel axis): a single gather at (y0, x0) returns
    all four corner pixels.  4x fewer gather indices than the naive
    4-corner formulation — measured ~4x faster on v5e.  Shift padding
    introduces zeros exactly where the corner is out of range, which the
    validity masks zero anyway.
    """
    h, w, c = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    dtype = image.dtype if image.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    img = image.astype(dtype)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_x = inv_matrix[0, 0] * xx + inv_matrix[0, 1] * yy + inv_matrix[0, 2] + cx
    src_y = inv_matrix[1, 0] * xx + inv_matrix[1, 1] * yy + inv_matrix[1, 2] + cy

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = (src_x - x0)[..., None].astype(dtype)
    wy = (src_y - y0)[..., None].astype(dtype)

    # corner-packed table: lanes = [p00 | p01 | p10 | p11]
    right = jnp.pad(img[:, 1:], ((0, 0), (0, 1), (0, 0)))
    down = jnp.pad(img[1:], ((0, 1), (0, 0), (0, 0)))
    downright = jnp.pad(img[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    table = jnp.concatenate([img, right, down, downright],
                            axis=-1).reshape(h * w, 4 * c)

    in_y = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 >= -1) & (y0 <= h - 2)
    in_x = (x0 >= 0) & (x0 <= w - 1)
    in_x1 = (x0 >= -1) & (x0 <= w - 2)

    yc = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    rows = jnp.take(table, yc * w + xc, axis=0).reshape(h, w, 4, c)

    def corner(idx, valid):
        return jnp.where(valid[..., None], rows[:, :, idx], 0)

    # clipping moves an out-of-range (y0,x0) onto a border pixel whose
    # packed neighbors are real pixels — every corner needs its own
    # validity mask, incl. the clip-shift cases (e.g. x0=-1 clips to 0, so
    # lane p00 actually holds the x=0 pixel that belongs to corner p01).
    shifted_x = (x0 < 0) & in_x1        # clipped left: lanes shift by one
    shifted_y = (y0 < 0) & in_y1
    p00 = corner(0, in_y & in_x & ~shifted_x & ~shifted_y)
    p01 = jnp.where((shifted_x & in_y & ~shifted_y)[..., None],
                    rows[:, :, 0], corner(1, in_y & in_x1 & ~shifted_y))
    p10 = jnp.where((shifted_y & in_x & ~shifted_x)[..., None],
                    rows[:, :, 0], corner(2, in_y1 & in_x & ~shifted_x))
    p11 = jnp.where((shifted_x & shifted_y)[..., None], rows[:, :, 0],
                    jnp.where((shifted_x & in_y1)[..., None], rows[:, :, 2],
                              jnp.where((shifted_y & in_x1)[..., None],
                                        rows[:, :, 1],
                                        corner(3, in_y1 & in_x1))))

    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return (top * (1 - wy) + bot * wy).astype(image.dtype
                                              if image.dtype != jnp.uint8
                                              else jnp.float32)


def dense_warp(image: jnp.ndarray, inv_matrix: jnp.ndarray) -> jnp.ndarray:
    """Bilinear affine warp with ZERO gathers: Catmull–Smith two-pass dense
    resample.  Same contract as :func:`affine_warp` (centered inverse
    matrix, fill 0 outside).

    TPU rationale: the gather formulation is index-count bound (~7 ns/index
    → 11.3 ms of a 13.9 ms b32 augmentation, docs/DESIGN.md "warp-gather
    negative results" — two *gather* redesigns already failed).  This
    escapes the bound entirely: each pass contracts a dense tent-weight
    matrix against the rows/columns (relu(1-|u-i|) built by the VPU, the
    contraction on the MXU), so the cost is dense flops, not index rate.

    Pass 1 resamples every source row horizontally at
    u(xo, yi) = (a - b·c/d)·xo + (b/d)·yi + const; pass 2 resamples every
    column vertically at v(xo, yo) = c·xo + d·yo + f.  Requires |d| (the
    y-y coefficient) bounded away from 0 — true for this config's worst
    case (±50° total rotation, scale ≤1.25 → |d| ≥ 0.53).  For axis-aligned
    transforms (flips/translate/scale, b=c=0) the result is EXACTLY direct
    bilinear; with rotation the two-pass interpolates along the rotated
    axes instead of the output axes — an equally valid bilinear
    reconstruction (classic hardware warp), tested within tolerance of
    :func:`affine_warp` on smooth images.

    Out-of-range handling: a tap outside [0, W-1] simply has no tent
    column, so its weight is dropped — identical to the gather path's
    per-corner validity masking (fill 0).
    """
    h, w, c = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    dtype = image.dtype if image.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    img = image.astype(dtype)

    m = inv_matrix.astype(jnp.float32)
    a, b = m[0, 0], m[0, 1]
    cc, d = m[1, 0], m[1, 1]
    # absolute-coordinate offsets (centering folded in)
    e = m[0, 2] + cx - a * cx - b * cy
    f = m[1, 2] + cy - cc * cx - d * cy

    xs = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)       # (1, W)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)       # (H, 1)

    # pass 1: horizontal resample of each SOURCE row yi at u(xo, yi)
    u = (a - b * cc / d) * xs + (b / d) * ys + (e - b * f / d)  # (H, Wo)
    t1 = jnp.maximum(
        0.0, 1.0 - jnp.abs(u[:, :, None] - xs[0][None, None, :]))
    tmp = jax.lax.dot_general(
        t1.astype(dtype), img,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                     # (H, Wo, C)

    # pass 2: vertical resample of each column xo at v(xo, yo)
    v = cc * xs + d * ys + f                                    # (Ho, W)
    t2 = jnp.maximum(
        0.0, 1.0 - jnp.abs(v.T[:, :, None] - ys[:, 0][None, None, :]))
    out = jax.lax.dot_general(
        t2.astype(dtype), tmp.astype(dtype).transpose(1, 0, 2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                     # (W, Ho, C)
    return out.transpose(1, 0, 2).astype(
        image.dtype if image.dtype != jnp.uint8 else jnp.float32)


def dense_warp_safe(cfg: AugmentConfig) -> bool:
    """True when every transform ``cfg`` can draw keeps dense_warp's y-y
    inverse coefficient d = cos(theta_total)/scale bounded away from 0.
    The worst case is full rotation + full affine rotation at max zoom;
    past ~|d| < 0.2 the b/d, c/d factorization amplifies rounding and at
    theta_total -> 90 deg it divides by zero outright — such configs
    must take the gather path."""
    total = cfg.rotation_degrees + (cfg.affine_degrees if cfg.affine
                                    else 0.0)
    if total >= 89.0:
        return False
    hi = cfg.affine_scale[1] if cfg.affine else 1.0
    return math.cos(total * math.pi / 180.0) / hi >= 0.2


def resolve_warp(impl: str = "auto", cfg: Optional[AugmentConfig] = None):
    """'gather' (affine_warp) | 'dense' (dense_warp) | 'auto' = dense on
    TPU (escapes the gather index-rate bound), gather elsewhere (dense
    flops are the worse trade on CPU).

    ``cfg``: when given, 'auto' additionally requires
    :func:`dense_warp_safe` (a rotation-heavy custom config silently
    producing NaN/black images on TPU but not CPU was the failure mode),
    and an EXPLICIT 'dense' request outside the safe envelope raises."""
    if cfg is not None and not dense_warp_safe(cfg):
        if impl == "dense":
            raise ValueError(
                "dense_warp is numerically unsafe for this AugmentConfig "
                f"(rotation {cfg.rotation_degrees} + affine "
                f"{cfg.affine_degrees if cfg.affine else 0} deg at max "
                f"scale {cfg.affine_scale[1] if cfg.affine else 1.0}): "
                "the inverse y-y coefficient approaches 0. Use "
                "warp_impl='gather'.")
        if impl == "auto":
            return affine_warp
    if impl == "auto":
        impl = "dense" if jax.devices()[0].platform == "tpu" else "gather"
    return dense_warp if impl == "dense" else affine_warp


def _color_jitter(key: jax.Array, image: jnp.ndarray,
                  cfg: AugmentConfig) -> jnp.ndarray:
    """Brightness/contrast/saturation jitter on a [0,255] float image,
    gated per-sample with probability ``aug_prob``."""
    k_apply, kb, kc, ks = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k_apply, cfg.aug_prob)

    b = jnp.where(apply, jax.random.uniform(
        kb, minval=1 - cfg.brightness, maxval=1 + cfg.brightness), 1.0)
    c = jnp.where(apply, jax.random.uniform(
        kc, minval=1 - cfg.contrast, maxval=1 + cfg.contrast), 1.0)
    s = jnp.where(apply, jax.random.uniform(
        ks, minval=1 - cfg.saturation, maxval=1 + cfg.saturation), 1.0)

    def luma(im):
        return (0.299 * im[..., 0] + 0.587 * im[..., 1]
                + 0.114 * im[..., 2])

    x = image * b
    x = luma(x).mean() * (1 - c) + x * c
    # torchvision's adjust_saturation blends against the grayscale of
    # ITS input — i.e. the post-contrast image, so luma is recomputed
    # here rather than reused from before the contrast blend
    x = luma(x)[..., None] * (1 - s) + x * s
    return jnp.clip(x, 0.0, 255.0)


def _gaussian_blur(key: jax.Array, image: jnp.ndarray,
                   cfg: AugmentConfig) -> jnp.ndarray:
    """3-tap separable Gaussian blur with per-sample sigma, gated with
    probability ``aug_prob`` (thermal pipeline, train_thermal_only.py:109)."""
    k_apply, k_sigma = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, cfg.aug_prob)
    lo, hi = cfg.blur_sigma
    sigma = jax.random.uniform(k_sigma, minval=lo, maxval=hi)

    t = jnp.exp(-0.5 / (sigma * sigma))
    kern = jnp.stack([t, 1.0, t])
    kern = kern / jnp.sum(kern)

    # Separable blur as two 1-D convs over H then W (C vectorized).
    padded = jnp.pad(image, ((1, 1), (0, 0), (0, 0)), mode="edge")
    blurred = (padded[:-2] * kern[0] + padded[1:-1] * kern[1]
               + padded[2:] * kern[2])
    padded = jnp.pad(blurred, ((0, 0), (1, 1), (0, 0)), mode="edge")
    blurred = (padded[:, :-2] * kern[0] + padded[:, 1:-1] * kern[1]
               + padded[:, 2:] * kern[2])
    return jnp.where(apply, blurred, image)


def _augment_one(key: jax.Array, image: jnp.ndarray, cfg: AugmentConfig,
                 work_dtype=jnp.float32, warp=None,
                 fill=None) -> jnp.ndarray:
    """Augment a single (H, W, C) uint8 image -> [0,255] float.

    ``work_dtype=bfloat16`` halves the gather/matmul bytes of the warp (the
    augmentation hot spot on TPU); interpolation at bf16 on [0,255] data
    keeps ~2 decimal digits — far inside augmentation noise.

    ``fill``: per-channel constant for out-of-coverage pixels (the warp
    itself fills with 0).  Because the bilinear resample is linear in pixel
    values and maps constants to constants inside coverage,
    ``warp(x - fill) + fill == warp(x) + fill * (1 - coverage)`` exactly —
    a constant fill costs zero extra passes.  Used by the early-files
    lineage whose rotation runs after Normalize (fill = modality mean,
    reference scripts/early files/dataloader.py:123-147)."""
    h, w, _ = image.shape
    k_geom, k_color, k_blur = jax.random.split(key, 3)
    x = image.astype(work_dtype)
    if cfg.color_jitter:
        x = _color_jitter(k_color, x, cfg)
    inv = sample_inverse_affine(k_geom, cfg, h, w)
    warp = warp or affine_warp
    if fill is not None:
        f = jnp.asarray(fill, x.dtype)
        x = warp(x - f, inv) + f
    else:
        x = warp(x, inv)
    if cfg.gaussian_blur:
        x = _gaussian_blur(k_blur, x, cfg)
    return x


@partial(jax.jit, static_argnames=("modality", "dtype", "warp_impl"))
def augment_and_normalize_keys(keys: jax.Array, images: jnp.ndarray,
                               modality: ModalityConfig,
                               dtype=jnp.float32,
                               warp_impl: str = "auto") -> jnp.ndarray:
    """Like :func:`augment_and_normalize` but with the per-row keys
    (B, 2) provided by the caller — the shard_map train step passes each
    shard its slice of the GLOBAL ``jax.random.split(key, B_global)``
    stream, so per-device augmentation is bit-identical to the
    single-program path (train/engine.py)."""
    work = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    warp = resolve_warp(warp_impl, modality.augment)
    fill = (tuple(255.0 * m for m in modality.mean)
            if modality.augment.fill_with_mean else None)
    out = jax.vmap(
        lambda k, im: _augment_one(k, im, modality.augment, work, warp,
                                   fill))(keys, images)
    return normalize(out, modality.mean, modality.std, dtype)


def augment_and_normalize(key: jax.Array, images: jnp.ndarray,
                          modality: ModalityConfig,
                          dtype=jnp.float32,
                          warp_impl: str = "auto") -> jnp.ndarray:
    """Train-time transform: per-sample random augment + normalize.
    ``images``: uint8 (B, H, W, C) -> normalized (B, H, W, C) ``dtype``."""
    return augment_and_normalize_keys(
        jax.random.split(key, images.shape[0]), images, modality, dtype,
        warp_impl)


def augment_and_normalize_spmd(key: jax.Array, images: jnp.ndarray,
                               modality: ModalityConfig,
                               dtype, axis_name: str,
                               n_shards: int) -> jnp.ndarray:
    """Shard_map counterpart of :func:`augment_and_normalize` — call ONLY
    inside a ``jax.shard_map`` body over ``axis_name``: draws each row's
    key from the GLOBAL ``split(key, B_global)`` stream, sliced by this
    shard's position, so per-device augmentation is bit-identical to the
    single-program path.  THE one definition of that recipe — the
    supervised (train/engine.py) and SSL (train/ssl.py) shard_map steps
    both call it, so the streams can never silently diverge."""
    idx = jax.lax.axis_index(axis_name)
    bl = images.shape[0]
    gkeys = jax.random.split(key, bl * n_shards)
    lkeys = jax.lax.dynamic_slice_in_dim(gkeys, idx * bl, bl)
    return augment_and_normalize_keys(lkeys, images, modality, dtype)


@partial(jax.jit, static_argnames=("modality", "dtype"))
def eval_normalize(images: jnp.ndarray, modality: ModalityConfig,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Eval-time transform: normalize only (resize happened at load)."""
    return normalize(images, modality.mean, modality.std, dtype)
