"""Analytic FLOP and device-peak accounting for MFU reporting.

The bench artifact reports "approx MFU" — achieved model FLOP rate over
the chip's peak dense rate.  Both sides of that ratio live here so they
are derived from the ACTUAL run configuration instead of hard-coded
constants (round-2 weakness: bench.py assumed 197 TF/s and 25.9 GF/img
regardless of chip or --token-merge config):

- :func:`device_peak_tflops` maps ``jax.devices()[0].device_kind`` to the
  chip's peak dense bf16 matmul rate (``None`` for unknown kinds / CPU —
  MFU is then reported as null rather than silently wrong).
- :func:`model_forward_flops` computes per-image forward FLOPs for each
  model family from its architecture parameters, including the reduced
  token count of a ToMe (``token_merge``) configuration.

Convention: FLOPs = 2 x MACs (one fused multiply-add = 2 floating-point
operations), the convention peak-rate datasheets use — so the ratio is a
true utilization.  NOTE the round-2 bench used a MIXED convention
(ResNet counted at 2x MACs but ViT at 1x, totalling 25.9 GF/img); this
module counts both at 2x (~43.3 GF/img for the fused pair), so MFU
numbers from round 3 onward are NOT comparable to BENCH_r02's
``approx_serving_mfu_pct`` (docs/DESIGN.md "MFU accounting" records the
change).

Counted: conv/matmul MACs only.  Uncounted (all <1% of total or not
FLOPs at all): normalization, softmax, activations, pooling, the ToMe
bipartite-similarity matmul, device-side augmentation (train), and the
optimizer update.  Train steps are counted with the standard 3x-forward
rule (backward ~ 2x forward for conv/matmul nets).
"""

from __future__ import annotations

from typing import Optional, Tuple

# Peak DENSE bf16 matmul TFLOP/s per chip, by jax device_kind. Sparsity
# modes excluded. Sources: public TPU/GPU datasheets (v4: 275, v5e:
# 197, v5p: 459, v6e "Trillium": 918).
_PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 196.6,
    "TPU v5e": 196.6,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
    "TPU v6": 918.0,
}

# Peak dense INT8 matmul TOP/s per chip: generations whose MXU runs int8
# at 2x the bf16 rate (public datasheets: v5e 394, v5p 918, v6e 1836).
# v4 has no published int8 acceleration — absent here, so int8
# utilization reports null on it rather than a wrong number.
_PEAK_INT8_TOPS = {
    "TPU v5 lite": 393.2,
    "TPU v5e": 393.2,
    "TPU v5": 918.0,
    "TPU v5p": 918.0,
    "TPU v6 lite": 1836.0,
    "TPU v6e": 1836.0,
    "TPU v6": 1836.0,
}


def _lookup_peak(device, table) -> Optional[float]:
    """Shared device_kind -> peak lookup: exact table hit, else tolerate
    vendor suffixes ("TPU v5 lite (chip)", case differences) by matching
    the LONGEST table key first, REFUSING when the remainder names a
    variant we don't know (e.g. 'TPU v4 lite'/v4i is NOT a v4 at its
    full rate; reporting null beats a silently wrong peak)."""
    if device is None:
        import jax
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    if kind in table:
        return table[kind]
    norm = kind.strip().lower()
    for k in sorted(table, key=len, reverse=True):
        if norm.startswith(k.lower()):
            rest = norm[len(k):].strip()
            if "lite" in rest or rest in ("i", "e", "p"):
                return None          # unknown sub-variant of a known gen
            return table[k]
    return None


def device_peak_tflops(device=None) -> Optional[float]:
    """Peak dense bf16 TFLOP/s of ``device`` (default: first visible
    device), or ``None`` when unknown (CPU, new chip generations) — the
    caller should then report MFU as null, never a wrong number."""
    return _lookup_peak(device, _PEAK_BF16_TFLOPS)


def device_peak_int8_tops(device=None) -> Optional[float]:
    """Peak dense int8 TOP/s of ``device``, or ``None`` when unknown —
    same matching/refusal rules as :func:`device_peak_tflops`.  Used for
    the int8 serving path's utilization accounting: the path is MIXED
    precision (int8 matmuls/convs, bf16/fp32 attention + LN/softmax), so
    ops ÷ int8-peak is a LOWER BOUND on how well the int8 work is
    scheduled — honest as a utilization number because the int8 peak is
    the rate the path is paying for."""
    return _lookup_peak(device, _PEAK_INT8_TOPS)


def vit_block_flops(tokens: int, hidden_dim: int = 768,
                    mlp_ratio: int = 4) -> float:
    """One pre-LN transformer block: qkv + attention matmuls + proj +
    2-layer MLP, at 2 FLOPs/MAC."""
    d = hidden_dim
    macs = (tokens * d * 3 * d            # qkv projection
            + 2 * tokens * tokens * d     # scores + weighted sum
            + tokens * d * d              # output projection
            + 2 * mlp_ratio * tokens * d * d)   # fc1 + fc2
    return 2.0 * macs


def vit_flops(image_size: int = 224, patch_size: int = 16,
              depth: int = 12, hidden_dim: int = 768, mlp_ratio: int = 4,
              token_merge: Optional[Tuple[int, int]] = None) -> float:
    """ViT forward FLOPs per image (class token included).  With
    ``token_merge=(L, K)`` blocks 0..L-1 run the full token count and
    the remaining depth-L blocks run K tokens (models/vit.py ToMe)."""
    grid = image_size // patch_size
    tokens = grid * grid + 1
    embed = 2.0 * (grid * grid) * hidden_dim * (patch_size ** 2 * 3)
    if token_merge is not None:
        merge_at, keep = token_merge
        blocks = (merge_at * vit_block_flops(tokens, hidden_dim, mlp_ratio)
                  + (depth - merge_at)
                  * vit_block_flops(keep, hidden_dim, mlp_ratio))
    else:
        blocks = depth * vit_block_flops(tokens, hidden_dim, mlp_ratio)
    return embed + blocks


# conv MACs at 224x224 input, the standard published counts; conv FLOPs
# scale with spatial area, so other sizes scale by (S/224)^2 (the fc
# head does not, but it is <0.1% of the total)
_RESNET50_MACS_224 = 4.09e9
_RESNET18_MACS_224 = 1.82e9
_EFFICIENTNET_B0_MACS_224 = 0.39e9


def resnet50_flops(image_size: int = 224) -> float:
    return 2.0 * _RESNET50_MACS_224 * (image_size / 224.0) ** 2


def resnet18_flops(image_size: int = 224) -> float:
    return 2.0 * _RESNET18_MACS_224 * (image_size / 224.0) ** 2


def efficientnet_b0_flops(image_size: int = 224) -> float:
    return 2.0 * _EFFICIENTNET_B0_MACS_224 * (image_size / 224.0) ** 2


def _mlp_flops(dims) -> float:
    return 2.0 * sum(a * b for a, b in zip(dims[:-1], dims[1:]))


def model_forward_flops(model: str, image_size: int = 224,
                        token_merge: Optional[Tuple[int, int]] = None
                        ) -> Optional[float]:
    """Per-image forward FLOPs for a model-zoo family, or ``None`` when
    the family has no analytic entry (MFU then reports null)."""
    vit = vit_flops(image_size, token_merge=token_merge)
    table = {
        # trunk + classifier head (head dims: models/{resnet,vit}.py)
        "rgb_only": resnet50_flops(image_size) + _mlp_flops((2048, 2)),
        "thermal_only": vit + _mlp_flops((768, 2)),
        # fusion MLP 2816->512->256->2 (models/fusion.py)
        "multimodal": (resnet50_flops(image_size) + vit
                       + _mlp_flops((2816, 512, 256, 2))),
        "resnet18_rgb": resnet18_flops(image_size) + _mlp_flops((512, 2)),
        "resnet18_thermal": (resnet18_flops(image_size)
                             + _mlp_flops((512, 2))),
    }
    return table.get(model)


def train_step_flops(model: str, image_size: int = 224
                     ) -> Optional[float]:
    """Per-image FLOPs of one training step: 3x forward (backward ~ 2x
    forward).  Device-side augmentation and the AdamW update are real
    time but negligible FLOPs — they lower measured train MFU honestly."""
    fwd = model_forward_flops(model, image_size)
    return None if fwd is None else 3.0 * fwd


def mfu_pct(images_per_sec: float, flops_per_image: Optional[float],
            peak_tflops: Optional[float]) -> Optional[float]:
    """Achieved-over-peak utilization in percent, or ``None`` when either
    side of the ratio is unknown."""
    if not images_per_sec or not flops_per_image or not peak_tflops:
        return None
    return round(100.0 * images_per_sec * flops_per_image
                 / (peak_tflops * 1e12), 1)
