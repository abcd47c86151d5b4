"""Bipartite token merging for ViT serving (ToMe-style, static shapes).

Token reduction is the one remaining serving-throughput lever the fused
block kernels cannot touch: encoder FLOPs are linear (MLP) to quadratic
(attention) in the token count, and at 224²/p16 most of the 196 patch
tokens of a wound photo are near-duplicate background. Bipartite soft
matching (Bolya et al., "Token Merging: Your ViT But Faster", ICLR'23 —
retrieved in PAPERS.md's ViT-acceleration survey) merges the ``r`` most
similar patch-token pairs in ONE shot with no iterative clustering:
split tokens alternately into sets A/B, match each A-token to its most
cosine-similar B-token, merge the top-``r`` matches by size-weighted
mean. Everything is a fixed-shape gather/one-hot-matmul program — no
data-dependent shapes, exactly what XLA/TPU wants — and runs once per
merge point, so its cost is negligible next to one encoder block.

TPU-first design notes:
- the (nA, nB) similarity is one small MXU matmul; the scatter of merged
  tokens into their destinations is a one-hot matmul (no per-row scatter
  ops, which lower poorly on TPU);
- the merged forward keeps a parallel ``sizes`` vector so multiple merge
  points compose with exact weighted means;
- the CLS token (row 0) never participates.

Inference-only (no custom VJP): the serving path in
``models/vit.py`` (token_merge split-scan encoder) consumes this; training always runs the full
token set.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bipartite_merge(x: jnp.ndarray, sizes: jnp.ndarray, r: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge ``r`` patch tokens of ``x`` into their nearest neighbours.

    ``x``: (B, N, C) token sequence, CLS at index 0 (never merged).
    ``sizes``: (B, N) fp32 — how many original tokens each current token
    already represents (all-ones before the first merge).
    Returns ``(x', sizes')`` with static N' = N − r; merged tokens are
    the size-weighted means of their constituents (computed fp32, cast
    back to ``x.dtype``).
    """
    if r <= 0:
        return x, sizes
    cls_tok, t = x[:, :1], x[:, 1:]
    s_cls, st = sizes[:, :1], sizes[:, 1:]
    a, bt = t[:, 0::2], t[:, 1::2]            # alternating bipartition
    sa, sb = st[:, 0::2], st[:, 1::2]
    na, nb = a.shape[1], bt.shape[1]
    if r > na:
        raise ValueError(f"r={r} exceeds the {na} mergeable A-tokens")

    af = a.astype(jnp.float32)
    bf = bt.astype(jnp.float32)
    an = af / (jnp.linalg.norm(af, axis=-1, keepdims=True) + 1e-6)
    bn = bf / (jnp.linalg.norm(bf, axis=-1, keepdims=True) + 1e-6)
    scores = jnp.einsum("bac,bkc->bak", an, bn)           # (B, nA, nB)
    best = scores.max(axis=-1)                            # (B, nA)
    dst = scores.argmax(axis=-1).astype(jnp.int32)        # (B, nA)

    order = jnp.argsort(-best, axis=-1)                   # most similar first
    merged_src, kept_src = order[:, :r], order[:, r:]

    a_kept = jnp.take_along_axis(a, kept_src[:, :, None], axis=1)
    sa_kept = jnp.take_along_axis(sa, kept_src, axis=1)

    a_m = jnp.take_along_axis(af, merged_src[:, :, None], axis=1)
    sa_m = jnp.take_along_axis(sa, merged_src, axis=1)    # (B, r)
    dst_m = jnp.take_along_axis(dst, merged_src, axis=1)  # (B, r)

    # scatter-by-one-hot-matmul: several A-tokens may land in one B-token
    onehot = jax.nn.one_hot(dst_m, nb, dtype=jnp.float32)   # (B, r, nB)
    add_feat = jnp.einsum("brk,brc->bkc", onehot,
                          a_m * sa_m[:, :, None])
    add_size = jnp.einsum("brk,br->bk", onehot, sa_m)
    sb_new = sb + add_size
    b_new = ((bf * sb[:, :, None] + add_feat)
             / sb_new[:, :, None]).astype(x.dtype)

    x_out = jnp.concatenate([cls_tok, a_kept, b_new], axis=1)
    s_out = jnp.concatenate([s_cls, sa_kept, sb_new], axis=1)
    return x_out, s_out
