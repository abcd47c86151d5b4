"""Transformer attribution for the ViT thermal branch: attention rollout
and Chefer relevance propagation.

The reference's only ViT explanation is input-gradient saliency — its
Grad-CAM falls back when the hooked activation is not 4-D
(reference notebooks/grad_cam_visualization.py:401-413).  Saliency is the
weakest attribution method in the clinical literature, so beyond that
reference-parity default this module adds the two standard
transformer-grade methods:

- **attention rollout** (Abnar & Zuidema 2020): head-averaged attention
  matrices, mixed with the residual identity and row-normalized, are
  matrix-multiplied through the depth; the CLS row of the product scores
  each patch's total attention flow.  Class-agnostic.
- **Chefer relevance** (Chefer et al. 2021, "Transformer Interpretability
  Beyond Attention Visualization", the self-attention rule): per block,
  relevance update R += mean_heads(ReLU(dlogit_c/dA ⊙ A)) @ R starting
  from the identity; class-SPECIFIC through the attention gradients.

Architecture (TPU-first, one jitted program per method):

The flax trunk cannot expose attention-probability gradients — the Pallas
flash kernels never materialize the (T, T) matrix, and sown intermediates
are not differentiable inputs.  Instead the encoder runs HERE as an
explicit fp32 ``lax.scan`` over the trunk's stacked ``encoder`` params
(the production scanned layout), with a zero perturbation ``eps`` ADDED to
each block's attention probabilities: ``jax.grad`` w.r.t. ``eps`` yields
exactly dscore/dA per block, and the scan returns the stacked A's for
rollout.  Numerical parity of this functional forward with the flax trunk
is contract-tested (tests/test_vit_attribution.py).

Class specificity for fusion models: the score is decomposed at the
trunk's ``blocks`` tap — the outer model (head, or the multimodal fusion
MLP with the rgb branch) contributes ``d logit_c / d tokens`` via the
existing tap machinery (eval/gradcam.py::_cam_grads), and the inner
functional trunk uses ``score = <tokens, tap_grad>``; by the chain rule
the eps-gradients equal d logit_c / d A through the FULL model.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VIT_TRUNK_SCOPES = {
    # model name -> flax scope of the ViT trunk whose attention we unroll
    "thermal_only": "ViT_0",
    "multimodal": "thermal_branch",
}


def supports_transformer_attribution(model_name: str) -> bool:
    """True when ``--cam-method rollout/chefer`` applies to this model
    (it has a ViT trunk).  The ONE capability rule every surface uses —
    the Explainer raises on unsupported models, the CLIs downgrade with
    a notice; both consult this."""
    return model_name in VIT_TRUNK_SCOPES


DOWNGRADE_NOTE = ("applies to ViT branches only; this model's branches "
                  "keep their default methods (true Grad-CAM for tapped "
                  "trunks, input saliency otherwise)")


def stacked_trunk_params(trunk: Dict) -> Dict:
    """Trunk params with the encoder as ONE stacked (depth, ...) tree —
    the production scanned layout passes through; unrolled ``blockN``
    scopes (debug escape hatch) are stacked here.  A token-merge-split
    trunk (``encoder``/``encoder2``) is rejected: silently attributing
    over only the first ``merge_at`` blocks would produce a
    plausible-looking but wrong CAM — attribution must run on the
    pre-ToMe restored variables (which is what every serving/CLI caller
    passes)."""
    if "encoder" in trunk:
        if "encoder2" in trunk:
            raise ValueError(
                "trunk params are a token-merge split (encoder/encoder2);"
                " run attribution on the pre-ToMe full-fidelity variables")
        return trunk
    blocks = sorted((k for k in trunk if k.startswith("block")),
                    key=lambda k: int(k[5:]))
    if not blocks:
        raise ValueError("no encoder/blockN scopes in ViT trunk params")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[trunk[b] for b in blocks])
    return {**{k: v for k, v in trunk.items()
               if not k.startswith("block")}, "encoder": stacked}


def _layernorm(x, p, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _trunk_tokens(trunk: Dict, x: jnp.ndarray, eps: jnp.ndarray,
                  num_heads: int):
    """fp32 functional ViT-trunk forward to the ``blocks`` tap (pre final
    norm), mirroring models/vit.py::{ViT,EncoderBlock} with xla attention.
    ``eps`` (depth, B, H, T, T) is added to each block's attention probs.
    Returns (tokens (B, T, C), attn_probs (depth, B, H, T, T) WITHOUT
    eps)."""
    b, h, w, c = x.shape
    pe = trunk["patch_embed"]
    hidden = pe["kernel"].shape[1]
    p = int(round((pe["kernel"].shape[0] / 3) ** 0.5))
    gh, gw = h // p, w // p

    x = x.astype(jnp.float32)
    x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh * gw, p * p * c)
    x = x @ pe["kernel"] + pe["bias"]
    cls = jnp.broadcast_to(trunk["cls_token"], (b, 1, hidden))
    x = jnp.concatenate([cls.astype(jnp.float32), x], axis=1)
    x = x + trunk["pos_embed"]

    def block(carry, inp):
        blk, eps_l = inp
        x = carry
        n, ch = x.shape[1], x.shape[2]
        hd = ch // num_heads
        y = _layernorm(x, blk["norm1"])
        qkv = y @ blk["attn"]["qkv"]["kernel"] + blk["attn"]["qkv"]["bias"]
        qkv = qkv.reshape(x.shape[0], n, 3, num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs + eps_l, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], n, ch)
        out = out @ blk["attn"]["proj"]["kernel"] + blk["attn"]["proj"]["bias"]
        x = x + out
        y = _layernorm(x, blk["norm2"])
        y = y @ blk["mlp_fc1"]["kernel"] + blk["mlp_fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = y @ blk["mlp_fc2"]["kernel"] + blk["mlp_fc2"]["bias"]
        return x + y, probs

    enc = jax.tree.map(lambda a: a.astype(jnp.float32), trunk["encoder"])
    tokens, attn = jax.lax.scan(block, x, (enc, eps))
    return tokens, attn


def _grid(cam_flat: jnp.ndarray, tokens: int) -> jnp.ndarray:
    g = int(round((tokens - 1) ** 0.5))
    return cam_flat.reshape(cam_flat.shape[0], g, g)


@partial(jax.jit, static_argnames=("num_heads",))
def attention_rollout(trunk: Dict, x: jnp.ndarray,
                      num_heads: int) -> jnp.ndarray:
    """(B, S, S, 3) normalized input -> (B, g, g) rollout CAM (raw,
    un-normalized).  Abnar & Zuidema: A_hat = norm(0.5*mean_h(A) + 0.5*I),
    R = A_hat_L @ ... @ A_hat_1, CAM = R[CLS, patches]."""
    depth = jax.tree.leaves(trunk["encoder"])[0].shape[0]
    b = x.shape[0]
    p = int(round((trunk["patch_embed"]["kernel"].shape[0] / 3) ** 0.5))
    t = (x.shape[1] // p) * (x.shape[2] // p) + 1
    eps = jnp.zeros((depth, b, num_heads, t, t), jnp.float32)
    _, attn = _trunk_tokens(trunk, x, eps, num_heads)

    a = attn.mean(axis=2)                                # (L, B, T, T)
    eye = jnp.eye(t, dtype=jnp.float32)
    a = 0.5 * a + 0.5 * eye
    a = a / jnp.sum(a, axis=-1, keepdims=True)

    def step(r, a_l):
        return jnp.einsum("bij,bjk->bik", a_l, r), None
    r0 = jnp.broadcast_to(eye, (b, t, t))
    r, _ = jax.lax.scan(step, r0, a)
    return _grid(r[:, 0, 1:], t)


@partial(jax.jit, static_argnames=("num_heads",))
def chefer_relevance(trunk: Dict, x: jnp.ndarray, tap_grad: jnp.ndarray,
                     num_heads: int) -> jnp.ndarray:
    """(B, S, S, 3) input + d logit_c/d tokens at the ``blocks`` tap ->
    (B, g, g) Chefer relevance CAM (raw).  Per block, with A the attention
    probs and G = d logit_c/dA (via the eps trick + the tap-grad chain
    rule): R += mean_h(ReLU(G ⊙ A)) @ R, starting R = I."""
    depth = jax.tree.leaves(trunk["encoder"])[0].shape[0]
    b = x.shape[0]
    p = int(round((trunk["patch_embed"]["kernel"].shape[0] / 3) ** 0.5))
    t = (x.shape[1] // p) * (x.shape[2] // p) + 1
    zeros = jnp.zeros((depth, b, num_heads, t, t), jnp.float32)

    def score(eps):
        tokens, attn = _trunk_tokens(trunk, x, eps, num_heads)
        return jnp.sum(tokens * tap_grad.astype(jnp.float32)), attn

    grads, attn = jax.grad(score, has_aux=True)(zeros)

    abar = jnp.mean(jnp.maximum(grads * attn, 0.0), axis=2)  # (L, B, T, T)
    eye = jnp.eye(t, dtype=jnp.float32)

    def step(r, a_l):
        return r + jnp.einsum("bij,bjk->bik", a_l, r), None
    r0 = jnp.broadcast_to(eye, (b, t, t))
    r, _ = jax.lax.scan(step, r0, abar)
    return _grid(r[:, 0, 1:], t)


def _normalize_batch(cams: np.ndarray) -> np.ndarray:
    out = []
    for cam in np.asarray(cams, np.float32):
        cam = np.maximum(cam, 0.0)
        if cam.max() > 0:
            cam = cam / cam.max()
        out.append(cam)
    return np.stack(out)


@partial(jax.jit, static_argnames=("module",))
def _forward_probs(module, variables, inputs):
    logits = module.apply(variables, *inputs,
                          train=False).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def compute_vit_cam_batch(module, variables, inputs, trunk_scope: str,
                          method: str, class_index="pred",
                          input_index: int = 0,
                          num_heads: Optional[int] = None) -> list:
    """Batched ViT attribution through the FULL model, one jitted program
    per method (+ the shared tap-grad program for ``chefer``).  Same
    return contract as eval/gradcam.py::compute_cam_batch: per-sample
    dicts with 'cam' in [0,1] ((g, g) patch grid — upsampled by the
    overlay like the ResNet CAMs), 'probs', 'pred', 'confidence',
    'used_saliency'=False, plus 'method'."""
    from dfu_multimodal_tpu.eval import gradcam
    from dfu_multimodal_tpu.models.vit import vit_config_from_params

    trunk = stacked_trunk_params(variables["params"][trunk_scope])
    if num_heads is None:
        num_heads = vit_config_from_params(trunk)["num_heads"]
    x = inputs[input_index]

    if method == "rollout":
        # class-agnostic: only the plain forward's probs are needed —
        # the full-model forward+backward tap program would cost ~3x a
        # forward just to discard its gradients
        probs = np.asarray(_forward_probs(module, variables, inputs))
        cams = attention_rollout(trunk, x, num_heads)
    elif method == "chefer":
        # the class-specific outer gradient at the blocks tap comes from
        # the existing tap machinery on the full model
        shape = gradcam.tap_shape(module, variables, inputs, "blocks")
        zero_tap = jnp.zeros(shape.shape, shape.dtype)
        ci = class_index if class_index == "pred" else int(class_index)
        probs, _act, tap_grad, _ig = gradcam._cam_grads(
            module, variables, inputs, zero_tap, "blocks", ci, input_index)
        probs = np.asarray(probs)
        cams = chefer_relevance(trunk, x, tap_grad, num_heads)
    else:
        raise ValueError(f"unknown ViT attribution method {method!r} "
                         "(expected 'rollout' or 'chefer')")
    cams = _normalize_batch(cams)

    out = []
    for i in range(probs.shape[0]):
        pred = int(probs[i].argmax())
        out.append({"cam": cams[i].astype(np.float32), "probs": probs[i],
                    "pred": pred, "confidence": float(probs[i][pred]),
                    "used_saliency": False, "method": method})
    return out
