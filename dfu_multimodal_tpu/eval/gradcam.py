"""Grad-CAM via jax.grad over tap points — no hooks, no double forward.

The reference registers forward hooks + per-tensor grad hooks and runs two
forward passes per image (reference notebooks/grad_cam_visualization.py:
327-428).  Here every model exposes additive tap points
(models/common.py): differentiating the class score w.r.t. a zero tap yields
exactly d score / d activation, and the ``intermediates`` collection yields
the activation itself — one jitted forward+vjp produces both.

Parity notes (grad_cam_visualization.py):
- CAM = ReLU(Σ_c w_c · A_c) with w = spatial-mean gradient, max-normalized
  (:415-428);
- the reference backprops ``output[0, 0]`` — the class-0 logit — regardless
  of the predicted class (:385-387).  ``class_index=0`` reproduces that;
  pass ``class_index='pred'`` for the predicted class instead;
- non-4D activations (ViT blocks, (B, N, C)) fall back to input-gradient
  saliency |∂score/∂x| averaged over channels (:401-413);
- overlay = JET colormap + 0.5-alpha blend (:432-462).

Divergence (documented): for the multimodal model the reference CAMs each
branch against the branch's own first *feature unit* (it wraps
``model.resnet`` whose output is a 2048-d feature vector, so ``score =
features[0]``, :575-580).  We instead differentiate the FUSED class logit
w.r.t. each branch, which is the standard multimodal Grad-CAM and strictly
more informative; the output artifact layout is identical.  For exact
artifact parity, ``--multimodal-cam strict`` in the CLI reproduces the
reference semantics: CAM each branch trunk in isolation (via
:func:`branch_variables`) with ``class_index=0`` — the trunk's first
feature unit, exactly the reference's ``score = output[0, 0]`` on the
wrapped branch module (:385-387).

Execution scale: the whole visualization set (5 healthy + 5 ulcer per
model) is CAMed in ONE jitted forward+backward per tap on one chip.
Unlike the TTA/metrics evaluators (which stream full test splits through
the mesh-sharded ``device_prefetch`` path), mesh-sharding a ~10-sample
batch would only add padding and collective latency, so single-chip is
the deliberate choice here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _find_intermediate(tree: Dict, name: str) -> Optional[jnp.ndarray]:
    """Locate a sown intermediate ``name`` anywhere in the nested dict."""
    for key, val in tree.items():
        if key == name:
            return val[0] if isinstance(val, tuple) else val
        if isinstance(val, dict):
            found = _find_intermediate(val, name)
            if found is not None:
                return found
    return None


def branch_variables(variables: Dict, branch: str) -> Dict:
    """Sub-collections of one named submodule, for CAMing a branch trunk in
    isolation — the reference wraps ``model.resnet`` / ``model.vit``
    directly (grad_cam_visualization.py:575-580); the flax equivalent is
    applying the standalone trunk module with its params/batch_stats
    subtrees."""
    return {col: tree[branch] for col, tree in variables.items()
            if isinstance(tree, dict) and branch in tree}


def _tap_names(tree: Dict, prefix: str = "") -> list:
    """All sown intermediate names in a nested intermediates dict."""
    names = []
    for key, val in tree.items():
        if isinstance(val, dict):
            names.extend(_tap_names(val, f"{prefix}{key}/"))
        else:
            names.append(key)
    return names


def tap_shape(module, variables, inputs: Tuple[jnp.ndarray, ...],
              tap_name: str):
    """Shape of a tap activation, via eval_shape (no compute).  Raises a
    readable error naming the available taps when ``tap_name`` is not
    sown (previously this returned None and the caller crashed with
    "'NoneType' object has no attribute 'shape'")."""
    names_box = []

    def fwd(*xs):
        _, state = module.apply(variables, *xs, train=False,
                                mutable=["intermediates"])
        names_box.append(_tap_names(state["intermediates"]))
        return _find_intermediate(state["intermediates"], tap_name)

    shape = jax.eval_shape(fwd, *inputs)
    if shape is None:
        avail = sorted(set(names_box[0])) if names_box else []
        raise ValueError(
            f"unknown tap {tap_name!r}: this model sows {avail}")
    return shape


@partial(jax.jit, static_argnames=("module", "tap_name", "class_index",
                                   "input_index"))
def _cam_grads(module, variables, inputs, zero_tap, tap_name: str,
               class_index, input_index: int):
    """One forward+backward for a WHOLE batch: returns (probs, activation,
    d score/d tap, d score/d input[input_index]).

    The per-sample class scores are summed before differentiation — samples
    are independent, so the gradient slices are exactly the per-sample
    gradients, and one program CAMs the whole selection (the reference
    loops single-image double-forwards, grad_cam_visualization.py:715-741).
    ``class_index``: an int (fixed class) or "pred" (per-sample argmax)."""

    def score_fn(tap_value, xs):
        logits, state = module.apply(
            variables, *xs, train=False, taps={tap_name: tap_value},
            mutable=["intermediates"])
        logits = logits.astype(jnp.float32)
        if class_index == "pred":
            idx = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
        else:
            idx = jnp.full((logits.shape[0],), class_index, jnp.int32)
        score = jnp.sum(jnp.take_along_axis(logits, idx[:, None],
                                            axis=-1))
        act = _find_intermediate(state["intermediates"], tap_name)
        return score, (logits, act)

    grad_fn = jax.grad(
        lambda tap_value, xs: score_fn(tap_value, xs),
        argnums=(0, 1), has_aux=True)
    (tap_grad, input_grads), (logits, act) = grad_fn(zero_tap, inputs)
    probs = jax.nn.softmax(logits, axis=-1)
    return probs, act, tap_grad, input_grads[input_index]


def compute_cam_batch(module, variables, inputs: Tuple[jnp.ndarray, ...],
                      tap_name: str, class_index: Any = 0,
                      input_index: int = 0) -> list:
    """Grad-CAM for a batch: one jitted forward+backward covers every
    sample. Returns a list of per-sample dicts with 'cam' in [0,1],
    'probs', 'pred', 'confidence', 'used_saliency'."""
    shape = tap_shape(module, variables, inputs, tap_name)
    zero_tap = jnp.zeros(shape.shape, shape.dtype)
    ci = class_index if class_index == "pred" else int(class_index)
    probs, act, tap_grad, input_grad = _cam_grads(
        module, variables, inputs, zero_tap, tap_name, ci, input_index)

    probs = np.asarray(probs)
    act = np.asarray(act, np.float32)
    tap_grad = np.asarray(tap_grad, np.float32)
    used_saliency = act.ndim != 4
    if used_saliency:
        sal = np.abs(np.asarray(input_grad, np.float32))      # (B, H, W, C)
        cams = sal.mean(axis=-1)
    else:
        weights = tap_grad.mean(axis=(1, 2))                  # (B, C)
        cams = np.maximum(np.einsum("bc,bhwc->bhw", weights, act), 0.0)

    out = []
    for i in range(probs.shape[0]):
        cam = cams[i]
        if cam.max() > 0:
            cam = cam / cam.max()
        pred = int(probs[i].argmax())
        out.append({"cam": cam.astype(np.float32), "probs": probs[i],
                    "pred": pred, "confidence": float(probs[i][pred]),
                    "used_saliency": used_saliency})
    return out


def compute_cam(module, variables, inputs: Tuple[jnp.ndarray, ...],
                tap_name: str, class_index: Any = 0,
                input_index: int = 0) -> Dict[str, np.ndarray]:
    """Grad-CAM for one sample (batch size 1)."""
    return compute_cam_batch(module, variables, inputs, tap_name,
                             class_index, input_index)[0]


def overlay_cam(image_u8: np.ndarray, cam: np.ndarray,
                alpha: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """(overlay, heatmap): JET-colormapped CAM blended onto the image,
    matching the reference's cv2 pipeline (:432-462)."""
    import cv2

    h, w = image_u8.shape[:2]
    cam_resized = cv2.resize(cam, (w, h))
    cam_u8 = (np.clip(cam_resized, 0, 1) * 255).astype(np.uint8)
    heatmap = cv2.applyColorMap(cam_u8, cv2.COLORMAP_JET)
    heatmap = cv2.cvtColor(heatmap, cv2.COLOR_BGR2RGB)
    overlay = cv2.addWeighted(image_u8, 1 - alpha, heatmap, alpha, 0)
    return overlay, heatmap
