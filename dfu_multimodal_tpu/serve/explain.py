"""Serving-time Grad-CAM: per-request visual explanations.

No reference counterpart (the reference's Grad-CAM,
notebooks/grad_cam_visualization.py, is an offline batch script over
labeled split directories); this brings the same CAM semantics to the
online daemon: a clinician reviewing a positive prediction asks *why*
and gets the evidence heatmap for the exact image they submitted.

Design:

- The explanation program is built from the ORIGINAL restored
  (trainer, state) — never the int8/token-merge serving rebuilds
  (gradients through the quantized Pallas kernels and the merged-token
  encoder are unsupported and clinically meaningless: the explanation
  should reflect the full-fidelity model the deployment was validated
  against).  ``cli/serve.py --explain`` captures the pre-transform pair.
- Explanations run ONE AT A TIME on the engine's batcher thread (the
  thread that owns the device): explain traffic is rare and
  latency-tolerant (a human clicked a button), so a fixed batch-1
  program avoids a second bucket ladder's compile cost and can never
  starve the predict path for more than one small step.
- Tapped trunks (ResNet ``stage4``, the reference's layer4 hook;
  EfficientNet/tiny ``features``) get true Grad-CAM via
  :func:`eval.gradcam.compute_cam_batch`; non-4D taps (the ViT
  ``blocks``) and un-tapped models (the legacy fusion variants) fall
  back to input-gradient saliency — exactly the offline CLI's semantics
  (eval/gradcam.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

# Per-model {modality: tap name}, mirroring the offline CLI's TAPS
# (cli/grad_cam_visualization.py) split per branch.  Models not listed
# explain every modality via input-gradient saliency.
BRANCH_TAPS: Dict[str, Dict[str, str]] = {
    "rgb_only": {"rgb": "stage4"},
    "resnet18_rgb": {"rgb": "stage4"},
    "resnet18_thermal": {"thermal": "stage4"},
    "thermal_only": {"thermal": "blocks"},
    "multimodal": {"rgb": "stage4", "thermal": "blocks"},
    # EfficientNet-B0 exposes a 4-D pre-head 'features' tap
    # (models/efficientnet.py:115) -> true Grad-CAM, same as the tiny
    # trunks below
    "efficientnet_rgb": {"rgb": "features"},
    "efficientnet_thermal": {"thermal": "features"},
    "tiny_rgb": {"rgb": "features"},
    "tiny_thermal": {"thermal": "features"},
}


def saliency_grads_fn(module, class_index):
    """Jitted (variables, inputs) -> (probs, per-input |grad|) for models
    without a usable tap: d score / d input, the gradcam module's own
    fallback semantics (eval/gradcam.py:133-136)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, inputs):
        def score_fn(xs):
            logits = module.apply(variables, *xs,
                                  train=False).astype(jnp.float32)
            if class_index == "pred":
                idx = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
            else:
                idx = jnp.full((logits.shape[0],), int(class_index),
                               jnp.int32)
            score = jnp.sum(jnp.take_along_axis(logits, idx[:, None],
                                                axis=-1))
            return score, logits

        grads, logits = jax.grad(score_fn, has_aux=True)(inputs)
        probs = jax.nn.softmax(logits, axis=-1)
        sal = tuple(jnp.mean(jnp.abs(g.astype(jnp.float32)), axis=-1)
                    for g in grads)
        return probs, sal

    return run


class Explainer:
    """Grad-CAM/saliency explanations for one served model.

    Built once at daemon startup from the restored full-fidelity
    (trainer, state); :meth:`explain_one` is called on the engine's
    batcher thread.  ``class_index``: ``"pred"`` (default — explain the
    decision actually returned) or a fixed class int (``0`` reproduces
    the offline CLI's reference-parity quirk).  ``cam_method``: ViT-branch
    attribution — ``"saliency"`` (default, reference-parity input
    gradients), ``"rollout"`` or ``"chefer"``
    (eval/vit_attribution.py); ResNet branches always get true
    Grad-CAM."""

    def __init__(self, trainer, state, class_index: Any = "pred",
                 cam_method: str = "saliency"):
        self.trainer = trainer
        self.module = trainer.module
        self.variables = trainer.variables(state)
        self.model_name: str = trainer.spec.name
        self.inputs: Tuple[str, ...] = tuple(trainer.spec.inputs)
        if class_index != "pred":
            class_index = int(class_index)
        self.class_index = class_index
        from dfu_multimodal_tpu.eval.vit_attribution import (
            VIT_TRUNK_SCOPES)
        self.vit_scope = VIT_TRUNK_SCOPES.get(self.model_name)
        if cam_method not in ("saliency", "rollout", "chefer"):
            raise ValueError(f"unknown cam_method {cam_method!r}")
        if cam_method != "saliency" and self.vit_scope is None:
            raise ValueError(
                f"--cam-method {cam_method} needs a ViT branch; model "
                f"{self.model_name!r} has none (use saliency)")
        self.cam_method = cam_method
        self.taps = BRANCH_TAPS.get(self.model_name)
        # True when EVERY branch CAM this explainer can produce ignores
        # the class (rollout on a model whose only tapped branch is the
        # ViT): the engine then skips the borderline re-explain (the CAM
        # would be byte-identical) and the extra fixed-class warmup
        # compiles.  A multimodal rollout still has the class-specific
        # Grad-CAM rgb branch, so it stays class-specific.
        self.class_agnostic = (cam_method == "rollout"
                               and self.taps is not None
                               and all(t == "blocks"
                                       for t in self.taps.values()))
        # saliency programs are built per class key ("pred" or a fixed
        # int): the engine may re-explain a borderline request with the
        # deployment-tuned class (see ServingEngine._run_explains), which
        # needs a second compiled program cached here
        self._saliency_cache: Dict[Any, Any] = {}

    def _saliency_for(self, class_key):
        fn = self._saliency_cache.get(class_key)
        if fn is None:
            fn = saliency_grads_fn(self.module, class_key)
            self._saliency_cache[class_key] = fn
        return fn

    def _normalize(self, sample_u8: Dict[str, np.ndarray]):
        """{modality: (S,S,3) u8} -> per-spec-input normalized (1,S,S,3)
        device arrays; absent modalities fill black (the loader's
        masked-modality convention, data/loader.py)."""
        import jax.numpy as jnp

        from dfu_multimodal_tpu.data.transforms import eval_normalize

        shape = next(iter(sample_u8.values())).shape
        xs = []
        for m in self.inputs:
            u8 = sample_u8.get(m)
            if u8 is None:
                u8 = np.zeros(shape, np.uint8)
            xs.append(eval_normalize(jnp.asarray(u8[None]),
                                     self.trainer.modalities[m],
                                     jnp.float32))
        return tuple(xs)

    def explain_one(self, sample_u8: Dict[str, np.ndarray],
                    class_override: Optional[int] = None) -> Dict:
        """One request -> {"probs": (2,) np.float32, "class_explained":
        int, "cams": {modality: {"cam": (h, w) float32 in [0,1],
        "method": "gradcam"|"saliency"}}}.

        ``class_override`` explains that class instead of the
        constructor's ``class_index`` — the engine uses it to re-explain
        a borderline request whose deployment-tuned decision (threshold
        on temperature-scaled P(ulcer)) differs from the raw-logit
        argmax, so the heatmap always explains the decision the caller
        was actually served.

        CAMs are produced only for the modalities the request PROVIDED —
        a black fill-in for an absent modality is padding, and a heatmap
        over it would be noise presented as evidence."""
        from dfu_multimodal_tpu.eval import gradcam

        class_key = (self.class_index if class_override is None
                     else int(class_override))
        inputs = self._normalize(sample_u8)
        provided = [m for m in self.inputs if m in sample_u8]
        cams: Dict[str, Dict] = {}
        probs: Optional[np.ndarray] = None

        if self.taps is None:
            dev_probs, sal = self._saliency_for(class_key)(
                self.variables, inputs)
            probs = np.asarray(dev_probs, np.float32)[0]
            for i, m in enumerate(self.inputs):
                if m not in provided:
                    continue
                cam = np.asarray(sal[i], np.float32)[0]
                if cam.max() > 0:
                    cam = cam / cam.max()
                cams[m] = {"cam": cam, "method": "saliency"}
        else:
            for m in provided:
                if (self.cam_method != "saliency"
                        and self.taps[m] == "blocks"):
                    from dfu_multimodal_tpu.eval.vit_attribution import (
                        compute_vit_cam_batch)
                    out = compute_vit_cam_batch(
                        self.module, self.variables, inputs,
                        self.vit_scope, self.cam_method,
                        class_index=class_key,
                        input_index=self.inputs.index(m))[0]
                    cams[m] = {"cam": out["cam"],
                               "method": self.cam_method}
                else:
                    out = gradcam.compute_cam_batch(
                        self.module, self.variables, inputs, self.taps[m],
                        class_index=class_key,
                        input_index=self.inputs.index(m))[0]
                    cams[m] = {"cam": out["cam"],
                               "method": ("saliency" if out["used_saliency"]
                                          else "gradcam")}
                probs = np.asarray(out["probs"], np.float32)
        explained = (int(np.argmax(probs)) if class_key == "pred"
                     else int(class_key))
        return {"probs": probs, "class_explained": explained, "cams": cams}

    def warmup(self, image_size: int,
               classes: Tuple[int, ...] = ()) -> None:
        """Compile the explanation program(s) before traffic: one black
        sample per provided-modality combination would be exhaustive;
        the all-provided case covers every per-branch program because
        each branch compiles independently of which others were asked.
        ``classes`` additionally warms fixed-class override programs (the
        engine passes (0, 1) when a deployment threshold is configured,
        so the first borderline request never pays an XLA compile)."""
        zero = {m: np.zeros((image_size, image_size, 3), np.uint8)
                for m in self.inputs}
        self.explain_one(zero)
        for c in classes:
            if c != self.class_index:
                self.explain_one(zero, class_override=int(c))


def encode_png(arr_u8: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (PIL; no filesystem)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def render_overlay(image_u8: np.ndarray, cam: np.ndarray,
                   alpha: float = 0.5) -> bytes:
    """JET-colormapped CAM blended onto the submitted image (the offline
    CLI's exact overlay pipeline, eval/gradcam.py::overlay_cam), as PNG
    bytes.  Runs on the HTTP request thread, never the batcher."""
    from dfu_multimodal_tpu.eval.gradcam import overlay_cam

    overlay, _ = overlay_cam(np.ascontiguousarray(image_u8), cam,
                             alpha=alpha)
    return encode_png(overlay)
