"""Knowledge distillation: compress a trained teacher into a smaller
student (`dfu distill`).

No reference counterpart — the reference ships 25M/86M/110M-param models
and nothing smaller.  In production the serving cost story often wants an
edge-deployable model; distillation trains one from the checkpoints this
framework already produces:

- same-modality compression: rgb_only (ResNet50, 23.5M) ->
  resnet18_rgb (11.2M), thermal_only (ViT-B/16, 85.8M) ->
  resnet18_thermal;
- cross-modal ("privileged information") distillation: a multimodal
  teacher that saw RGB+thermal teaches an RGB-only student — the student
  deploys with one camera but learned from two.

Loss = alpha * T^2 * KL(teacher_T || student_T) + (1-alpha) * weighted CE
(Hinton et al.; the T^2 factor keeps the soft-target gradient scale
independent of temperature).  Teacher logits are computed inside the same
jitted step — for modalities the student also consumes the teacher sees
the student's exact augmented view (consistent targets under
augmentation); teacher-only modalities get the eval-normalized image.
The teacher's variables enter the step as an ARGUMENT (never a closure:
closure constants serialize into the axon remote-compile request,
CLAUDE.md).

Engine-wise this subclasses the supervised Trainer: identical epoch loop,
best-by-val-F1 checkpointing, mesh sharding, device-side augmentation;
only the train-step loss changes.  Eval/metrics stay plain CE on the
student, so val F1 selection and test artifacts are comparable with a
non-distilled run of the same student.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.data.transforms import eval_normalize
from dfu_multimodal_tpu.eval import metrics as metrics_mod
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.train.engine import Trainer, weighted_ce

import optax


@dataclass(frozen=True)
class DistillConfig:
    alpha: float = 0.7            # weight of the soft-target KL term
    temperature: float = 4.0


def kd_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
            labels: jnp.ndarray, ce_weights: jnp.ndarray,
            valid: jnp.ndarray, alpha: float,
            temperature: float) -> jnp.ndarray:
    """alpha * T^2 * KL(p_T || q_T) + (1 - alpha) * weighted CE.

    KL averages over VALID rows only (class weights apply to the CE term
    only — soft targets already encode the teacher's class balance)."""
    t = temperature
    s = student_logits.astype(jnp.float32) / t
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl_rows = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12, 1.0))
                           - jax.nn.log_softmax(s, axis=-1)), axis=-1)
    v = valid.astype(jnp.float32)
    kl = jnp.sum(kl_rows * v) / jnp.maximum(jnp.sum(v), 1e-12)
    ce = weighted_ce(student_logits, labels, ce_weights)
    return alpha * (t * t) * kl + (1.0 - alpha) * ce


class DistillTrainer(Trainer):
    """Supervised Trainer whose train step adds a frozen teacher forward
    and the KD loss.  ``teacher_model`` is a zoo name; ``teacher_variables``
    the restored checkpoint variables.  The student config must not use
    grad_accum/ema/focal/mixup (rejected up front); --qat composes (the
    student trains through its int8 serving grid, train/qat.py)."""

    def __init__(self, student_model: str, teacher_model: str,
                 teacher_variables: Dict, dcfg: DistillConfig, cfg,
                 modalities, class_weights: Optional[np.ndarray] = None,
                 mesh=None, **kwargs):
        if (int(getattr(cfg, "grad_accum", 1)) > 1
                or float(getattr(cfg, "ema_decay", 0.0)) > 0.0
                or getattr(cfg, "loss", "ce") != "ce"
                or float(getattr(cfg, "mixup_alpha", 0.0)) > 0.0):
            raise ValueError("distillation does not compose with "
                             "--grad-accum, --ema-decay, "
                             "--loss focal or --mixup-alpha")
        super().__init__(student_model, cfg, modalities,
                         class_weights=class_weights, mesh=mesh, **kwargs)
        # teacher impls stay "auto": the teacher forward shares the
        # student's jitted (possibly multi-device) program, and "auto"
        # resolves per-process exactly along that boundary — fused Pallas
        # blocks on a single TPU device, XLA/flax paths under any
        # multi-device mesh where Mosaic custom calls can't be
        # partitioned (models/common.py::mosaic_kernels_ok).
        self.teacher_module, self.teacher_spec = zoo.build(
            teacher_model, dtype=self.compute_dtype)
        missing = [m for m in self.teacher_spec.inputs
                   if m not in modalities]
        if missing:
            raise ValueError(f"teacher consumes {self.teacher_spec.inputs} "
                             f"but modalities config lacks {missing}")
        # place once, replicated over the mesh — leaving host numpy here
        # would re-transfer the whole teacher tree on EVERY step (jit
        # arguments are converted per call)
        self.teacher_variables = jax.device_put(teacher_variables,
                                                self.replicated)
        self.dcfg = dcfg

    def _teacher_inputs(self, batch: Dict[str, jnp.ndarray],
                        student_views: Dict[str, jnp.ndarray]):
        """Teacher sees the student's augmented view for shared
        modalities, eval-normalized images for teacher-only ones."""
        inputs = []
        for m in self.teacher_spec.inputs:
            if m in student_views:
                inputs.append(student_views[m])
            else:
                inputs.append(eval_normalize(batch[m], self.modalities[m],
                                             self.compute_dtype))
        return tuple(inputs)

    def build_train_step(self, jit: bool = True) -> Callable:
        module, spec, tx = self.module, self.spec, self.tx
        dcfg = self.dcfg
        # --qat: the STUDENT trains through its int8 serving grid
        # (train/qat.py; covers the ResNet-18 students' conv grid), so
        # the distilled weights requantize losslessly at deployment.
        # The frozen teacher always runs full-fidelity.
        qat = bool(getattr(self.cfg, "qat", False))

        def train_step(teacher_variables, state, batch, rng):
            aug_rng, drop_rng = jax.random.split(jax.random.fold_in(
                rng, state.step))
            inputs = self._preprocess_train(aug_rng, batch)
            views = dict(zip(spec.inputs, inputs))
            labels = batch["label"]
            valid = batch["valid"]
            weights = self._sample_weights(labels, valid)
            t_logits = self.teacher_module.apply(
                teacher_variables, *self._teacher_inputs(batch, views),
                train=False)
            t_logits = jax.lax.stop_gradient(t_logits)

            def loss_fn(params):
                if qat:
                    from dfu_multimodal_tpu.train import qat as qat_mod
                    params = qat_mod.fake_quant_trunks(params)
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    logits, new_state = module.apply(
                        variables, *inputs, train=True,
                        rngs={"dropout": drop_rng},
                        mutable=["batch_stats"])
                    new_bs = new_state["batch_stats"]
                else:
                    logits = module.apply(variables, *inputs, train=True,
                                          rngs={"dropout": drop_rng})
                    new_bs = state.batch_stats
                loss = kd_loss(logits, t_logits, labels, weights, valid,
                               dcfg.alpha, dcfg.temperature)
                return loss, (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1,
                                      params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt)
            counts = metrics_mod.confusion_counts(
                jnp.argmax(logits, axis=-1), labels, valid)
            return new_state, {"loss": loss, "counts": counts}

        if not jit:
            return train_step
        jitted = jax.jit(train_step, donate_argnums=(1,))
        tv = self.teacher_variables

        def step(state, batch, rng):
            # teacher variables ride as a jit ARGUMENT (see module doc)
            return jitted(tv, state, batch, rng)

        return step
