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
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.data.transforms import eval_normalize
from dfu_multimodal_tpu.eval import metrics as metrics_mod
from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.parallel import mesh as mesh_mod
from dfu_multimodal_tpu.train.engine import Trainer, per_sample_ce

import optax


@dataclass(frozen=True)
class DistillConfig:
    alpha: float = 0.7            # weight of the soft-target KL term
    temperature: float = 4.0


def kd_numerators(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                  labels: jnp.ndarray, ce_weights: jnp.ndarray,
                  valid: jnp.ndarray,
                  temperature: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized numerators of the two KD ratio terms: (Σ v·klᵢ,
    Σ w·ceᵢ).  Split out so the shard_map KD step can psum numerators and
    (param-independent) denominators separately — the same ∇(N/W)
    identity the supervised SPMD step uses (train/engine.py)."""
    t = temperature
    s = student_logits.astype(jnp.float32) / t
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl_rows = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12, 1.0))
                           - jax.nn.log_softmax(s, axis=-1)), axis=-1)
    v = valid.astype(jnp.float32)
    ce_rows = per_sample_ce(student_logits, labels)
    return jnp.sum(kl_rows * v), jnp.sum(ce_weights * ce_rows)


def kd_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
            labels: jnp.ndarray, ce_weights: jnp.ndarray,
            valid: jnp.ndarray, alpha: float,
            temperature: float) -> jnp.ndarray:
    """alpha * T^2 * KL(p_T || q_T) + (1 - alpha) * weighted CE.

    KL averages over VALID rows only (class weights apply to the CE term
    only — soft targets already encode the teacher's class balance)."""
    t = temperature
    kl_num, ce_num = kd_numerators(student_logits, teacher_logits, labels,
                                   ce_weights, valid, t)
    v = valid.astype(jnp.float32)
    kl = kl_num / jnp.maximum(jnp.sum(v), 1e-12)
    ce = ce_num / jnp.maximum(jnp.sum(ce_weights), 1e-12)
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
                 mesh=None, teacher_block_impl: str = "auto",
                 teacher_attention_impl: str = "auto", **kwargs):
        if (int(getattr(cfg, "grad_accum", 1)) > 1
                or float(getattr(cfg, "ema_decay", 0.0)) > 0.0
                or getattr(cfg, "loss", "ce") != "ce"
                or float(getattr(cfg, "mixup_alpha", 0.0)) > 0.0):
            raise ValueError("distillation does not compose with "
                             "--grad-accum, --ema-decay, "
                             "--loss focal or --mixup-alpha")
        super().__init__(student_model, cfg, modalities,
                         class_weights=class_weights, mesh=mesh, **kwargs)
        # Teacher impls default to "auto": the teacher forward shares the
        # student's (possibly multi-device) program, and "auto" resolves
        # along that boundary — fused Pallas blocks in any per-device
        # trace (single TPU device, or inside the shard_map KD step
        # below), XLA/flax paths under a plain multi-device jit where
        # Mosaic custom calls can't be partitioned
        # (models/common.py::mosaic_kernels_ok).  Explicit overrides
        # exist for tests (interpret impls) and opt-in forcing.
        t_kwargs = {}
        probe_mod = zoo.get(teacher_model).make()   # default-field probe
        if hasattr(probe_mod, "block_impl"):
            t_kwargs["block_impl"] = teacher_block_impl
        elif teacher_block_impl != "auto":
            raise ValueError(f"teacher {teacher_model!r} takes no "
                             "block_impl")
        if hasattr(probe_mod, "attention_impl"):
            t_kwargs["attention_impl"] = teacher_attention_impl
        elif teacher_attention_impl != "auto":
            raise ValueError(f"teacher {teacher_model!r} takes no "
                             "attention_impl")
        self.teacher_module, self.teacher_spec = zoo.build(
            teacher_model, dtype=self.compute_dtype, **t_kwargs)
        # KD under SPMD (round-5): on a pure-DP mesh the whole KD step —
        # frozen teacher forward + student forward/backward — runs inside
        # jax.shard_map over ``data``, so BOTH models keep their fused
        # Pallas paths on multi-chip DP.  Active when any participant
        # explicitly requests mosaic kernels (incl. the interpret
        # spellings used by CPU tests) or when "auto" would resolve to
        # them on TPU; the student's BatchNorm (ResNet students) gets
        # cross-shard statistics via bn_axis_name, reproducing the jit
        # path's global-batch BN.
        wants_mosaic = (
            str(teacher_block_impl).startswith("fused")
            or teacher_attention_impl == "pallas"
            or str(getattr(self.module, "block_impl", "auto")
                   ).startswith("fused")
            or getattr(self.module, "attention_impl", "auto") == "pallas")
        auto_tpu = (jax.devices()[0].platform == "tpu"
                    and teacher_block_impl == "auto")
        self._kd_spmd = self._pure_dp and (wants_mosaic or auto_tpu)
        if self._kd_spmd:
            self._bind_student_bn_axis()
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

    def _bind_student_bn_axis(self) -> None:
        """Rebuild the student with cross-shard BN bound (same param
        tree; flax modules are dataclasses, clone is free).  BN-free
        students (ViT) have no field and need nothing."""
        if (hasattr(self.module, "bn_axis_name")
                and getattr(self.module, "bn_axis_name") is None):
            self.module = self.module.clone(
                bn_axis_name=mesh_mod.DATA_AXIS)

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

    def build_train_step(self, jit: bool = True,
                         force_shard_map: bool = False) -> Callable:
        module, spec, tx = self.module, self.spec, self.tx
        dcfg = self.dcfg
        # --qat: the STUDENT trains through its int8 serving grid
        # (train/qat.py; covers the ResNet-18 students' conv grid), so
        # the distilled weights requantize losslessly at deployment.
        # The frozen teacher always runs full-fidelity.
        qat = bool(getattr(self.cfg, "qat", False))
        use_shmap = self._kd_spmd or force_shard_map
        if force_shard_map and (
                self.fsdp or self.mesh.shape[mesh_mod.MODEL_AXIS] > 1):
            raise ValueError("force_shard_map: the KD shard_map step is "
                             "pure-DP (params replicated), not FSDP/TP")
        if self.mesh.size > 1 and not use_shmap:
            # mirror the supervised engine: Mosaic kernels cannot survive
            # a plain multi-device jit — reject with a readable error
            # instead of the raw "cannot be automatically partitioned"
            impls = (str(getattr(self.module, "block_impl", "auto")),
                     str(getattr(self.module, "attention_impl", "auto")),
                     str(getattr(self.teacher_module, "block_impl",
                                 "auto")),
                     str(getattr(self.teacher_module, "attention_impl",
                                 "auto")))
            if any(i.startswith("fused") or i == "pallas" for i in impls):
                raise ValueError(
                    f"distilling with impls {impls} on a "
                    f"{self.mesh.size}-device mesh needs the shard_map "
                    "KD path (pure-DP). Use a pure data-parallel mesh, "
                    "'auto'/'flax'/'xla' impls, or one device.")
        if use_shmap:
            # force_shard_map may arrive without __init__ having bound
            # cross-shard BN (flax-impl parity tests) — bind late; the
            # param tree is unchanged so existing states stay valid
            self._bind_student_bn_axis()
            return self._build_spmd_train_step(jit)

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

    def _build_spmd_train_step(self, jit: bool = True) -> Callable:
        """KD step inside ``jax.shard_map`` over the data axis (pure-DP):
        teacher + student forwards trace per-device programs (fused
        Pallas kernels survive multi-chip DP, models/common.py), and the
        two KD ratio terms reduce exactly like the supervised SPMD step —
        the denominators (Σ valid for KL, Σ w for CE) are parameter-
        independent, so they psum BEFORE the grad while the per-shard
        loss carries only numerators; psum'ing loss and grads afterwards
        reproduces ∇(α T² KLnum/Σv + (1-α) CEnum/Σw) exactly (up to fp
        summation order).  Student BN runs cross-shard via bn_axis_name
        (global-batch statistics, models/resnet.py).  The one documented
        RNG divergence from the jit path is the shard-shaped dropout
        mask (same as train/engine.py)."""
        import contextlib

        from jax.sharding import PartitionSpec as P

        from dfu_multimodal_tpu.models import common as common_mod
        from dfu_multimodal_tpu.train import qat as qat_mod

        module, spec, tx = self.module, self.spec, self.tx
        dcfg = self.dcfg
        qat = bool(getattr(self.cfg, "qat", False))
        d_axis = mesh_mod.DATA_AXIS
        force = jax.devices()[0].platform == "tpu"

        def kd_step_spmd(teacher_variables, state, batch, rng):
            ctx = (common_mod.force_mosaic_kernels() if force
                   else contextlib.nullcontext())
            with ctx:
                aug_rng, drop_rng = jax.random.split(
                    jax.random.fold_in(rng, state.step))
                inputs = self._preprocess_train_spmd(aug_rng, batch)
                views = dict(zip(spec.inputs, inputs))
                labels, valid = batch["label"], batch["valid"]
                weights = self._sample_weights(labels, valid)
                t_logits = self.teacher_module.apply(
                    teacher_variables,
                    *self._teacher_inputs(batch, views), train=False)
                t_logits = jax.lax.stop_gradient(t_logits)
                drop_local = jax.random.fold_in(
                    drop_rng, jax.lax.axis_index(d_axis))
                # param-independent denominators: global BEFORE the grad
                den_v, den_w = jax.lax.psum(
                    (jnp.sum(valid.astype(jnp.float32)),
                     jnp.sum(weights)), d_axis)
                den_v = jnp.maximum(den_v, 1e-12)
                den_w = jnp.maximum(den_w, 1e-12)
                t = dcfg.temperature

                def loss_fn(params):
                    if qat:
                        params = qat_mod.fake_quant_trunks(params)
                    variables = {"params": params}
                    if state.batch_stats:
                        variables["batch_stats"] = state.batch_stats
                        logits, new_state = module.apply(
                            variables, *inputs, train=True,
                            rngs={"dropout": drop_local},
                            mutable=["batch_stats"])
                        new_bs = new_state["batch_stats"]
                    else:
                        logits = module.apply(
                            variables, *inputs, train=True,
                            rngs={"dropout": drop_local})
                        new_bs = state.batch_stats
                    kl_num, ce_num = kd_numerators(
                        logits, t_logits, labels, weights, valid, t)
                    local = (dcfg.alpha * (t * t) * kl_num / den_v
                             + (1.0 - dcfg.alpha) * ce_num / den_w)
                    return local, (logits, new_bs)

                (local_loss, (logits, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            loss, grads, counts = jax.lax.psum(
                (local_loss, g,
                 metrics_mod.confusion_counts(
                     jnp.argmax(logits, axis=-1), labels, valid)), d_axis)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1,
                                      params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt)
            return new_state, {"loss": loss, "counts": counts}

        shmapped = jax.shard_map(
            kd_step_spmd, mesh=self.mesh,
            in_specs=(P(), P(), P(d_axis), P()),
            out_specs=(P(), {"loss": P(), "counts": P()}),
            check_vma=False)
        if not jit:
            return shmapped
        jitted = jax.jit(shmapped, donate_argnums=(1,))
        tv = self.teacher_variables

        def step(state, batch, rng):
            return jitted(tv, state, batch, rng)

        return step
