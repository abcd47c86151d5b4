"""Fused Pallas kernels under SPMD (jax.shard_map over the data axis).

Round-4 closing of the "Kernels under SPMD" gap (docs/DESIGN.md): on a
pure-DP multi-device mesh the Trainer's eval/serving step runs inside
``jax.shard_map``, where every device traces a per-device program — so the
Mosaic kernels never meet XLA's auto-partitioner and the fused serving
paths survive multi-chip DP.  Multi-chip TPU hardware is unavailable in CI
(SURVEY.md §4), so these tests run the kernels in Pallas interpret mode on
the virtual 8-device CPU mesh and pin:

- row/metric parity of the shard_map-wrapped fused step vs the plain
  jit/XLA step (same variables, same batch);
- bit-exact parity of the shard_map REDUCTIONS alone (flax impls forced
  through the wrapper);
- the int8 (q8) serving tree under the mesh vs the same tree single-device;
- the ToMe (token-merge) serving path under the mesh;
- the readable train-step rejection for mosaic impls on multi-device, and
  the end-to-end ServingEngine round trip over the wrapped step.
"""

import jax
import numpy as np
import pytest

from dfu_multimodal_tpu.config import (TrainConfig, rgb_modality,
                                       thermal_modality)
from dfu_multimodal_tpu.parallel import mesh as mesh_mod
from dfu_multimodal_tpu.train.engine import Trainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the virtual 8-device mesh")


def _cfg(batch=8):
    return TrainConfig(batch_size=batch, compute_dtype="float32")


def _thermal_batch(rng, b=8, s=32):
    return {"thermal": rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8),
            "label": rng.integers(0, 2, (b,)).astype(np.int32),
            "valid": np.ones(b, np.float32)}


def _assert_out_close(o_ref, o_new, rtol=0, atol=0):
    np.testing.assert_allclose(np.asarray(o_new["loss"]),
                               np.asarray(o_ref["loss"]),
                               rtol=rtol, atol=max(atol, 1e-5))
    np.testing.assert_array_equal(np.asarray(o_new["counts"]),
                                  np.asarray(o_ref["counts"]))
    np.testing.assert_allclose(np.asarray(o_new["probs"]),
                               np.asarray(o_ref["probs"]),
                               rtol=rtol, atol=max(atol, 1e-5))
    np.testing.assert_array_equal(np.asarray(o_new["preds"]),
                                  np.asarray(o_ref["preds"]))


def test_fused_spmd_eval_matches_flax_jit(rng):
    """Fused (interpret) blocks under shard_map on the 8-device mesh ==
    the flax/XLA jit path, within the fused kernels' GELU-approximation
    tolerance (test_ops.py::test_fused_vit_forward_matches_flax)."""
    mods = {"thermal": thermal_modality()}
    tr_ref = Trainer("thermal_only", _cfg(), mods,
                     block_impl="flax", attention_impl="xla")
    tr_fused = Trainer("thermal_only", _cfg(), mods,
                       block_impl="fused_interpret")
    assert not tr_ref._eval_shard_map
    assert tr_fused._eval_shard_map

    state = tr_ref.init_state(jax.random.PRNGKey(0), image_size=32)
    v = tr_ref.variables(state)
    batch = jax.device_put(_thermal_batch(rng), tr_ref.batch_sharding)
    _assert_out_close(tr_ref.eval_step(v, batch),
                      tr_fused.eval_step(v, batch), atol=3e-3)


def test_shard_map_reductions_bit_exact(rng):
    """The wrapper alone (flax impls, force_shard_map) must reproduce the
    jit path bit-for-bit: per-shard num/den/counts + psum is the same
    arithmetic as the global reduction here (8 rows, fp32)."""
    mods = {"thermal": thermal_modality()}
    tr = Trainer("thermal_only", _cfg(), mods,
                 block_impl="flax", attention_impl="xla")
    state = tr.init_state(jax.random.PRNGKey(0), image_size=32)
    v = tr.variables(state)
    batch = _thermal_batch(rng)
    batch["valid"][-2:] = 0.0          # padding rows must not contribute
    batch = jax.device_put(batch, tr.batch_sharding)
    o_jit = tr.eval_step(v, batch)
    o_shm = tr.build_eval_step(force_shard_map=True)(v, batch)
    for k in ("loss", "counts", "probs", "preds"):
        np.testing.assert_array_equal(np.asarray(o_jit[k]),
                                      np.asarray(o_shm[k]))


def test_multimodal_fused_spmd_eval(rng):
    """The fusion model (ResNet BN eval stats + ViT branch + fusion MLP)
    under the wrapped step."""
    mods = {"rgb": rgb_modality(), "thermal": thermal_modality()}
    tr_ref = Trainer("multimodal", _cfg(), mods,
                     block_impl="flax", attention_impl="xla")
    tr_fused = Trainer("multimodal", _cfg(), mods,
                       block_impl="fused_interpret")
    assert tr_fused._eval_shard_map

    state = tr_ref.init_state(jax.random.PRNGKey(0), image_size=32)
    v = tr_ref.variables(state)
    batch = _thermal_batch(rng)
    batch["rgb"] = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    batch = jax.device_put(batch, tr_ref.batch_sharding)
    _assert_out_close(tr_ref.eval_step(v, batch),
                      tr_fused.eval_step(v, batch), atol=3e-3)


def test_q8_spmd_matches_q8_single_device(rng):
    """The int8 serving tree under the 8-device shard_map step must match
    the SAME per-device program run single-device.  With 8 rows over 8
    devices each shard is a batch-1 program, so the reference is eight
    single-device batch-1 evals — comparing against one batch-8 program
    instead would measure int8 ROUNDING amplifying XLA's batch-shape-
    dependent fp reduction order in the pre-kernel ops (measured ~1e-3 in
    probs), not the wrapper."""
    from dfu_multimodal_tpu.models.vit import quantize_variables

    mods = {"thermal": thermal_modality()}
    tr_fp = Trainer("thermal_only", _cfg(), mods,
                    block_impl="flax", attention_impl="xla")
    state = tr_fp.init_state(jax.random.PRNGKey(1), image_size=32)
    qv = quantize_variables(tr_fp.variables(state))

    tr_mesh = Trainer("thermal_only", _cfg(), mods,
                      block_impl="fused_q8_interpret")
    assert tr_mesh._eval_shard_map
    mesh1 = mesh_mod.make_mesh(devices=jax.devices()[:1])
    tr_one = Trainer("thermal_only", _cfg(), mods, mesh=mesh1,
                     block_impl="fused_q8_interpret")
    assert not tr_one._eval_shard_map

    batch = _thermal_batch(rng)
    o_mesh = tr_mesh.eval_step(
        qv, jax.device_put(batch, tr_mesh.batch_sharding))
    qv_one = jax.device_put(qv, tr_one.replicated)
    row_probs = []
    for i in range(8):
        b1 = {k: v[i:i + 1] for k, v in batch.items()}
        o = tr_one.eval_step(
            qv_one, jax.device_put(b1, tr_one.batch_sharding))
        row_probs.append(np.asarray(o["probs"])[0])
    np.testing.assert_allclose(np.asarray(o_mesh["probs"]),
                               np.asarray(row_probs), atol=1e-5)


def test_tome_fused_spmd(rng):
    """token_merge + fused blocks under the wrapped step vs the flax
    token_merge jit path (same split variables)."""
    from dfu_multimodal_tpu.models.vit import split_encoder_variables

    mods = {"thermal": thermal_modality()}
    tr_fp = Trainer("thermal_only", _cfg(), mods,
                    block_impl="flax", attention_impl="xla")
    state = tr_fp.init_state(jax.random.PRNGKey(2), image_size=32)
    sv = split_encoder_variables(tr_fp.variables(state), 2)

    kw = dict(token_merge=(2, 3))
    tr_ref = Trainer("thermal_only", _cfg(), mods, block_impl="flax",
                     attention_impl="xla", **kw)
    tr_fused = Trainer("thermal_only", _cfg(), mods,
                       block_impl="fused_interpret", **kw)
    assert tr_fused._eval_shard_map

    batch = jax.device_put(_thermal_batch(rng), tr_ref.batch_sharding)
    _assert_out_close(tr_ref.eval_step(sv, batch),
                      tr_fused.eval_step(sv, batch), atol=3e-3)


def test_train_step_rejects_mosaic_on_multidevice():
    """int8 kernels are serving-only (no VJP): training with them is
    rejected readably on ANY mesh — incl. the interpret spelling, which
    previously fell through to a raw autodiff error."""
    mods = {"thermal": thermal_modality()}
    for impl in ("fused_q8", "fused_q8_interpret", "fused_q8s"):
        tr = Trainer("thermal_only", _cfg(), mods, block_impl=impl)
        with pytest.raises(ValueError, match="serving-only"):
            tr.build_train_step()
    mesh1 = mesh_mod.make_mesh(devices=jax.devices()[:1])
    tr1 = Trainer("thermal_only", _cfg(), mods, mesh=mesh1,
                  block_impl="fused_q8")
    with pytest.raises(ValueError, match="serving-only"):
        tr1.build_train_step()
    # an ignored force flag must fail loudly, not silently return jit
    tr_rgb = Trainer("rgb_only", _cfg(), {"rgb": rgb_modality()})
    with pytest.raises(ValueError, match="force_shard_map"):
        tr_rgb.build_train_step(force_shard_map=True)


def test_serving_engine_over_shard_map_step(rng):
    """End-to-end: the ServingEngine batcher drives the wrapped step on
    the mesh and fans per-row results back out (incl. a partial bucket,
    i.e. padding rows under shard_map)."""
    from dfu_multimodal_tpu.serve.engine import ServingEngine

    mods = {"thermal": thermal_modality()}
    tr = Trainer("thermal_only", _cfg(), mods, block_impl="fused_interpret")
    state = tr.init_state(jax.random.PRNGKey(3), image_size=32)

    with ServingEngine(tr, state, image_size=32, max_batch=8,
                       max_wait_ms=20.0) as eng:
        samples = [{"thermal": rng.integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8)}
                   for _ in range(5)]          # partial bucket: 5 -> 8
        results = eng.predict(samples)
    assert len(results) == 5
    for prob, pred in results:
        assert 0.0 <= prob <= 1.0 and pred in (0, 1)

    # same samples through the plain 1-device jit path must agree
    mesh1 = mesh_mod.make_mesh(devices=jax.devices()[:1])
    tr_one = Trainer("thermal_only", _cfg(), mods, mesh=mesh1,
                     block_impl="fused_interpret")
    state_one = jax.device_put(state, tr_one.replicated)
    with ServingEngine(tr_one, state_one, image_size=32, max_batch=8,
                       max_wait_ms=20.0) as eng:
        ref = eng.predict(samples)
    np.testing.assert_allclose([p for p, _ in results],
                               [p for p, _ in ref], atol=1e-5)
    assert [c for _, c in results] == [c for _, c in ref]


# ----------------------------------------------------------- SSL under SPMD


def _ssl_cfg(**over):
    from dfu_multimodal_tpu.train.ssl import PretrainConfig

    base = dict(method="simclr", batch_size=8, num_epochs=1,
                learning_rate=1e-3, warmup_epochs=0.0,
                compute_dtype="float32")
    base.update(over)
    return PretrainConfig(**base)


def _ssl_batch(rng, b=8, s=32):
    return {"thermal": rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8),
            "valid": np.ones(b, np.float32)}


def test_simclr_spmd_reductions_match_jit(rng):
    """The SimCLR shard_map step (flax impls forced through the wrapper)
    must reproduce the jit step: all_gather restores the global NT-Xent
    negative pool, local-anchor numerators psum ÷ global valid count is
    the jit loss exactly (up to fp summation order), and the ViT trunk
    is BN/dropout-free so there is no RNG divergence at all."""
    from dfu_multimodal_tpu.train.ssl import SSLTrainer

    cfg = _ssl_cfg(vit_patch=8, vit_hidden=32, vit_depth=2, vit_heads=4)
    tr = SSLTrainer("vit", cfg, thermal_modality(), image_size=32,
                    block_impl="flax", attention_impl="xla")
    assert not tr._spmd
    state0 = tr.init_state(jax.random.PRNGKey(0), steps_per_epoch=4)
    batch = _ssl_batch(rng)
    batch["valid"][-2:] = 0.0        # padded rows out of anchors AND pool
    batch = jax.device_put(batch, tr.batch_sharding)
    key = jax.random.PRNGKey(3)

    s_jit, l_jit = tr.build_train_step()(_copy_state(state0), batch, key)
    s_shm, l_shm = tr.build_train_step(force_shard_map=True)(
        _copy_state(state0), batch, key)
    np.testing.assert_allclose(np.asarray(l_shm), np.asarray(l_jit),
                               rtol=1e-6)
    # Param tolerance is 2·lr + margin, NOT 1e-5: the psum's fp summation
    # order differs from the jit path's single reduction (~1e-10 grad
    # noise), and Adam's first step m̂/√v̂ is sign-like for near-zero
    # grads — a flipped sign moves a param by up to 2·lr (1e-3 here).
    # Structural reduction errors are caught by the tight LOSS assert
    # (and denominators scale the loss directly; Adam is scale-invariant
    # so params could never catch those anyway).
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_shm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3)


def test_simclr_spmd_fused_matches_jit(rng):
    """Fused (interpret) ViT blocks inside the SimCLR shard_map step —
    the round-5 fix for ssl.py's blanket XLA override on multi-device
    meshes — track the flax jit step within the GELU-approximation
    budget, across two optimizer steps."""
    from dfu_multimodal_tpu.train.ssl import SSLTrainer

    cfg = _ssl_cfg()                     # full ViT-B cfg (5 tokens at 32)
    tr_ref = SSLTrainer("vit", cfg, thermal_modality(), image_size=32,
                        block_impl="flax", attention_impl="xla")
    tr_fused = SSLTrainer("vit", cfg, thermal_modality(), image_size=32,
                          block_impl="fused_interpret")
    assert tr_fused._spmd                # explicit mosaic request
    tr_fused.make_tx(4)                  # same schedule as ref's init
    state0 = tr_ref.init_state(jax.random.PRNGKey(0), steps_per_epoch=4)
    batch = jax.device_put(_ssl_batch(rng), tr_ref.batch_sharding)

    s_ref, s_fused = _copy_state(state0), _copy_state(state0)
    for i in range(2):
        key = jax.random.PRNGKey(11 + i)
        s_ref, l_ref = tr_ref.train_step(s_ref, batch, key)
        s_fused, l_f = tr_fused.train_step(s_fused, batch, key)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                                   atol=3e-3)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_ssl_spmd_gates():
    """Readable rejections: fused impls on a multi-device mesh outside
    the SimCLR/ViT wrapper; MAE never takes mosaic impls; an ignored
    force flag fails loudly."""
    from dfu_multimodal_tpu.train.ssl import SSLTrainer

    with pytest.raises(ValueError, match="shard_map SimCLR"):
        SSLTrainer("resnet", _ssl_cfg(), rgb_modality(), image_size=32,
                   block_impl="fused_interpret")
    with pytest.raises(ValueError, match="197-token"):
        SSLTrainer("vit", _ssl_cfg(method="mae"), thermal_modality(),
                   image_size=32, block_impl="fused")
    tr = SSLTrainer("tiny", _ssl_cfg(), rgb_modality(), image_size=32)
    tr.make_tx(4)
    with pytest.raises(ValueError, match="force_shard_map"):
        tr.build_train_step(force_shard_map=True)


# ------------------------------------------------------------ KD under SPMD


def _kd_trainers(rng, teacher_impls, *, drop=0.0):
    """(teacher Trainer+state, DistillTrainer) on the 8-device mesh."""
    from dfu_multimodal_tpu.config import TrainConfig
    from dfu_multimodal_tpu.train.distill import (DistillConfig,
                                                  DistillTrainer)

    cfg = TrainConfig(batch_size=8, compute_dtype="float32",
                      drop_rate=drop)
    mods = {"rgb": rgb_modality(), "thermal": thermal_modality()}
    t_tr = Trainer("thermal_only", cfg, mods,
                   block_impl="flax", attention_impl="xla")
    t_state = t_tr.init_state(jax.random.PRNGKey(1), image_size=32)
    dtr = DistillTrainer("tiny_rgb", "thermal_only",
                         t_tr.variables(t_state), DistillConfig(),
                         cfg, mods, **teacher_impls)
    return t_tr, t_state, dtr


def test_kd_spmd_reductions_match_jit(rng):
    """The shard_map KD step (flax impls forced through the wrapper) must
    reproduce the jit KD step: numerators psum'd, param-independent
    denominators psum'd BEFORE the grad, student BN cross-shard via the
    late bn_axis_name bind.  drop_rate=0 removes the dropout-stream
    divergence."""
    t_tr, t_state, dtr = _kd_trainers(
        rng, dict(teacher_block_impl="flax",
                  teacher_attention_impl="xla"))
    assert not dtr._kd_spmd
    state0 = dtr.init_state(jax.random.PRNGKey(2), image_size=32)
    batch = _thermal_batch(rng)
    batch["rgb"] = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    batch["valid"][-2:] = 0.0
    batch = jax.device_put(batch, dtr.batch_sharding)
    key = jax.random.PRNGKey(3)

    s_jit, m_jit = dtr.build_train_step()(_copy_state(state0), batch, key)
    s_shm, m_shm = dtr.build_train_step(force_shard_map=True)(
        _copy_state(state0), batch, key)
    np.testing.assert_allclose(np.asarray(m_shm["loss"]),
                               np.asarray(m_jit["loss"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_shm["counts"]),
                                  np.asarray(m_jit["counts"]))
    # 2·lr + margin, not 1e-5: psum fp-order noise through Adam's
    # sign-like first step (see test_simclr_spmd_reductions_match_jit)
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_shm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3)
    # cross-shard BN: updated running stats replica-consistent AND equal
    # to the jit path's global-batch statistics
    for a, b in zip(jax.tree.leaves(s_jit.batch_stats),
                    jax.tree.leaves(s_shm.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_kd_spmd_fused_teacher_matches_jit(rng):
    """A fused (interpret) ViT TEACHER inside the shard_map KD step — the
    reason this path exists: the longest-running KD configuration keeps
    the fused Pallas teacher forward on multi-chip DP — tracks the flax
    jit step within the GELU-approximation budget."""
    t_tr, t_state, dtr_fused = _kd_trainers(
        rng, dict(teacher_block_impl="fused_interpret"))
    assert dtr_fused._kd_spmd      # explicit mosaic request activates it
    _, _, dtr_ref = _kd_trainers(
        rng, dict(teacher_block_impl="flax",
                  teacher_attention_impl="xla"))
    state0 = dtr_ref.init_state(jax.random.PRNGKey(2), image_size=32)
    batch = _thermal_batch(rng)
    batch["rgb"] = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    batch = jax.device_put(batch, dtr_ref.batch_sharding)
    key = jax.random.PRNGKey(4)

    s_ref, m_ref = dtr_ref.build_train_step()(_copy_state(state0), batch,
                                              key)
    s_f, m_f = dtr_fused.build_train_step()(_copy_state(state0), batch,
                                            key)
    np.testing.assert_allclose(np.asarray(m_f["loss"]),
                               np.asarray(m_ref["loss"]), atol=3e-3)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_kd_rejects_mosaic_outside_pure_dp(rng):
    """On a non-pure-DP mesh the KD step cannot shard_map (params are
    sharded); mosaic impls must be rejected readably, not die in the
    auto-partitioner."""
    from dfu_multimodal_tpu.config import MeshConfig, TrainConfig
    from dfu_multimodal_tpu.train.distill import (DistillConfig,
                                                  DistillTrainer)

    cfg = TrainConfig(batch_size=8, compute_dtype="float32",
                      mesh=MeshConfig(data=4, model=2))
    mods = {"rgb": rgb_modality(), "thermal": thermal_modality()}
    t_tr = Trainer("thermal_only",
                   TrainConfig(batch_size=8, compute_dtype="float32"),
                   mods, block_impl="flax", attention_impl="xla")
    t_state = t_tr.init_state(jax.random.PRNGKey(1), image_size=32)
    dtr = DistillTrainer("tiny_rgb", "thermal_only",
                         t_tr.variables(t_state), DistillConfig(), cfg,
                         mods, teacher_block_impl="fused_interpret")
    assert not dtr._kd_spmd
    with pytest.raises(ValueError, match="shard_map KD path"):
        dtr.build_train_step()
    with pytest.raises(ValueError, match="pure-DP"):
        dtr.build_train_step(force_shard_map=True)


# --------------------------------------------------- train step under SPMD


def _copy_state(state):
    import jax.numpy as jnp
    return jax.jit(lambda t: jax.tree.map(jnp.copy, t))(state)


def test_spmd_train_step_reductions_bit_exact(rng):
    """The shard_map train wrapper (flax impls forced through it) must be
    BIT-EXACT vs the jit path: augmentation draws each row's key from the
    global split-stream (sliced per shard), the unnormalized-grad psum ÷
    global weight mass is the same arithmetic as ∇(Σw·ce/Σw), and the
    optimizer update is replicated.  drop_rate=0 removes the one
    documented RNG divergence (shard-shaped dropout masks)."""
    from dfu_multimodal_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=8, compute_dtype="float32", drop_rate=0.0)
    mods = {"thermal": thermal_modality()}
    tr = Trainer("thermal_only", cfg, mods,
                 block_impl="flax", attention_impl="xla")
    state0 = tr.init_state(jax.random.PRNGKey(0), image_size=32)
    batch = jax.device_put(_thermal_batch(rng), tr.batch_sharding)
    key = jax.random.PRNGKey(5)

    s_jit, m_jit = tr.train_step(_copy_state(state0), batch, key)
    s_shm, m_shm = tr.build_train_step(force_shard_map=True)(
        _copy_state(state0), batch, key)
    np.testing.assert_array_equal(np.asarray(m_jit["loss"]),
                                  np.asarray(m_shm["loss"]))
    np.testing.assert_array_equal(np.asarray(m_jit["counts"]),
                                  np.asarray(m_shm["counts"]))
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_shm.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spmd_train_step_fused_matches_jit(rng):
    """Fused (interpret) kernels inside the shard_map train step track
    the flax jit step within the fused GELU-approximation budget, across
    TWO optimizer steps (state threads through the wrapper)."""
    from dfu_multimodal_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=8, compute_dtype="float32", drop_rate=0.0)
    mods = {"thermal": thermal_modality()}
    tr_ref = Trainer("thermal_only", cfg, mods,
                     block_impl="flax", attention_impl="xla")
    tr_fused = Trainer("thermal_only", cfg, mods,
                       block_impl="fused_interpret")
    state0 = tr_ref.init_state(jax.random.PRNGKey(0), image_size=32)
    batch = jax.device_put(_thermal_batch(rng), tr_ref.batch_sharding)

    s_ref, s_fused = _copy_state(state0), _copy_state(state0)
    for i in range(2):
        key = jax.random.PRNGKey(11 + i)
        s_ref, m_ref = tr_ref.train_step(s_ref, batch, key)
        s_fused, m_fused = tr_fused.train_step(s_fused, batch, key)
        np.testing.assert_allclose(np.asarray(m_fused["loss"]),
                                   np.asarray(m_ref["loss"]), atol=3e-3)
        np.testing.assert_array_equal(np.asarray(m_fused["counts"]),
                                      np.asarray(m_ref["counts"]))
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_spmd_train_gate_conditions(rng):
    """Configurations outside the wrapper's scope still reject mosaic
    impls readably (mixup for both families; grad-accum for the BN model,
    whose batch-GLOBAL microbatch statistics the per-shard scan cannot
    reproduce), while thermal+accum and plain multimodal BUILD the
    wrapped step (round-5: accum composes for BN-free models)."""
    from dfu_multimodal_tpu.config import TrainConfig

    mods = {"thermal": thermal_modality()}
    mm_mods = {"rgb": rgb_modality(), "thermal": thermal_modality()}
    mix_cfg = TrainConfig(batch_size=8, compute_dtype="float32",
                          mixup_alpha=0.2)
    tr = Trainer("thermal_only", mix_cfg, mods, block_impl="fused")
    with pytest.raises(ValueError, match="shard_map path"):
        tr.build_train_step()
    accum_cfg = TrainConfig(batch_size=8, compute_dtype="float32",
                            grad_accum=2)
    for cfg in (mix_cfg, accum_cfg):
        mm = Trainer("multimodal", cfg, mm_mods, block_impl="fused")
        assert getattr(mm.module, "bn_axis_name", None) is None
        with pytest.raises(ValueError, match="shard_map path"):
            mm.build_train_step()
    # thermal_only (BN-free) + grad-accum: the shard_map step builds
    tr_acc = Trainer("thermal_only", accum_cfg, mods,
                     block_impl="fused_interpret")
    assert tr_acc.build_train_step() is not None
    # ... but only when accum divides the PER-DEVICE batch: batch 8 on
    # 8 devices with accum 2 keeps the jit path (which only needs the
    # GLOBAL batch divisible — a round-4 working config must not break).
    # Real Mosaic impls then reject readably; interpret impls lower to
    # partitionable XLA ops, so they (like flax) build the jit step.
    indiv_cfg = TrainConfig(batch_size=8, compute_dtype="float32",
                            grad_accum=2)
    tr_mosaic = Trainer("thermal_only", indiv_cfg, mods,
                        block_impl="fused")
    with pytest.raises(ValueError, match="shard_map path"):
        tr_mosaic.build_train_step()
    tr_indiv = Trainer("thermal_only", indiv_cfg, mods,
                       block_impl="fused_interpret")
    with pytest.raises(ValueError, match="force_shard_map"):
        tr_indiv.build_train_step(force_shard_map=True)
    assert tr_indiv.build_train_step() is not None   # jit fallback
    tr_jit = Trainer("thermal_only", indiv_cfg, mods,
                     block_impl="flax", attention_impl="xla")
    assert tr_jit.build_train_step() is not None
    mm = Trainer("multimodal",
                 TrainConfig(batch_size=8, compute_dtype="float32"),
                 mm_mods, block_impl="fused")
    assert getattr(mm.module, "bn_axis_name", None) == "data"
    assert mm.build_train_step() is not None


def test_spmd_train_accum_matches_jit_accum(rng):
    """Grad-accum inside the shard_map step: per-device microbatch scan
    of unnormalized grads + ONE psum ÷ global Σw must reproduce the jit
    accum step — the microbatch REGROUPING (per-device slices vs global
    slices) is exact because the total is linear in per-row
    contributions.  Flax impls forced through the wrapper; drop_rate=0
    removes the dropout-stream divergence."""
    from dfu_multimodal_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=16, compute_dtype="float32", drop_rate=0.0,
                      grad_accum=2)
    mods = {"thermal": thermal_modality()}
    tr = Trainer("thermal_only", cfg, mods,
                 block_impl="flax", attention_impl="xla")
    state0 = tr.init_state(jax.random.PRNGKey(0), image_size=32)
    batch = _thermal_batch(rng, b=16)   # 2 rows/device -> 1 per microbatch
    batch["valid"][-1] = 0.0            # a padded row crosses microbatches
    batch = jax.device_put(batch, tr.batch_sharding)
    key = jax.random.PRNGKey(5)

    s_jit, m_jit = tr.train_step(_copy_state(state0), batch, key)
    s_shm, m_shm = tr.build_train_step(force_shard_map=True)(
        _copy_state(state0), batch, key)
    np.testing.assert_allclose(np.asarray(m_shm["loss"]),
                               np.asarray(m_jit["loss"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_shm["counts"]),
                                  np.asarray(m_jit["counts"]))
    # 2·lr + margin, not 1e-5: the microbatch REGROUPING changes fp
    # summation order (~1e-10 grad noise), which Adam's sign-like first
    # step amplifies to up to 2·lr per param (see
    # test_simclr_spmd_reductions_match_jit); the tight loss assert
    # carries the structural check.
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_shm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3)


def test_spmd_train_accum_fused(rng):
    """Fused (interpret) kernels inside the accum shard_map step track
    the flax jit accum step within the GELU-approximation budget."""
    from dfu_multimodal_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=16, compute_dtype="float32", drop_rate=0.0,
                      grad_accum=2)
    mods = {"thermal": thermal_modality()}
    tr_ref = Trainer("thermal_only", cfg, mods,
                     block_impl="flax", attention_impl="xla")
    tr_fused = Trainer("thermal_only", cfg, mods,
                       block_impl="fused_interpret")
    assert tr_fused._eval_shard_map
    state0 = tr_ref.init_state(jax.random.PRNGKey(0), image_size=32)
    batch = jax.device_put(_thermal_batch(rng, b=16), tr_ref.batch_sharding)
    key = jax.random.PRNGKey(7)

    s_ref, m_ref = tr_ref.train_step(_copy_state(state0), batch, key)
    s_fused, m_fused = tr_fused.train_step(_copy_state(state0), batch, key)
    np.testing.assert_allclose(np.asarray(m_fused["loss"]),
                               np.asarray(m_ref["loss"]), atol=3e-3)
    np.testing.assert_array_equal(np.asarray(m_fused["counts"]),
                                  np.asarray(m_ref["counts"]))
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_spmd_train_step_multimodal_bn_sync(rng):
    """The BN-carrying multimodal model trains under shard_map once
    cross-shard BatchNorm is bound (models/resnet.py bn_axis_name, set
    by the Trainer): batch stats pmean over ``data`` reproduces the jit
    path's global-batch BN — updated running stats must be replica-
    consistent and match the jit step, params within the fused kernels'
    tolerance."""
    from dfu_multimodal_tpu.config import TrainConfig

    cfg = TrainConfig(batch_size=8, compute_dtype="float32", drop_rate=0.0)
    mods = {"rgb": rgb_modality(), "thermal": thermal_modality()}
    tr_ref = Trainer("multimodal", cfg, mods,
                     block_impl="flax", attention_impl="xla")
    tr_fused = Trainer("multimodal", cfg, mods,
                       block_impl="fused_interpret")
    assert getattr(tr_fused.module, "bn_axis_name", None) == "data"

    state0 = tr_ref.init_state(jax.random.PRNGKey(0), image_size=32)
    batch = _thermal_batch(rng)
    batch["rgb"] = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    batch = jax.device_put(batch, tr_ref.batch_sharding)
    key = jax.random.PRNGKey(5)

    s_jit, m_jit = tr_ref.train_step(_copy_state(state0), batch, key)
    s_f, m_f = tr_fused.train_step(_copy_state(state0), batch, key)
    np.testing.assert_allclose(np.asarray(m_f["loss"]),
                               np.asarray(m_jit["loss"]), atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_jit.batch_stats),
                    jax.tree.leaves(s_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_jit.params),
                    jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)
    # replicated state must be bit-consistent across shards
    lead = jax.tree.leaves(s_f.batch_stats)[0]
    shards = [np.asarray(sh.data) for sh in lead.addressable_shards]
    assert all(np.array_equal(shards[0], s) for s in shards[1:])
