"""Mesh construction, batch padding, multi-host shard math, graft dryrun."""

import os

import numpy as np
import pytest

import jax

from dfu_multimodal_tpu.config import MeshConfig
from dfu_multimodal_tpu.parallel import mesh as mesh_mod


def test_make_mesh_all_devices():
    m = mesh_mod.make_mesh(MeshConfig(data=-1, model=1))
    assert m.shape["data"] == len(jax.devices())
    assert m.shape["model"] == 1


def test_make_mesh_2d():
    m = mesh_mod.make_mesh(MeshConfig(data=4, model=2))
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(MeshConfig(data=16, model=2))


def test_pad_batch_to_mesh():
    m = mesh_mod.make_mesh(MeshConfig(data=8))
    assert mesh_mod.pad_batch_to_mesh(6, m) == 8
    assert mesh_mod.pad_batch_to_mesh(8, m) == 8
    assert mesh_mod.pad_batch_to_mesh(9, m) == 16


def test_process_shard_single_host():
    start, stop = mesh_mod.process_shard(32)
    assert (start, stop) == (0, 32)


def test_batch_sharding_places_shards():
    import jax.numpy as jnp
    m = mesh_mod.make_mesh(MeshConfig(data=8))
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = jax.device_put(x, mesh_mod.batch_sharding(m))
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), x)
    # replicated params live on every device
    p = jax.device_put(jnp.ones(3), mesh_mod.replicated(m))
    assert p.sharding.is_fully_replicated


def test_tp_param_specs_rules():
    from dfu_multimodal_tpu.parallel.sharding import tp_param_specs
    from jax.sharding import PartitionSpec as P
    variables = {
        "params": {
            "ViT_0": {"encoder": {
                "mlp_fc1": {"kernel": np.zeros((12, 768, 3072)),
                            "bias": np.zeros((12, 3072))},
                "mlp_fc2": {"kernel": np.zeros((12, 3072, 768)),
                            "bias": np.zeros((12, 768))},
            }},
            "head": {"kernel": np.zeros((768, 2))},
        }
    }
    specs = tp_param_specs(variables)
    enc = specs["params"]["ViT_0"]["encoder"]
    assert enc["mlp_fc1"]["kernel"] == P(None, None, "model")
    assert enc["mlp_fc1"]["bias"] == P(None, "model")
    assert enc["mlp_fc2"]["kernel"] == P(None, "model", None)
    assert enc["mlp_fc2"]["bias"] == P()
    assert specs["params"]["head"]["kernel"] == P()


def test_fsdp_param_specs_shard_largest_divisible_dim():
    from dfu_multimodal_tpu.parallel.sharding import fsdp_param_specs
    from jax.sharding import PartitionSpec as P
    m = mesh_mod.make_mesh(MeshConfig(data=8))
    variables = {
        "params": {
            "encoder": {"qkv": {"kernel": np.zeros((12, 768, 2304)),
                                "bias": np.zeros((12, 2304))},
                        "ln": {"scale": np.zeros((12, 768))}},
            "head": {"kernel": np.zeros((768, 2)),    # 2 not divisible
                     "bias": np.zeros((2,))},          # tiny -> replicated
        }
    }
    specs = fsdp_param_specs(variables, m)
    enc = specs["params"]["encoder"]
    # largest data-divisible dim shards (2304 > 768 > 12)
    assert enc["qkv"]["kernel"] == P(None, None, "data")
    assert enc["qkv"]["bias"] == P(None, "data")
    # (12, 768): 768 divisible and the leaf is big enough -> sharded
    assert enc["ln"]["scale"] == P(None, "data")
    # head kernel: only 768 divisible -> shard dim 0; bias tiny -> P()
    assert specs["params"]["head"]["kernel"] == P("data", None)
    assert specs["params"]["head"]["bias"] == P()


def test_fsdp_matches_data_parallel():
    """ZeRO-3 param sharding over the data axis must reproduce the
    replicated-DP loss exactly — FSDP changes placement (and therefore
    per-device memory), never semantics. Also asserts the big param
    leaves really are sharded, not silently replicated."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer

    rng = np.random.default_rng(0)
    batch = {
        "thermal": rng.integers(0, 255, (8, 32, 32, 3), np.uint8),
        "label": rng.integers(0, 2, 8).astype(np.int32),
        "valid": np.ones(8, np.float32),
    }

    losses = {}
    for name, mesh_cfg in (
            ("dp", config.MeshConfig(data=8, model=1)),
            ("fsdp", config.MeshConfig(data=8, model=1, fsdp=True))):
        cfg = config.TrainConfig(batch_size=8, compute_dtype="float32",
                                 seed=0, mesh=mesh_cfg)
        trainer = Trainer("thermal_only", cfg,
                          {"thermal": config.thermal_modality()},
                          attention_impl="xla")
        state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
        if name == "fsdp":
            # inspect BEFORE the step donates the state: the encoder's
            # stacked qkv kernel must be genuinely sharded, with
            # per-device bytes 1/8 of the replicated layout
            qkv = state.params["ViT_0"]["encoder"]["attn"]["qkv"]["kernel"]
            assert not qkv.sharding.is_fully_replicated
            assert qkv.addressable_shards[0].data.size == qkv.size // 8
        b = jax.device_put(batch, trainer.batch_sharding)
        _, m = trainer.train_step(state, b, jax.random.PRNGKey(1))
        losses[name] = float(m["loss"])

    assert np.isfinite(losses["fsdp"])
    assert losses["fsdp"] == pytest.approx(losses["dp"], rel=1e-5)


def test_fsdp_rejects_model_axis_combination():
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer
    cfg = config.TrainConfig(
        batch_size=8, mesh=config.MeshConfig(data=2, model=4, fsdp=True))
    with pytest.raises(ValueError, match="fsdp"):
        Trainer("thermal_only", cfg,
                {"thermal": config.thermal_modality()})


def test_tensor_parallel_matches_data_parallel():
    """A (2 data × 4 model) TP+DP train step must reproduce the pure-DP
    loss — TP only changes layout, never semantics."""
    import jax.numpy as jnp
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer

    rng = np.random.default_rng(0)
    batch = {
        "thermal": rng.integers(0, 255, (8, 32, 32, 3), np.uint8),
        "label": rng.integers(0, 2, 8).astype(np.int32),
        "valid": np.ones(8, np.float32),
    }

    losses = {}
    for name, mesh_cfg in (("dp", config.MeshConfig(data=8, model=1)),
                           ("tp", config.MeshConfig(data=2, model=4))):
        cfg = config.TrainConfig(batch_size=8, compute_dtype="float32",
                                 seed=0, mesh=mesh_cfg)
        trainer = Trainer("thermal_only", cfg,
                          {"thermal": config.thermal_modality()},
                          attention_impl="xla")
        state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
        b = jax.device_put(batch, trainer.batch_sharding)
        _, m = trainer.train_step(state, b, jax.random.PRNGKey(1))
        losses[name] = float(m["loss"])
    assert np.isfinite(losses["tp"])
    assert losses["tp"] == pytest.approx(losses["dp"], rel=1e-5)


def test_gpipe_schedule_matches_sequential():
    """The GPipe scan (4 stages x 3 microbatches, ppermute hops) must equal
    plain sequential layer application, forward and backward."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from dfu_multimodal_tpu.parallel import pipeline as pp

    mesh = pp.make_pp_mesh(data=1, stage=4)
    weights = np.linspace(0.5, 2.0, 4).astype(np.float32)   # one per stage
    mb = np.arange(3 * 2 * 4, dtype=np.float32).reshape(3, 2, 4) / 10.0

    def stage_apply(w, x):                  # w: this stage's (1,) shard
        return jnp.tanh(x * w[0] + 0.1)

    def run(w, m):
        body = jax.shard_map(
            lambda wl, ml: pp.gpipe(stage_apply, wl, ml, num_stages=4),
            mesh=mesh, in_specs=(P("stage"), P()), out_specs=P())
        return body(w, m)

    got = jax.jit(run)(weights, mb)
    want = mb
    for w in weights:
        want = np.tanh(want * w + 0.1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # gradient flows through ppermute/scan to EVERY stage's weight
    def loss(w, m):
        return jnp.sum(run(w, m) ** 2)

    def loss_seq(w, m):
        y = m
        for i in range(4):
            y = jnp.tanh(y * w[i] + 0.1)
        return jnp.sum(y ** 2)

    g_pp = jax.grad(loss)(jnp.asarray(weights), jnp.asarray(mb))
    g_seq = jax.grad(loss_seq)(jnp.asarray(weights), jnp.asarray(mb))
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_seq),
                               rtol=1e-5)


def test_vit_pipeline_matches_plain_forward_and_grad():
    """A (2 data x 4 stage) pipelined ViT trunk must reproduce the plain
    scanned forward, and the pipelined ENCODER must reproduce sequential
    block application's gradients — pipelining changes schedule, never math
    (parallel/pipeline.py).

    Gradient parity is checked at the encoder level (tokens -> tokens):
    through the full untrained classifier the interesting param grads are
    ~1e-5 against O(30) cotangents (final-LN washout), so any program
    reordering shows up as 10%-relative fp32 cancellation noise — a
    conditioning artifact, not a schedule bug (the forward stays exact)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from dfu_multimodal_tpu.models.vit import EncoderBlock, ViT
    from dfu_multimodal_tpu.parallel import pipeline as pp

    module = ViT(patch_size=8, hidden_dim=128, depth=4, num_heads=4,
                 dtype=jnp.float32, attention_impl="xla",
                 block_impl="flax", scan_blocks=True)
    x = np.random.default_rng(0).normal(
        size=(8, 32, 32, 3)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(module.apply(variables, jnp.asarray(x)))

    mesh = pp.make_pp_mesh(data=2, stage=4)
    fn = pp.vit_pipeline_fn(mesh, depth=4, num_heads=4,
                            num_microbatches=2, dtype=jnp.float32,
                            patch_size=8, attention_impl="xla")
    got = np.asarray(jax.jit(fn)(variables["params"], jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Encoder-level gradient parity: pipelined blocks vs sequential scan.
    enc = variables["params"]["encoder"]       # stacked (4, ...) leaves
    tokens = jnp.asarray(np.random.default_rng(1).normal(
        size=(8, 17, 128)).astype(np.float32))
    block = EncoderBlock(4, 4, jnp.float32, "xla")

    def stage_apply(stack, t):
        y, _ = jax.lax.scan(
            lambda c, p: (block.apply({"params": p}, c, None)[0], None),
            t, stack)
        return y

    def loss_pp(params):
        body = jax.shard_map(
            lambda pl_, mb: pp.gpipe(stage_apply, pl_, mb, num_stages=4),
            mesh=mesh,
            in_specs=(jax.tree.map(
                lambda a: P("stage", *([None] * (a.ndim - 1))), params),
                P(None, "data", None, None)),
            out_specs=P(None, "data", None, None))
        mb = tokens.reshape(2, 4, 17, 128)
        return jnp.sum(body(params, mb) ** 2)

    def loss_seq(params):
        return jnp.sum(stage_apply(params, tokens) ** 2)

    g_pp = jax.grad(loss_pp)(enc)
    g_seq = jax.grad(loss_seq)(enc)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_seq = dict(jax.tree_util.tree_leaves_with_path(g_seq))
    assert flat_pp and len(flat_pp) == len(flat_seq)
    for path, leaf in flat_pp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_seq[path]),
            rtol=1e-4, atol=1e-2, err_msg=jax.tree_util.keystr(path))


def test_graft_dryrun_8_devices():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_multiprocess_execution_two_hosts():
    """Multi-host-shaped execution: 2 OS processes x 4 virtual CPU devices
    stitched by jax.distributed into one 8-device mesh; per-process data
    shards (parallel.mesh.process_shard) feed a batch-sharded global array
    and a jitted global reduction crosses processes (gloo collectives).
    ROADMAP #6; the reference has no distributed code at all (SURVEY §2.3).
    """
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    worker = repo / "scripts_dev" / "multihost_worker.py"
    with socket.socket() as s:          # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    procs = [subprocess.Popen(
                 [sys.executable, str(worker), str(r), "2", str(port)],
                 stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                 text=True, env=env, cwd=repo)
             for r in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    sums = [line.split()[1] for out in outs for line in out.splitlines()
            if line.startswith("MULTIHOST_OK")]
    assert len(sums) == 2 and sums[0] == sums[1], outs

    # Stage 2: the REAL Trainer epoch — both ranks must agree with each
    # other AND with the identical epoch run single-process (this process,
    # 8 virtual devices, same seeds): multi-host data feeding changes the
    # batch formation, never the math.
    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("MULTIHOST_TRAIN_OK")]
    assert len(losses) == 2, outs
    assert losses[0] == losses[1], outs

    # Stage 3 (round 4): multi-host FSDP — both ranks ran a ZeRO-3
    # epoch on the same data.  Its loss must match the DP epoch (FSDP is
    # placement, not different math), each rank held only its half of
    # the sharded leaves (frac printed by the worker, asserted there),
    # and the write-gated collective checkpoint round-tripped on rank 0.
    fsdp_lines = [line.split()[1:] for out in outs
                  for line in out.splitlines()
                  if line.startswith("MULTIHOST_FSDP_OK")]
    assert len(fsdp_lines) == 2, outs
    assert fsdp_lines[0][0] == fsdp_lines[1][0], fsdp_lines
    assert float(fsdp_lines[0][0]) == pytest.approx(float(losses[0]),
                                                    rel=2e-4), (
        fsdp_lines, losses)
    assert any("MULTIHOST_CKPT_OK" in out for out in outs), outs
    # Stage 4: restore of the multi-host FSDP checkpoint on BOTH ranks
    # (exercises put_global's device-array pass-through/reshard)
    restores = [line for out in outs for line in out.splitlines()
                if line.startswith("MULTIHOST_RESTORE_OK")]
    assert len(restores) == 2 and restores[0] == restores[1], outs
    # Stage 5 (round 5): the fused-kernel shard_map eval AND train steps
    # executed across the 2-process mesh (explicit psums over gloo) with
    # interpret-mode Pallas kernels, at parity with the jit/XLA programs
    # — certifying the round-4 wrapper composes with jax.distributed,
    # not just single-process virtual devices.
    fused_eval = [line for out in outs for line in out.splitlines()
                  if line.startswith("MULTIHOST_FUSED_SPMD_OK")]
    assert len(fused_eval) == 2 and fused_eval[0] == fused_eval[1], outs
    fused_train = [line for out in outs for line in out.splitlines()
                   if line.startswith("MULTIHOST_FUSED_TRAIN_OK")]
    assert len(fused_train) == 2 and fused_train[0] == fused_train[1], outs

    import jax.numpy  # noqa: F401  (jax already imported at module scope)
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.loader import ArrayDataset
    from dfu_multimodal_tpu.train.engine import Trainer

    rng_np = np.random.default_rng(42)
    labels = np.tile(np.array([0, 1], np.int32), 8)
    imgs = (labels[:, None, None, None] * 64
            + rng_np.integers(0, 128, (16, 32, 32, 3))).astype(np.uint8)
    ds = ArrayDataset(arrays={"thermal": imgs}, labels=labels)
    cfg = config.TrainConfig(batch_size=8, compute_dtype="float32", seed=0,
                             mesh=config.MeshConfig(data=8, model=1))
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality()},
                      attention_impl="xla")
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
    _, em = trainer.run_train_epoch(state, ds, np.random.default_rng(7),
                                    jax.random.PRNGKey(3))
    assert float(losses[0]) == pytest.approx(em.loss, rel=2e-4), (
        losses, em.loss)


def test_mosaic_impls_on_multidevice_mesh():
    """Mosaic (Pallas TPU) kernels can't be partitioned by automatic SPMD
    (jax tpu_custom_call raises under any multi-device jit). Round 4:
    explicit kernel requests on a pure-DP mesh are ACCEPTED — the eval/
    serving step runs them inside shard_map, and the BN-free thermal
    TRAIN step does too (tests/test_spmd_fused.py) — while BN models
    still reject for training and param-sharded meshes (TP/FSDP) reject
    at construction."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.models.common import mosaic_kernels_ok
    from dfu_multimodal_tpu.train.engine import Trainer

    assert mosaic_kernels_ok() is False        # CPU test process

    cfg = config.TrainConfig(batch_size=8,
                             mesh=config.MeshConfig(data=8))
    mods = {"thermal": config.thermal_modality()}
    for kw in ({"block_impl": "fused"}, {"attention_impl": "pallas"}):
        tr = Trainer("thermal_only", cfg, mods, **kw)
        assert tr._eval_shard_map            # serving path is wrapped
        assert tr.build_train_step() is not None   # shard_map train path
    mm = Trainer("multimodal", cfg,
                 {"rgb": config.rgb_modality(),
                  "thermal": config.thermal_modality()},
                 block_impl="fused")
    # multimodal now rides the wrapper too (cross-shard BN; round 4)
    assert mm.build_train_step() is not None
    tp_cfg = config.TrainConfig(batch_size=8,
                                mesh=config.MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="partitioner"):
        Trainer("thermal_only", tp_cfg, mods, block_impl="fused")


def test_fsdp_batchnorm_model_matches_data_parallel():
    """FSDP with a BatchNorm/conv model: sharded params must not change
    the loss OR the (replicated) global-batch BN statistics."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer

    rng = np.random.default_rng(1)
    batch = {
        "rgb": rng.integers(0, 255, (16, 32, 32, 3), np.uint8),
        "label": rng.integers(0, 2, 16).astype(np.int32),
        "valid": np.ones(16, np.float32),
    }
    out = {}
    for name, mesh_cfg in (
            ("dp", config.MeshConfig(data=8)),
            ("fsdp", config.MeshConfig(data=8, fsdp=True))):
        cfg = config.TrainConfig(batch_size=16, compute_dtype="float32",
                                 seed=0, mesh=mesh_cfg)
        trainer = Trainer("tiny_rgb", cfg, {"rgb": config.rgb_modality()})
        state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)
        b = jax.device_put(batch, trainer.batch_sharding)
        new_state, m = trainer.train_step(state, b, jax.random.PRNGKey(1))
        out[name] = (float(m["loss"]),
                     np.asarray(new_state.batch_stats["bn0"]["mean"]))
    assert out["fsdp"][0] == pytest.approx(out["dp"][0], rel=1e-5)
    np.testing.assert_allclose(out["fsdp"][1], out["dp"][1], rtol=1e-5)


def test_fsdp_restore_places_opt_state_sharded(tmp_path):
    """--resume-from on an FSDP run must re-shard the OPTIMIZER state
    (mu/nu mirror the params): left as host arrays they would replicate
    per device and break the ZeRO-3 memory contract exactly on resume."""
    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.train.engine import Trainer
    from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod

    cfg = config.TrainConfig(batch_size=8, compute_dtype="float32",
                             seed=0,
                             mesh=config.MeshConfig(data=8, fsdp=True))
    trainer = Trainer("thermal_only", cfg,
                      {"thermal": config.thermal_modality()},
                      attention_impl="xla")
    state = trainer.init_state(jax.random.PRNGKey(0), image_size=32)

    def qkv_mu(opt_state):
        leaves = [l for l in jax.tree_util.tree_leaves(opt_state)
                  if hasattr(l, "shape") and l.ndim == 3
                  and l.shape[-1] == 2304]
        assert leaves, "no qkv-shaped mu/nu leaf found"
        return leaves[0]

    fresh = qkv_mu(state.opt_state)
    assert not fresh.sharding.is_fully_replicated

    ckpt_mod.save_checkpoint(tmp_path, epoch=1,
                             model_state=trainer.variables(state),
                             opt_state=state.opt_state, val_f1=0.5,
                             history={}, extra_meta={"model": "thermal_only"})
    restored = trainer.restore(tmp_path, image_size=32,
                               with_opt_state=True)
    mu = qkv_mu(restored.opt_state)
    assert not mu.sharding.is_fully_replicated, (
        "restored FSDP optimizer state lost its ZeRO-3 sharding")
    assert mu.addressable_shards[0].data.size == mu.size // 8
    # params too (pre-existing behavior, still holds)
    qkv = restored.params["ViT_0"]["encoder"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # and the restored state still trains
    rng = np.random.default_rng(0)
    b = jax.device_put(
        {"thermal": rng.integers(0, 255, (8, 32, 32, 3), np.uint8),
         "label": rng.integers(0, 2, 8).astype(np.int32),
         "valid": np.ones(8, np.float32)}, trainer.batch_sharding)
    _, m = trainer.train_step(restored, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
