"""Mesh construction, batch padding, multi-host shard math, graft dryrun."""

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


def test_graft_dryrun_8_devices():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
