"""Minimal repro driver for the XLA:CPU scanned-ViT train-step abort.

Usage: python scripts_dev/repro_scan_abort.py [extra_xla_flags...]
Runs the SCANNED thermal train step on the 8-device virtual CPU mesh and
prints SCANNED_OK, or dies (historically: silent SIGABRT in the thunk
executor's Eigen worker pool).
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DFU_VIT_SCAN_BLOCKS"] = "1"
extra = " ".join(sys.argv[1:])
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + extra)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from dfu_multimodal_tpu import config  # noqa: E402
from dfu_multimodal_tpu.train.engine import Trainer  # noqa: E402

cfg = config.TrainConfig(batch_size=8, compute_dtype="float32",
                         mesh=config.MeshConfig(data=8))
tr = Trainer("thermal_only", cfg, {"thermal": config.thermal_modality()},
             attention_impl="xla")
state = tr.init_state(jax.random.PRNGKey(0), image_size=64)
rng = np.random.default_rng(0)
batch = {"thermal": rng.integers(0, 255, (8, 64, 64, 3), np.uint8),
         "label": rng.integers(0, 2, 8).astype(np.int32),
         "valid": np.ones(8, np.float32)}
batch = jax.device_put(batch, tr.batch_sharding)
for i in range(3):
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(i))
    print("step", i, "loss", float(m["loss"]), flush=True)
print("SCANNED_OK", flush=True)
