"""dfu_multimodal_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
diabetic-foot-ulcer multimodal classification.

Re-designed from scratch with the capabilities of the reference project
``ShreenathKR2000/DFU-Multimodal`` (a single-GPU PyTorch research repo; see
SURVEY.md). Nothing in here is a port: the compute path is functional JAX —
NHWC convolutions on the MXU, a Pallas flash-attention ViT encoder, on-device
image augmentation, device-resident metric reductions, and data-parallel
scaling via ``jax.sharding.Mesh`` + ``jit`` sharding annotations.

Package layout
--------------
- ``data``      host IO + device-side transform pipeline + pairing logic
- ``models``    Flax ResNet50 / ViT-B/16 / EfficientNet-B0 / fusion heads
- ``ops``       Pallas TPU kernels (flash attention, fused MLP, image warps)
- ``parallel``  mesh construction and sharding rules (dp, with a model axis)
- ``train``     the jitted training engine (steps, metrics, checkpoints)
- ``eval``      medical metrics, Grad-CAM (vjp), TTA (vmap), ablation
- ``tools``     dataset organization/dedup/split/standardize/convert tooling
- ``cli``       entry points mirroring the reference script contracts
- ``utils``     checkpointing, logging/profiling counters, PRNG helpers
- ``native``    C++ fast-path (threaded SHA256 hashing) used by data tooling
"""

__version__ = "0.1.0"

from dfu_multimodal_tpu import config as config  # noqa: F401
