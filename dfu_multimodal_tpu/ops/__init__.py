from dfu_multimodal_tpu.ops.attention import (  # noqa: F401
    flash_attention, qkv_attention)
from dfu_multimodal_tpu.ops.fused_mlp import (  # noqa: F401
    fused_mlp, fusion_mlp_params)
