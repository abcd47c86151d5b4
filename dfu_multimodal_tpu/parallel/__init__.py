from dfu_multimodal_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, pad_batch_to_mesh,
    process_shard, replicated)
from dfu_multimodal_tpu.parallel.pipeline import (  # noqa: F401
    STAGE_AXIS, gpipe, make_pp_mesh, vit_pipeline_fn)
