from dfu_multimodal_tpu.utils import (artifacts, checkpoint,  # noqa: F401
                                      compile_cache, logging)
