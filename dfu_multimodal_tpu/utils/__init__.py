from dfu_multimodal_tpu.utils import artifacts, checkpoint, logging  # noqa: F401
