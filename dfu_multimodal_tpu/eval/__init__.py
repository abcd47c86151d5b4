from dfu_multimodal_tpu.eval import gradcam, metrics, plots, tta  # noqa: F401
from dfu_multimodal_tpu.eval.metrics import (  # noqa: F401
    compute_all_metrics, confusion_counts, print_report)
