from dfu_multimodal_tpu.train.engine import (  # noqa: F401
    EpochMetrics, Trainer, TrainState, class_weights_from_labels,
    weighted_ce)
