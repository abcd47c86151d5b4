from dfu_multimodal_tpu.models.efficientnet import (  # noqa: F401
    EfficientNetB0, EfficientNetClassifier)
from dfu_multimodal_tpu.models.fusion import (  # noqa: F401
    FusionMLP, GatedFusion, LegacyClassifier, LegacyConcatFusion,
    MultimodalFusionClassifier)
from dfu_multimodal_tpu.models.resnet import (  # noqa: F401
    ResNet, ResNet50, ResNetClassifier)
from dfu_multimodal_tpu.models.vit import (  # noqa: F401
    ViT, ViTBase16, ViTClassifier)
from dfu_multimodal_tpu.models import zoo  # noqa: F401
