"""Flax model zoo: EfficientNet backbones, MWT, SFE (EfficientViT), DAMA, detector."""

from ewvit_tpu.models.efficientnet import EfficientNetB0, EfficientNetV2S  # noqa: F401
from ewvit_tpu.models.layers import (  # noqa: F401
    Attention,
    BidirectionalCrossTransformer,
    CrossAttention,
    FeedForward,
    Transformer,
)
from ewvit_tpu.models.mwt import MWT  # noqa: F401
from ewvit_tpu.models.sfe import EfficientViT  # noqa: F401
from ewvit_tpu.models.dama import DAMA  # noqa: F401
from ewvit_tpu.models.detector import DeepfakeDetector  # noqa: F401
