from vivqa_tpu.models.config import (
    VisualEncoderConfig,
    TextEncoderConfig,
    FusionConfig,
    AnswerHeadConfig,
    VQAModelConfig,
    GenerativeVQAConfig,
    get_default_vietnamese_vqa_config,
    get_default_generative_vqa_config,
)
from vivqa_tpu.models.vqa_model import VietnameseVQAModel, create_vqa_model
from vivqa_tpu.models.generative import GenerativeVQAModel, create_generative_vqa_model

__all__ = [
    "VisualEncoderConfig",
    "TextEncoderConfig",
    "FusionConfig",
    "AnswerHeadConfig",
    "VQAModelConfig",
    "GenerativeVQAConfig",
    "VietnameseVQAModel",
    "GenerativeVQAModel",
    "create_vqa_model",
    "create_generative_vqa_model",
    "get_default_vietnamese_vqa_config",
    "get_default_generative_vqa_config",
]
