from vivqa_tpu.data.actions import (build_image_index, data_statistics,
                                    load_raw_data, parse_answers, split_data,
                                    validate_samples)
from vivqa_tpu.data.augmentation import (CLIP_MEAN, CLIP_STD,
                                         DropoutScheduler, ImageAugmentation,
                                         normalize_pixels_on_device,
                                         TextAugmentation,
                                         create_text_augmentation)
from vivqa_tpu.data.dataset import (IGNORE_INDEX, GenerativeVQADataset,
                                    VQADataset, generative_collate,
                                    vqa_collate)
from vivqa_tpu.data.loader import BatchLoader, device_prefetch
from vivqa_tpu.data.schema import OneSample
from vivqa_tpu.data.synthetic import (ensure_synthetic_vivqa,
                                      generate_synthetic_vivqa,
                                      synthetic_samples)
from vivqa_tpu.data.tokenizer import (PretrainedTokenizer,
                                      WhitespaceTokenizer, create_tokenizer)
from vivqa_tpu.data.vocab import (build_answer_vocab, encode_answer_counts,
                                  majority_answer)

__all__ = [
    "OneSample", "load_raw_data", "split_data", "validate_samples",
    "data_statistics", "parse_answers", "build_image_index",
    "ImageAugmentation", "CLIP_MEAN", "CLIP_STD",
    "normalize_pixels_on_device",
    "TextAugmentation", "create_text_augmentation", "DropoutScheduler",
    "VQADataset", "GenerativeVQADataset", "vqa_collate", "generative_collate",
    "IGNORE_INDEX", "BatchLoader", "device_prefetch",
    "WhitespaceTokenizer", "PretrainedTokenizer", "create_tokenizer",
    "build_answer_vocab", "majority_answer", "encode_answer_counts",
    "ensure_synthetic_vivqa", "generate_synthetic_vivqa",
    "synthetic_samples",
]
