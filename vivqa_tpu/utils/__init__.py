from vivqa_tpu.utils.logger import PipelineLogger, get_pipeline_logger
from vivqa_tpu.utils.memory_guard import (MemoryGuard,
                                          MemoryOverflowException,
                                          get_memory_guard)
from vivqa_tpu.utils.seeding import set_seed, new_rng
from vivqa_tpu.utils.visualization import show_batch, show_sample
from vivqa_tpu.utils.yaml_io import load_yaml, save_yaml

__all__ = [
    "PipelineLogger",
    "get_pipeline_logger",
    "set_seed",
    "new_rng",
    "load_yaml",
    "save_yaml",
    "MemoryGuard",
    "MemoryOverflowException",
    "get_memory_guard",
    "show_sample",
    "show_batch",
]
