from vivqa_tpu.ops.batch_mix import (cutmix, mix_batch, mixed_cross_entropy,
                                     mixed_soft_targets, mixup)
from vivqa_tpu.ops.flash_attention import flash_attention

__all__ = ["flash_attention", "mixup", "cutmix", "mix_batch",
           "mixed_cross_entropy", "mixed_soft_targets"]
