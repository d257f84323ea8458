from vivqa_tpu.train.losses import (binary_cross_entropy_loss,
                                    contrastive_loss, create_loss,
                                    cross_entropy_loss, focal_loss,
                                    info_nce_loss, perplexity,
                                    soft_target_loss, triplet_loss,
                                    MultiTaskLoss)
from vivqa_tpu.train.optimizers import (OptimizerConfig, SchedulerConfig,
                                        create_optimizer, create_schedule,
                                        decay_mask)
from vivqa_tpu.train.state import (ShardedStep, TrainState, make_eval_step,
                                   make_train_step, place_state,
                                   settled_call, settled_defenses_enabled,
                                   settled_host_read, settled_params_view)
from vivqa_tpu.train.strategies import STRATEGIES, trainable_mask

__all__ = [
    "cross_entropy_loss", "soft_target_loss", "binary_cross_entropy_loss",
    "focal_loss", "contrastive_loss", "triplet_loss", "info_nce_loss",
    "perplexity", "MultiTaskLoss", "create_loss",
    "OptimizerConfig", "SchedulerConfig", "create_optimizer",
    "create_schedule", "decay_mask",
    "TrainState", "ShardedStep", "make_train_step", "make_eval_step",
    "place_state", "settled_call", "settled_defenses_enabled",
    "settled_host_read", "settled_params_view",
    "STRATEGIES", "trainable_mask",
]
