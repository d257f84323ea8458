from vivqa_tpu.models.moe.config import (ExpertConfig, MoEConfig,
                                         RouterConfig, VQAMoEConfig)
from vivqa_tpu.models.moe.layer import (HierarchicalMoE, MOELayer,
                                        SparseMOELayer, VQAMoELayer,
                                        create_moe_layer)
from vivqa_tpu.models.moe.routers import (ExpertChoiceRouter, NoisyTopKRouter,
                                          SoftRouter, TopKRouter,
                                          create_router, load_balance_loss,
                                          router_z_loss)

__all__ = [
    "ExpertConfig", "MoEConfig", "RouterConfig", "VQAMoEConfig",
    "MOELayer", "SparseMOELayer", "VQAMoELayer", "HierarchicalMoE",
    "create_moe_layer", "create_router", "TopKRouter", "NoisyTopKRouter",
    "SoftRouter", "ExpertChoiceRouter", "load_balance_loss", "router_z_loss",
]
