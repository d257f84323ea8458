from vivqa_tpu.ablation.analyzer import (AblationAnalyzer, ExpertContribution,
                                         MOERecommendation, PairwiseSynergy)
from vivqa_tpu.ablation.config import (AblationConfig, AblationSearchSpace,
                                       ExperimentConfig, ExpertAblationConfig,
                                       RouterAblationConfig)
from vivqa_tpu.ablation.evaluator import (AblationEvaluator, ExpertImportance,
                                          get_metrics_for_model_type)
from vivqa_tpu.ablation.modifier import (apply_expert_ablation,
                                         apply_router_ablation,
                                         build_expert_mask,
                                         collect_moe_metrics,
                                         compute_expert_index_ranges)
from vivqa_tpu.ablation.reporter import AblationReporter
from vivqa_tpu.ablation.runner import AblationRunner, GracefulInterrupt
from vivqa_tpu.ablation.trainer import AblationTrainer, ExperimentResult

__all__ = [
    "AblationConfig", "AblationSearchSpace", "ExperimentConfig",
    "ExpertAblationConfig", "RouterAblationConfig",
    "build_expert_mask", "apply_expert_ablation", "apply_router_ablation",
    "collect_moe_metrics", "compute_expert_index_ranges",
    "AblationTrainer", "ExperimentResult",
    "AblationRunner", "GracefulInterrupt",
    "AblationEvaluator", "ExpertImportance", "get_metrics_for_model_type",
    "AblationAnalyzer", "ExpertContribution", "PairwiseSynergy",
    "MOERecommendation", "AblationReporter",
]
