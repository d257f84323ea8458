from vivqa_tpu.pipelines.common import EarlyStopping, StepTimer, count_parameters
from vivqa_tpu.pipelines.data_pipeline import (DataPipeline,
                                               DataPipelineConfig,
                                               DataPipelineOutput)
from vivqa_tpu.pipelines.generative_training_pipeline import (
    GenerativeTrainingConfig, GenerativeTrainingPipeline)
from vivqa_tpu.pipelines.generative_vqa_pipeline import (
    GenerativeVQAPipeline, GenerativeVQAPipelineConfig)
from vivqa_tpu.pipelines.model_pipeline import (ModelPipeline,
                                                ModelPipelineConfig,
                                                ModelPipelineOutput)
from vivqa_tpu.pipelines.training_pipeline import (TrainingPipeline,
                                                   TrainingPipelineConfig,
                                                   TrainingPipelineOutput)
from vivqa_tpu.pipelines.vivqa_evaluation import (VivqaEvaluationConfig,
                                                  VivqaEvaluationPipeline)
from vivqa_tpu.pipelines.vqa_pipeline import VQAPipeline, VQAPipelineConfig

__all__ = [
    "DataPipeline", "DataPipelineConfig", "DataPipelineOutput",
    "ModelPipeline", "ModelPipelineConfig", "ModelPipelineOutput",
    "TrainingPipeline", "TrainingPipelineConfig", "TrainingPipelineOutput",
    "GenerativeTrainingPipeline", "GenerativeTrainingConfig",
    "VQAPipeline", "VQAPipelineConfig",
    "GenerativeVQAPipeline", "GenerativeVQAPipelineConfig",
    "VivqaEvaluationPipeline", "VivqaEvaluationConfig",
    "EarlyStopping", "StepTimer", "count_parameters",
]
