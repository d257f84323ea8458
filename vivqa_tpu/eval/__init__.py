from vivqa_tpu.eval.evaluator import (EvaluationResult, EvaluatorConfig,
                                      VQAEvaluator)
from vivqa_tpu.eval.predictor import (PredictionResult, VQAPredictor,
                                      load_predictor)
from vivqa_tpu.eval.result_manager import InferenceResultManager

__all__ = ["VQAEvaluator", "EvaluatorConfig", "EvaluationResult",
           "VQAPredictor", "PredictionResult", "load_predictor",
           "InferenceResultManager"]
