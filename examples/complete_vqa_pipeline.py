"""Complete pipeline demo (reference: examples/complete_vqa_pipeline.py).

Generates a synthetic ViVQA dataset, trains the classification model for
two epochs on the available devices, evaluates, and runs inference —
entirely self-contained:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/complete_vqa_pipeline.py
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import tempfile

from vivqa_tpu.data import generate_synthetic_vivqa
from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                     TextEncoderConfig, VisualEncoderConfig,
                                     VQAModelConfig)
from vivqa_tpu.parallel import MeshConfig
from vivqa_tpu.pipelines import (DataPipelineConfig, ModelPipelineConfig,
                                 TrainingPipelineConfig, VQAPipeline,
                                 VQAPipelineConfig)
from vivqa_tpu.train import OptimizerConfig


def main():
    tmp = tempfile.mkdtemp()
    csv, imgs = generate_synthetic_vivqa(tmp, n=64, image_size=32)
    cfg = VQAPipelineConfig(
        mode="train",
        data=DataPipelineConfig(csv_path=str(csv), image_dir=str(imgs),
                                image_size=32, max_question_length=8,
                                batch_size=8, augmentation_strength="light"),
        model=ModelPipelineConfig(
            model=VQAModelConfig(
                visual=VisualEncoderConfig(image_size=32, patch_size=8,
                                           hidden_dim=32, num_layers=1,
                                           num_heads=2),
                text=TextEncoderConfig(hidden_dim=32, num_layers=1,
                                       num_heads=2, max_length=8),
                fusion=FusionConfig(fusion_type="mcan", hidden_dim=32,
                                    num_heads=2, num_layers=1),
                moe=MoEModelConfig(use_moe=True, num_experts=2, top_k=1,
                                   expert_hidden_dim=32)),
            mesh=MeshConfig()),
        training=TrainingPipelineConfig(
            num_epochs=2, optimizer=OptimizerConfig(learning_rate=5e-3),
            checkpoint_dir=f"{tmp}/ck", log_every=5),
        output_dir=f"{tmp}/out")
    summary = VQAPipeline(cfg).run()
    print("\nfinal metrics:", {k: round(v, 4) for k, v in
                               summary["final_metrics"].items()
                               if isinstance(v, float)})

    eval_summary = VQAPipeline(cfg.replace(
        mode="evaluate", resume=f"{tmp}/ck")).run()
    print("\ntest metrics:", {k: round(v, 4) for k, v in
                              eval_summary["metrics"].items()})


if __name__ == "__main__":
    main()
