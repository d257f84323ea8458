"""Model pipeline — 7 self-validating steps.

Counterpart of src/core/model_pipeline.py:80-588 in the reference:
mesh/device setup -> nested config build -> create model -> init params ->
(mesh placement) -> param-count table -> dummy forward validation.
`load_checkpoint` infers num_answers from the stored answer-head bias
shape when absent (reference :536-565) and merges weights with shape
filtering.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.models.config import VQAModelConfig
from vivqa_tpu.models.vqa_model import VietnameseVQAModel
from vivqa_tpu.parallel import MeshConfig, create_mesh
from vivqa_tpu.pipelines.common import count_parameters
from vivqa_tpu.train.checkpoint import (CheckpointConfig, CheckpointManager,
                                        partial_load)
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass(frozen=True)
class ModelPipelineConfig(ConfigBase):
    model: VQAModelConfig = dataclasses.field(default_factory=VQAModelConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 42
    validate_forward: bool = True
    # HF name-or-path of pretrained towers to initialize from (converted
    # through models/convert.py; the encoder sub-configs are re-derived
    # from the HF architecture). Empty = random init. Counterpart of the
    # reference's AutoModel-backed encoders (src/core/
    # model_pipeline.py:303, vqa_model.py:83-98); compose with
    # model.visual.freeze / train.strategies for freezing.
    pretrained_visual: str = ""
    pretrained_text: str = ""


@dataclasses.dataclass
class ModelPipelineOutput:
    model: VietnameseVQAModel
    params: object
    mesh: object
    param_counts: dict


class ModelPipeline:
    def __init__(self, config: ModelPipelineConfig, logger=None):
        self.config = config
        self.log = logger or get_pipeline_logger()

    def run(self, num_answers: Optional[int] = None) -> ModelPipelineOutput:
        cfg = self.config
        log = self.log
        log.start_stage("model_pipeline")

        # 1. mesh/device setup
        mesh = create_mesh(cfg.mesh)
        log.success(f"step 1/7 mesh {dict(mesh.shape)} over "
                    f"{mesh.devices.size} devices "
                    f"({mesh.devices.flat[0].platform})")

        # 2. config assembly — pretrained towers re-derive their encoder
        # sub-config from the HF architecture so the initialized param
        # tree matches the converted weights exactly
        model_cfg = cfg.model
        if num_answers is not None:
            model_cfg = model_cfg.replace(num_answers=num_answers)
        pre_visual = pre_text = None
        if cfg.pretrained_visual:
            from vivqa_tpu.models.convert import load_pretrained_visual_encoder
            enc, pre_visual = load_pretrained_visual_encoder(
                cfg.pretrained_visual, model_cfg.visual)
            if (enc.config.backbone in ("vit", "clip", "dino")
                    and enc.config.image_size
                    != model_cfg.visual.image_size):
                raise ValueError(
                    f"pretrained visual encoder expects image_size="
                    f"{enc.config.image_size} but the pipeline is "
                    f"configured for {model_cfg.visual.image_size} — "
                    f"set data.image_size to match")
            model_cfg = model_cfg.replace(visual=enc.config)
            log.success(f"pretrained visual: {cfg.pretrained_visual} "
                        f"({enc.config.backbone}, "
                        f"{enc.config.num_layers}l x "
                        f"{enc.config.hidden_dim}d)")
        if cfg.pretrained_text:
            from vivqa_tpu.models.convert import load_pretrained_text_encoder
            enc, pre_text = load_pretrained_text_encoder(
                cfg.pretrained_text, model_cfg.text)
            model_cfg = model_cfg.replace(text=enc.config)
            log.success(f"pretrained text: {cfg.pretrained_text} "
                        f"({enc.config.num_layers}l x "
                        f"{enc.config.hidden_dim}d, "
                        f"vocab {enc.config.vocab_size})")
        log.success(f"step 2/7 config: visual={model_cfg.visual.backbone} "
                    f"text={model_cfg.text.backbone} "
                    f"fusion={model_cfg.fusion.fusion_type} "
                    f"moe={model_cfg.moe.use_moe} "
                    f"answers={model_cfg.num_answers}")

        # 3. create model
        model = VietnameseVQAModel(model_cfg)
        log.success("step 3/7 model created")

        # 4. init params
        rng = jax.random.PRNGKey(cfg.seed)
        px = jnp.zeros((2, model_cfg.visual.image_size,
                        model_cfg.visual.image_size, 3), jnp.float32)
        ids = jnp.ones((2, model_cfg.text.max_length), jnp.int32)
        # RAG params only exist if the knowledge branch traces at init
        # (flax conditional-module gotcha): feed dummy contexts
        know = {}
        if model_cfg.knowledge.use_knowledge:
            kc = model_cfg.knowledge
            know = {"knowledge_embeddings": jnp.zeros(
                        (2, kc.num_retrieved, kc.knowledge_dim), jnp.float32),
                    "knowledge_mask": jnp.ones((2, kc.num_retrieved),
                                               jnp.int32)}
        params = model.init({"params": rng, "router": rng}, px, ids,
                            **know)["params"]
        log.success("step 4/7 params initialized")

        # 4b. graft pretrained tower weights over the random init
        if pre_visual is not None or pre_text is not None:
            from vivqa_tpu.models.convert import graft_pretrained
            if pre_visual is not None:
                params = graft_pretrained(params, "visual_encoder",
                                          pre_visual, log)
            if pre_text is not None:
                params = graft_pretrained(params, "text_encoder",
                                          pre_text, log)

        # 5. param counts
        counts = count_parameters(params)
        log.log_model_architecture(type(model).__name__, counts)

        # 6/7. dummy forward validation (reference :428-480)
        if cfg.validate_forward:
            out = model.apply({"params": params}, px, ids, **know)
            expected = (2, model_cfg.num_answers)
            assert out["logits"].shape == expected, \
                f"logits {out['logits'].shape} != {expected}"
            assert np.isfinite(np.asarray(out["logits"],
                                          np.float32)).all()
            log.success(f"step 7/7 dummy forward validated "
                        f"logits={out['logits'].shape}")

        log.end_stage("model_pipeline")
        return ModelPipelineOutput(model, params, mesh, counts)

    def load_checkpoint(self, ckpt_dir: str,
                        num_answers: Optional[int] = None):
        """Rebuild model from a checkpoint; infer num_answers from the
        answer-head classifier bias when not given."""
        mgr = CheckpointManager(CheckpointConfig(directory=ckpt_dir))
        restored, meta = mgr.restore_best()
        mgr.close()
        params = restored["params"] if "params" in restored else restored
        if num_answers is None:
            num_answers = meta.get("num_answers")
        if num_answers is None:
            try:
                bias = params["answer_head"]["classifier"]["bias"]
                num_answers = int(np.shape(bias)[0])
                self.log.info("inferred num_answers=%d from checkpoint",
                              num_answers)
            except KeyError:
                raise ValueError("cannot infer num_answers from checkpoint")
        out = self.run(num_answers=num_answers)
        merged, skipped = partial_load(params, out.params, self.log)
        return ModelPipelineOutput(out.model, merged, out.mesh,
                                   out.param_counts), meta
