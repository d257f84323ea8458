"""Fusion factory (reference: create_fusion_model,
src/modeling/fusion/fusion_approaches.py:681-734, plus the meta-arch's
MultimodalFusion types vqa_model.py:314-433 — here all eight fusion types
are real implementations, including MCAN and MuTAN which the reference
only declares)."""

from __future__ import annotations

import flax.linen as nn

from vivqa_tpu.models.config import FusionConfig, FUSION_TYPES
from vivqa_tpu.models.fusion.basic import (AddFusion, BilinearFusion,
                                           ConcatFusion, CrossAttentionFusion)
from vivqa_tpu.models.fusion.mcan import MCANFusion
from vivqa_tpu.models.fusion.mutan import MuTANFusion
from vivqa_tpu.models.fusion.qformer import QFormerFusion
from vivqa_tpu.models.fusion.single_stream import SingleStreamFusion

_FUSIONS = {
    "concat": ConcatFusion,
    "add": AddFusion,
    "bilinear": BilinearFusion,
    "cross_attention": CrossAttentionFusion,
    "mcan": MCANFusion,
    "mutan": MuTANFusion,
    "qformer": QFormerFusion,
    "single_stream": SingleStreamFusion,
}
# aliases accepted by the reference factory
_ALIASES = {"cross-attention": "cross_attention", "q_former": "qformer",
            "vilt": "single_stream", "joint": "single_stream"}


def create_fusion(config: FusionConfig, name: str = "fusion") -> nn.Module:
    kind = _ALIASES.get(config.fusion_type, config.fusion_type)
    if kind not in _FUSIONS:
        raise ValueError(f"unknown fusion '{config.fusion_type}' "
                         f"(choices: {FUSION_TYPES})")
    return _FUSIONS[kind](config, name=name)


__all__ = ["create_fusion", "ConcatFusion", "AddFusion", "BilinearFusion",
           "CrossAttentionFusion", "MCANFusion", "MuTANFusion",
           "QFormerFusion", "SingleStreamFusion"]
