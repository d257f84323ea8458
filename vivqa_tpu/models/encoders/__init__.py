"""Encoder factories (reference: create_* factories in each submodule of
src/modeling/heads/ and the wrappers in meta_arch/vqa_model.py:51-234)."""

from __future__ import annotations

import flax.linen as nn

from vivqa_tpu.models.config import (TextEncoderConfig, VisualEncoderConfig,
                                     TEXT_BACKBONES, VISUAL_BACKBONES)
from vivqa_tpu.models.encoders.resnet import ResNetEncoder
from vivqa_tpu.models.encoders.swin import SwinEncoder
from vivqa_tpu.models.encoders.text import TextEncoder
from vivqa_tpu.models.encoders.vit import ViTEncoder


def create_visual_encoder(config: VisualEncoderConfig, name: str = "visual_encoder") -> nn.Module:
    if config.backbone not in VISUAL_BACKBONES:
        raise ValueError(
            f"unknown visual backbone '{config.backbone}' (choices: {VISUAL_BACKBONES})")
    if config.backbone in ("vit", "clip", "dino"):
        return ViTEncoder(config, name=name)
    if config.backbone == "resnet":
        return ResNetEncoder(config, name=name)
    return SwinEncoder(config, name=name)


def create_text_encoder(config: TextEncoderConfig, name: str = "text_encoder") -> nn.Module:
    if config.backbone not in TEXT_BACKBONES:
        raise ValueError(
            f"unknown text backbone '{config.backbone}' (choices: {TEXT_BACKBONES})")
    return TextEncoder(config, name=name)


__all__ = ["ViTEncoder", "ResNetEncoder", "SwinEncoder", "TextEncoder",
           "create_visual_encoder", "create_text_encoder"]
