"""Standalone representation zoo — image & text embedding modules.

Counterpart of src/modeling/heads/ in the reference:
- RegionBasedVisionEmbedding (image_representation.py:116-251): bottom-up-
  attention-style grid pseudo-regions + normalized bbox spatial features.
- MultiResolutionFeatures (429-561): conv stages + lateral/top-down FPN.
- VisionTokenEmbedding (564-763): Perceiver/BLIP-2-style learnable query
  tokens cross-attending to a conv feature map.
- create_text_embedding (text_representation.py:98-663): one architecture
  parameterized by pooling/freeze/projection covers BERT/RoBERTa/
  DeBERTa/generic — in the reference these differ by HF checkpoint, not
  by code; the factory keeps the same names.

All are static-shape flax modules returning {"pooled", "tokens"}.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.models.config import TextEncoderConfig, VisualEncoderConfig
from vivqa_tpu.models.encoders.text import TextEncoder
from vivqa_tpu.models.layers import to_dtype


def _conv_block(x, width, name, dtype, strides=2):
    x = nn.Conv(width, (3, 3), strides=(strides, strides), dtype=dtype,
                use_bias=False, name=f"{name}_conv")(x)
    x = nn.GroupNorm(num_groups=min(32, width), dtype=dtype,
                     name=f"{name}_gn")(x)
    return nn.relu(x)


def _pool_to_grid(x: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, g, g, C) by average pooling, g = min(grid, H, W)."""
    B, H, W, C = x.shape
    g = min(grid, H, W)
    gh, gw = H // g, W // g
    x = x[:, : gh * g, : gw * g]
    x = x.reshape(B, g, gh, g, gw, C)
    return x.mean(axis=(2, 4))


def grid_boxes(grid: int) -> np.ndarray:
    """Normalized (x1, y1, x2, y2, area) per pseudo-region
    (reference bbox spatial feats, image_representation.py:201-222)."""
    boxes = []
    for i in range(grid):
        for j in range(grid):
            x1, y1 = j / grid, i / grid
            x2, y2 = (j + 1) / grid, (i + 1) / grid
            boxes.append([x1, y1, x2, y2, (x2 - x1) * (y2 - y1)])
    return np.asarray(boxes, np.float32)


class RegionBasedVisionEmbedding(nn.Module):
    """Grid pseudo-regions + bbox spatial features."""
    config: VisualEncoderConfig
    grid: int = 7

    @nn.compact
    def __call__(self, pixel_values, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        x = pixel_values.astype(dtype)
        w = cfg.resnet_width
        for i, width in enumerate((w, 2 * w, 4 * w)):
            x = _conv_block(x, width, f"stage{i}", dtype)
        regions = _pool_to_grid(x, self.grid)            # (B, g, g, C)
        B, g = regions.shape[0], regions.shape[1]
        feats = regions.reshape(B, g * g, -1)
        boxes = jnp.asarray(grid_boxes(g))[None].astype(dtype)
        spatial = nn.Dense(feats.shape[-1], dtype=dtype, name="spatial_proj")(
            jnp.broadcast_to(boxes, (B,) + boxes.shape[1:]))
        tokens = nn.LayerNorm(dtype=dtype, name="ln")(feats + spatial)
        if cfg.output_dim:
            tokens = nn.Dense(cfg.output_dim, dtype=dtype,
                              name="projection")(tokens)
        return {"pooled": tokens.mean(axis=1), "tokens": tokens}


class MultiResolutionFeatures(nn.Module):
    """Conv pyramid + lateral/top-down FPN; tokens = concat of flattened
    pyramid levels projected to a common dim."""
    config: VisualEncoderConfig
    fpn_dim: int = 256
    num_levels: int = 3

    @nn.compact
    def __call__(self, pixel_values, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        x = pixel_values.astype(dtype)
        w = cfg.resnet_width
        feats = []
        for i in range(self.num_levels):
            x = _conv_block(x, w * (2 ** i), f"stage{i}", dtype)
            feats.append(x)
        # top-down pathway with lateral 1x1s
        laterals = [nn.Conv(self.fpn_dim, (1, 1), dtype=dtype,
                            name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        fpn = [None] * self.num_levels
        fpn[-1] = laterals[-1]
        for i in range(self.num_levels - 2, -1, -1):
            up = jax_image_resize(fpn[i + 1], laterals[i].shape)
            fpn[i] = laterals[i] + up
        fpn = [nn.Conv(self.fpn_dim, (3, 3), dtype=dtype,
                       name=f"smooth{i}")(f) for i, f in enumerate(fpn)]
        # tokens: pool every level to a small grid then concat
        pooled_levels = []
        for f in fpn:
            p = _pool_to_grid(f, 4)
            pooled_levels.append(
                p.reshape(p.shape[0], p.shape[1] * p.shape[2], self.fpn_dim))
        tokens = jnp.concatenate(pooled_levels, axis=1)
        tokens = nn.LayerNorm(dtype=dtype, name="ln")(tokens)
        if cfg.output_dim:
            tokens = nn.Dense(cfg.output_dim, dtype=dtype,
                              name="projection")(tokens)
        return {"pooled": tokens.mean(axis=1), "tokens": tokens}


def jax_image_resize(x: jnp.ndarray, target_shape) -> jnp.ndarray:
    """Nearest-neighbor upsample to target spatial shape."""
    import jax
    B, H, W, C = target_shape
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]),
                            method="nearest")


class VisionTokenEmbedding(nn.Module):
    """Learnable query tokens cross-attend into the conv feature map
    (Perceiver/BLIP-2 style, reference :564-763)."""
    config: VisualEncoderConfig
    num_tokens: int = 32
    num_layers: int = 2

    @nn.compact
    def __call__(self, pixel_values, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        x = pixel_values.astype(dtype)
        w = cfg.resnet_width
        for i, width in enumerate((w, 2 * w, 4 * w)):
            x = _conv_block(x, width, f"stage{i}", dtype)
        B, H, W, C = x.shape
        feat = x.reshape(B, H * W, C)
        queries = self.param("query_tokens", nn.initializers.normal(0.02),
                             (1, self.num_tokens, C), jnp.float32)
        q = jnp.broadcast_to(queries, (B,) + queries.shape[1:]).astype(dtype)
        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=dtype, name=f"ln_q{i}")(q)
            y = nn.MultiHeadDotProductAttention(
                num_heads=4, dtype=dtype, name=f"cross_attn{i}")(
                y, feat, deterministic=deterministic)
            q = q + y
            y = nn.LayerNorm(dtype=dtype, name=f"ln_m{i}")(q)
            y = nn.Dense(4 * C, dtype=dtype, name=f"mlp{i}_wi")(y)
            y = nn.gelu(y)
            q = q + nn.Dense(C, dtype=dtype, name=f"mlp{i}_wo")(y)
        tokens = nn.LayerNorm(dtype=dtype, name="ln")(q)
        if cfg.output_dim:
            tokens = nn.Dense(cfg.output_dim, dtype=dtype,
                              name="projection")(tokens)
        return {"pooled": tokens.mean(axis=1), "tokens": tokens}


_IMAGE_REPRESENTATIONS = {
    "region_based": RegionBasedVisionEmbedding,
    "vit": None,                    # resolved to ViTEncoder below
    "multi_resolution": MultiResolutionFeatures,
    "vision_token": VisionTokenEmbedding,
}


def create_image_representation(kind: str, config: VisualEncoderConfig,
                                **kwargs) -> nn.Module:
    """Factory (reference image_representation.py:767-794)."""
    if kind == "vit":
        from vivqa_tpu.models.encoders.vit import ViTEncoder
        return ViTEncoder(config)
    if kind not in _IMAGE_REPRESENTATIONS or _IMAGE_REPRESENTATIONS[kind] is None:
        raise ValueError(f"unknown image representation '{kind}' "
                         f"(choices: {tuple(_IMAGE_REPRESENTATIONS)})")
    return _IMAGE_REPRESENTATIONS[kind](config, **kwargs)


# -- text representations ------------------------------------------------------

TEXT_EMBEDDING_KINDS = ("bert", "roberta", "deberta", "phobert", "generic")


def create_text_embedding(kind: str, config: TextEncoderConfig) -> nn.Module:
    """Factory (reference text_representation.py:625-663): unknown names
    fall back to the generic transformer embedding."""
    if kind not in TEXT_EMBEDDING_KINDS:
        kind = "generic"
    if kind == "deberta":
        # real disentangled attention (NOT an alias of TextEncoder —
        # reference DeBERTaV3TextEmbedding, text_representation.py:350-473)
        from vivqa_tpu.models.encoders.deberta import (DeBERTaConfig,
                                                       DeBERTaEncoder)
        return DeBERTaEncoder(DeBERTaConfig(
            vocab_size=config.vocab_size, hidden_dim=config.hidden_dim,
            num_layers=config.num_layers, num_heads=config.num_heads,
            mlp_ratio=config.mlp_ratio, max_length=config.max_length,
            pooling=config.pooling, dropout=config.dropout,
            output_dim=config.output_dim, dtype=config.dtype))
    # architectural deltas between the BERT family members live in the
    # config (type_vocab_size, pooling); the module is shared.
    if kind in ("roberta", "phobert"):
        config = config.replace(type_vocab_size=1)
    elif kind == "bert":
        config = config.replace(type_vocab_size=max(2, config.type_vocab_size))
    return TextEncoder(config)
