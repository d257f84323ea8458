"""ResNet visual encoder (flax), bottleneck-v1.5 style.

Covers the reference's torchvision ResNet50/101/152 backbones
(reference: src/modeling/heads/image_representation.py:16-80). NHWC layout
(TPU-native); BatchNorm is replaced by GroupNorm so the forward pass is
batch-independent and needs no mutable state inside the jitted train step
(cross-replica batch statistics would otherwise force collectives in the
middle of the backbone).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.layers import to_dtype


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    dtype=self.dtype, use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), dtype=self.dtype, use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               dtype=self.dtype, use_bias=False,
                               name="downsample")(x)
            residual = nn.GroupNorm(num_groups=32, dtype=self.dtype)(residual)
        return nn.relu(residual + y)


class ResNetEncoder(nn.Module):
    config: VisualEncoderConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        x = pixel_values.astype(dtype)
        x = nn.Conv(cfg.resnet_width, (7, 7), strides=(2, 2),
                    dtype=dtype, use_bias=False, name="stem")(x)
        x = nn.GroupNorm(num_groups=32, dtype=dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        features = cfg.resnet_width
        for stage, blocks in enumerate(cfg.resnet_stages):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(features, strides=strides,
                               name=f"stage{stage}_block{b}")(x)
            features *= 2

        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        pooled = tokens.mean(axis=1)
        if cfg.output_dim:
            proj = nn.Dense(cfg.output_dim, use_bias=False, dtype=dtype,
                            name="projection")
            pooled, tokens = proj(pooled), proj(tokens)
        return {"pooled": pooled, "tokens": tokens}
