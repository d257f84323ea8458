"""ResNet visual encoder (flax), bottleneck-v1.5 style.

Covers the reference's torchvision ResNet50/101/152 backbones
(reference: src/modeling/heads/image_representation.py:16-80). NHWC layout
(TPU-native). Two normalization modes:

- ``resnet_norm="group"`` (default for from-scratch training): GroupNorm,
  batch-independent, no mutable state inside the jitted train step.
- ``resnet_norm="frozen_bn"``: BatchNorm folded to a per-channel affine
  (scale = gamma/sqrt(var+eps), bias = beta - mean*scale) — the standard
  way to carry pretrained torch BN weights into a stateless graph (same
  trick DETR's FrozenBatchNorm2d uses). Required for HF/torchvision
  weight import via ``models/convert.py::convert_resnet``.

Convolution padding is explicit torch-style (k//2 per side) rather than
XLA "SAME" so strided convs/maxpool align windows exactly like torch —
otherwise pretrained-weight parity breaks at every stride-2 layer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.layers import to_dtype


class FrozenAffine(nn.Module):
    """Per-channel scale+bias; holds folded BatchNorm statistics."""
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _norm(kind: str, dtype, name: str):
    if kind == "frozen_bn":
        return FrozenAffine(dtype=dtype, name=name)
    return nn.GroupNorm(num_groups=32, dtype=dtype, name=name)


def _conv(features, k, strides, dtype, name):
    pad = k // 2
    return nn.Conv(features, (k, k), strides=(strides, strides),
                   padding=((pad, pad), (pad, pad)), dtype=dtype,
                   use_bias=False, name=name)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    norm: str = "group"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.features, 1, 1, self.dtype, "conv1")(x)
        y = nn.relu(_norm(self.norm, self.dtype, "norm1")(y))
        y = _conv(self.features, 3, self.strides, self.dtype, "conv2")(y)
        y = nn.relu(_norm(self.norm, self.dtype, "norm2")(y))
        y = _conv(self.features * 4, 1, 1, self.dtype, "conv3")(y)
        y = _norm(self.norm, self.dtype, "norm3")(y)
        if residual.shape != y.shape:
            residual = _conv(self.features * 4, 1, self.strides, self.dtype,
                             "downsample")(x)
            residual = _norm(self.norm, self.dtype, "downsample_norm")(residual)
        return nn.relu(residual + y)


class ResNetEncoder(nn.Module):
    config: VisualEncoderConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        norm = cfg.resnet_norm
        x = pixel_values.astype(dtype)
        x = _conv(cfg.resnet_width, 7, 2, dtype, "stem")(x)
        x = nn.relu(_norm(norm, dtype, "stem_norm")(x))
        # torch MaxPool2d(3, stride=2, padding=1): explicit 1-px pad with
        # -inf so window positions match exactly (XLA "SAME" pads right)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        features = cfg.resnet_width
        for stage, blocks in enumerate(cfg.resnet_stages):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(features, strides=strides, norm=norm,
                               dtype=dtype,
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
