"""Vision Transformer visual encoder (flax).

One implementation covers the ViT-family backbones the reference exposes
via HF hub names — CLIP-vision, plain ViT, DINOv2-style
(reference VisualEncoder wrapper, src/modeling/meta_arch/vqa_model.py:51-131;
from-scratch ViT in src/modeling/heads/image_representation.py:254-426).

TPU notes: patchify is a single strided conv (maps to MXU), the trunk is
the shared pre-LN EncoderLayer; everything is static-shape. Pooled output
is the CLS token after the final LayerNorm; spatial tokens are returned
for token-level fusion (MCAN/Q-Former/cross-attention need them).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.layers import EncoderLayer, to_dtype


class ViTEncoder(nn.Module):
    config: VisualEncoderConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *, deterministic: bool = True):
        """pixel_values: (B, H, W, 3) in NHWC (TPU-native layout)."""
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        B = pixel_values.shape[0]
        if cfg.image_size < cfg.patch_size or cfg.image_size % cfg.patch_size:
            raise ValueError(
                f"image_size={cfg.image_size} must be a positive multiple of "
                f"patch_size={cfg.patch_size}")
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        x = nn.Conv(cfg.hidden_dim,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=dtype, name="patch_embed")(pixel_values.astype(dtype))
        x = x.reshape(B, n_patches, cfg.hidden_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_dim)).astype(dtype), x],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_patches + 1, cfg.hidden_dim), jnp.float32)
        x = x + pos.astype(dtype)
        if cfg.vit_style == "clip":
            # CLIP vision tower applies a LayerNorm right after embeddings
            x = nn.LayerNorm(dtype=dtype, name="ln_pre")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.num_layers):
            x = EncoderLayer(num_heads=cfg.num_heads,
                             d_ff=int(cfg.hidden_dim * cfg.mlp_ratio),
                             dropout=cfg.dropout, dtype=dtype,
                             activation=cfg.activation,
                             layer_scale_init=cfg.layer_scale_init,
                             name=f"layers_{i}")(x, deterministic=deterministic)
        if cfg.vit_style == "clip":
            # CLIP's post_layernorm normalizes the pooled path only;
            # spatial tokens leave the tower unnormalized (HF parity)
            pooled = nn.LayerNorm(dtype=dtype, name="ln_final")(x[:, 0])
            tokens = x[:, 1:]
        else:
            x = nn.LayerNorm(dtype=dtype, name="ln_final")(x)
            pooled, tokens = x[:, 0], x[:, 1:]
        if cfg.output_dim:
            proj = nn.Dense(cfg.output_dim, use_bias=False, dtype=dtype,
                            name="projection")
            pooled, tokens = proj(pooled), proj(tokens)
        return {"pooled": pooled, "tokens": tokens}
