"""MuTAN — Multimodal Tucker Fusion.

Declared-but-unimplemented in the reference (enum string,
vqa_config.py:36); implemented here after Ben-younes et al. 2017:
a rank-R Tucker decomposition of the bilinear interaction between the
pooled visual and question vectors. The rank dimension is folded into one
batched matmul per modality, so the whole op is three MXU matmuls and an
elementwise product.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig
from vivqa_tpu.models.layers import to_dtype


class MuTANFusion(nn.Module):
    config: FusionConfig

    @nn.compact
    def __call__(self, visual, text, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype("bfloat16")
        R, D = cfg.mutan_rank, cfg.hidden_dim
        v0 = nn.Dense(D, dtype=dtype, name="v_embed")(visual["pooled"])
        q0 = nn.Dense(D, dtype=dtype, name="q_embed")(text["pooled"])
        v0 = nn.Dropout(cfg.dropout)(jnp.tanh(v0), deterministic=deterministic)
        q0 = nn.Dropout(cfg.dropout)(jnp.tanh(q0), deterministic=deterministic)

        # Rank-R factors as single wide matmuls: (B, D) -> (B, R*D)
        vr = nn.Dense(R * D, use_bias=False, dtype=dtype, name="v_factors")(v0)
        qr = nn.Dense(R * D, use_bias=False, dtype=dtype, name="q_factors")(q0)
        B = v0.shape[0]
        z = (jnp.tanh(vr.reshape(B, R, D)) * jnp.tanh(qr.reshape(B, R, D))).sum(axis=1)
        pooled = nn.LayerNorm(dtype=dtype, name="ln")(
            nn.Dense(D, dtype=dtype, name="out_proj")(z))
        tokens = jnp.stack([v0, q0], axis=1)
        return {"pooled": pooled, "tokens": tokens,
                "mask": jnp.ones(tokens.shape[:2], jnp.int32)}
