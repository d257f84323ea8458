"""DeBERTa(-v2/v3) text encoder with REAL disentangled attention (flax).

The reference exposes DeBERTaV3 only as an HF wrapper
(src/modeling/heads/text_representation.py:350-473); round 1 of this
framework silently aliased "deberta" to the vanilla BERT-style encoder.
This module implements the actual architecture (He et al. 2021):

- no absolute position embeddings — positions enter ONLY through
  relative-position embeddings inside attention;
- disentangled attention = content-to-content + content-to-position +
  position-to-content terms, each scaled by 1/sqrt(d * scale_factor)
  with scale_factor = 1 + |pos_att_type|;
- log-bucketed relative positions (position_buckets) shared across
  layers, with the rel-embedding table LayerNormed once per forward.

TPU notes: the relative-position index matrix is a host-precomputed
numpy constant (static shapes), the c2p/p2c gathers are
`jnp.take_along_axis` over the last axis (XLA lowers these to cheap
dynamic-slices, no scatter), and everything is einsum/batched-matmul.
Weight import parity with HF `DebertaV2Model` is tested element-wise in
tests/test_convert.py.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.models.layers import (make_attention_mask, pool_sequence,
                                     to_activation, to_dtype)
from vivqa_tpu.ops.embedding import MatmulGradEmbed


@dataclasses.dataclass(frozen=True)
class DeBERTaConfig(ConfigBase):
    vocab_size: int = 128100        # deberta-v3 sentencepiece vocab
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    max_length: int = 64
    position_buckets: int = 256
    max_relative_positions: int = 512
    pos_att_type: tuple = ("p2c", "c2p")
    norm_rel_ebd: bool = True       # LayerNorm the rel-embedding table
    pooling: str = "cls"
    dropout: float = 0.1
    activation: str = "gelu"
    ln_eps: float = 1e-7            # DebertaV2 default layer_norm_eps
    output_dim: int = 0
    dtype: str = "bfloat16"


def make_log_bucket_position(relative_pos: np.ndarray, bucket_size: int,
                             max_position: int) -> np.ndarray:
    """HF DebertaV2 log-bucketing (modeling_deberta_v2.py): positions
    within +-bucket_size/2 stay linear; farther ones are log-compressed."""
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where((relative_pos < mid) & (relative_pos > -mid),
                       mid - 1, np.abs(relative_pos))
    log_pos = (np.ceil(np.log(abs_pos / mid)
                       / np.log((max_position - 1) / mid) * (mid - 1)) + mid)
    return np.where(abs_pos <= mid, relative_pos,
                    (log_pos * sign)).astype(np.int64)


def build_relative_position(query_size: int, key_size: int,
                            bucket_size: int = -1,
                            max_position: int = -1) -> np.ndarray:
    """(Lq, Lk) int relative positions q_i - k_j, optionally bucketed."""
    rel = np.arange(query_size)[:, None] - np.arange(key_size)[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel.astype(np.int64)


class DisentangledSelfAttention(nn.Module):
    """c2c + c2p + p2c attention over shared rel embeddings."""
    config: DeBERTaConfig

    @nn.compact
    def __call__(self, x, rel_embeddings, attn_mask=None, *,
                 deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        B, L, D = x.shape
        H = cfg.num_heads
        dh = D // H
        scale_factor = 1 + len(cfg.pos_att_type)
        scale = 1.0 / np.sqrt(dh * scale_factor)

        q_proj = nn.Dense(D, dtype=dtype, name="query_proj")
        k_proj = nn.Dense(D, dtype=dtype, name="key_proj")
        v_proj = nn.Dense(D, dtype=dtype, name="value_proj")

        def heads(t):                       # (B, L, D) -> (B, H, L, dh)
            return t.reshape(t.shape[0], t.shape[1], H, dh).transpose(
                0, 2, 1, 3)

        q = heads(q_proj(x))
        k = heads(k_proj(x))
        v = heads(v_proj(x))

        score = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale

        att_span = (cfg.position_buckets if cfg.position_buckets > 0
                    else cfg.max_relative_positions)
        rel_idx = build_relative_position(
            L, L, cfg.position_buckets, cfg.max_relative_positions)

        # rel table projected through the SAME q/k projections
        pos_key = heads(k_proj(rel_embeddings[None]))[0]      # (H, 2S, dh)
        pos_query = heads(q_proj(rel_embeddings[None]))[0]

        if "c2p" in cfg.pos_att_type:
            c2p = jnp.einsum("bhqd,hkd->bhqk", q, pos_key,
                             preferred_element_type=jnp.float32)
            c2p_pos = np.clip(rel_idx + att_span, 0, att_span * 2 - 1)
            c2p = jnp.take_along_axis(
                c2p, jnp.asarray(c2p_pos)[None, None], axis=-1)
            score = score + c2p * scale
        if "p2c" in cfg.pos_att_type:
            p2c = jnp.einsum("bhkd,hqd->bhkq", k, pos_query,
                             preferred_element_type=jnp.float32)
            p2c_pos = np.clip(-rel_idx + att_span, 0, att_span * 2 - 1)
            p2c = jnp.take_along_axis(
                p2c, jnp.asarray(p2c_pos)[None, None], axis=-1)
            score = score + p2c.transpose(0, 1, 3, 2) * scale

        if attn_mask is not None:
            score = jnp.where(attn_mask, score, -1e9)
        probs = jax.nn.softmax(score, axis=-1).astype(dtype)
        probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, dtype=dtype, name="out_proj")(ctx)


class DeBERTaLayer(nn.Module):
    config: DeBERTaConfig

    @nn.compact
    def __call__(self, x, rel_embeddings, attn_mask=None, *,
                 deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        y = DisentangledSelfAttention(cfg, name="self_attn")(
            x, rel_embeddings, attn_mask, deterministic=deterministic)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype, name="ln1")(x + y)
        h = nn.Dense(int(cfg.hidden_dim * cfg.mlp_ratio), dtype=dtype,
                     name="wi")(x)
        h = to_activation(cfg.activation)(h)
        h = nn.Dense(cfg.hidden_dim, dtype=dtype, name="wo")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype,
                            name="ln2")(x + h)


class DeBERTaEncoder(nn.Module):
    """Returns the same contract as TextEncoder:
    {"pooled", "tokens", "mask"}."""
    config: DeBERTaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask=None, *,
                 deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        x = MatmulGradEmbed(cfg.vocab_size, cfg.hidden_dim,
                            embedding_init=nn.initializers.normal(0.02),
                            dtype=dtype, name="token_embed")(input_ids)
        # NO absolute position embedding (position_biased_input=False)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype, name="ln_embed")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        span = (cfg.position_buckets if cfg.position_buckets > 0
                else cfg.max_relative_positions)
        rel = self.param("rel_embeddings", nn.initializers.normal(0.02),
                         (2 * span, cfg.hidden_dim), jnp.float32)
        rel = rel.astype(dtype)
        if cfg.norm_rel_ebd:
            rel = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype,
                               name="ln_rel")(rel)

        attn_mask = make_attention_mask(attention_mask, attention_mask)
        for i in range(cfg.num_layers):
            x = DeBERTaLayer(cfg, name=f"layers_{i}")(
                x, rel, attn_mask, deterministic=deterministic)

        pooled = pool_sequence(x, attention_mask, cfg.pooling)
        if cfg.output_dim:
            proj = nn.Dense(cfg.output_dim, use_bias=False, dtype=dtype,
                            name="projection")
            pooled, x = proj(pooled), proj(x)
        return {"pooled": pooled, "tokens": x, "mask": attention_mask}
