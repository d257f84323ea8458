"""Shared transformer building blocks (flax.linen).

These are the primitives every encoder/fusion/decoder in the framework is
assembled from. Naming is deliberate: attention submodules are called
``self_attn``/``cross_attn`` with inner ``query/key/value/out`` denses and
MLPs use ``wi``/``wo`` so the partition rules in
vivqa_tpu/parallel/mesh.py shard them tensor-parallel without per-model
annotations.

All blocks are pre-LayerNorm (better training stability than the
reference's post-LN torch blocks, reference vqa_model.py:237-311) and take
a compute ``dtype`` (bf16 by policy) while params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


def to_dtype(name: str) -> Dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def _gelu_exact(x):
    return nn.gelu(x, approximate=False)


def _quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


# "gelu_tanh" (fast approximation) is the native default; "gelu" (exact
# erf) and "quick_gelu" exist for HF weight-import numerical parity
# (BERT/ViT use exact gelu, CLIP uses quick_gelu).
ACTIVATIONS = {"gelu_tanh": nn.gelu, "gelu": _gelu_exact,
               "quick_gelu": _quick_gelu, "relu": nn.relu, "silu": nn.silu}


def to_activation(name: str) -> Callable:
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation '{name}' "
                         f"(choices: {tuple(ACTIVATIONS)})")
    return ACTIVATIONS[name]


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Sinusoidal position table (reference PositionalEncoding,
    generative_vqa_model.py:454-476)."""
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    table = np.zeros((length, dim), np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: (dim + 1) // 2])
    return table


class MlpBlock(nn.Module):
    """Transformer feed-forward block: wi -> act -> dropout -> wo."""
    d_ff: int
    out_dim: int = 0          # 0 = same as input
    dropout: float = 0.0
    activation: Callable = nn.gelu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="wi")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(out_dim, dtype=self.dtype, name="wo")(h)


class CachedCrossAttention(nn.Module):
    """Cross-attention that caches the projected context K/V in decode.

    Param layout is IDENTICAL to flax ``nn.MultiHeadDotProductAttention``
    (query/key/value/out DenseGenerals), so converted checkpoints, the
    partition rules, and the teacher-forcing training program are
    unchanged. The one behavioral difference: with ``decode=True`` the
    context K/V projections are computed ONCE at cache init and stored in
    the 'cache' collection ('cached_ckey'/'cached_cvalue') — the encoder
    memory is fixed for a whole generation, yet flax's module reprojected
    it at every generated token (it was ~30% of a decode step's FLOPs at
    ViVQA memory lengths).

    NOTE on the road not taken: an explicitly fused single QKV projection
    (one D->3D DenseGeneral) was implemented and measured SLOWER on the
    v5e headline train step (1,140 vs 1,161 QA-pairs/s/chip at B=128) —
    XLA's dot merger already fuses same-operand projection gemms, and the
    explicit stack added slice/concat materialization in both passes.
    See BASELINE.md (round 4).
    """
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    dropout_rate: float = 0.0
    decode: bool = False

    @nn.compact
    def __call__(self, x, context, mask=None, *,
                 deterministic: bool = True):
        D = x.shape[-1]
        H = self.num_heads
        assert D % H == 0, f"hidden dim {D} not divisible by {H} heads"
        q = nn.DenseGeneral((H, D // H), dtype=self.dtype,
                            name="query")(x)
        k_dense = nn.DenseGeneral((H, D // H), dtype=self.dtype,
                                  name="key")
        v_dense = nn.DenseGeneral((H, D // H), dtype=self.dtype,
                                  name="value")
        if self.decode:
            is_initialized = self.has_variable("cache", "cached_ckey")
            fresh_k = k_dense(context) if not is_initialized else None
            fresh_v = v_dense(context) if not is_initialized else None
            k = self.variable("cache", "cached_ckey", lambda: fresh_k).value
            v = self.variable("cache", "cached_cvalue",
                              lambda: fresh_v).value
        else:
            k = k_dense(context)
            v = v_dense(context)
        dropout_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        y = nn.dot_product_attention(
            q, k, v, mask=mask, dropout_rng=dropout_rng,
            dropout_rate=self.dropout_rate, deterministic=deterministic,
            dtype=self.dtype)
        return nn.DenseGeneral(D, axis=(-2, -1), dtype=self.dtype,
                               name="out")(y)


class EncoderLayer(nn.Module):
    """Self-attention encoder layer.

    norm_style="pre" (default): x + attn(LN(x)); x + mlp(LN(x)) — our
    native layout. norm_style="post": LN(x + attn(x)); LN(x + mlp(x)) —
    BERT layout, needed for HF weight-import parity.
    """
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    norm_style: str = "pre"
    activation: str = "gelu_tanh"
    # LayerScale (DINOv2/CaiT): per-channel learnable residual gains,
    # initialised to this value; 0.0 = disabled (pre-LN only)
    layer_scale_init: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        # flax MHDPA (three separate projection denses) is deliberately
        # kept here: an explicit fused QKV was measured 1.8% SLOWER on
        # the v5e train step — see CachedCrossAttention's docstring.
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, name="self_attn")
        mlp = MlpBlock(self.d_ff, dropout=self.dropout, dtype=self.dtype,
                       activation=to_activation(self.activation),
                       name="mlp")
        ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        drop = nn.Dropout(self.dropout)
        if self.norm_style == "post":
            y = attn(x, x, mask=mask, deterministic=deterministic)
            x = ln1(x + drop(y, deterministic=deterministic))
            y = mlp(x, deterministic=deterministic)
            return ln2(x + drop(y, deterministic=deterministic))
        ls1 = ls2 = None
        if self.layer_scale_init > 0:
            D = x.shape[-1]
            init = nn.initializers.constant(self.layer_scale_init)
            ls1 = self.param("ls1_scale", init, (D,), jnp.float32)
            ls2 = self.param("ls2_scale", init, (D,), jnp.float32)
        y = attn(ln1(x), ln1(x), mask=mask, deterministic=deterministic)
        if ls1 is not None:
            y = y * ls1.astype(y.dtype)
        x = x + drop(y, deterministic=deterministic)
        y = mlp(ln2(x), deterministic=deterministic)
        if ls2 is not None:
            y = y * ls2.astype(y.dtype)
        return x + drop(y, deterministic=deterministic)


class CrossAttentionLayer(nn.Module):
    """Pre-LN layer with self-attention, cross-attention to a context
    sequence, and an MLP (reference CrossModalAttention,
    vqa_model.py:237-311, redesigned pre-LN)."""
    num_heads: int
    d_ff: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, self_mask=None, cross_mask=None, *,
                 deterministic: bool = True, decode: bool = False):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, decode=decode, name="self_attn",
        )(y, y, mask=self_mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="ln_cross")(x)
        y = CachedCrossAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, decode=decode, name="cross_attn",
        )(y, context, mask=cross_mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = MlpBlock(self.d_ff, dropout=self.dropout, dtype=self.dtype,
                     name="mlp")(y, deterministic=deterministic)
        return x + nn.Dropout(self.dropout)(y, deterministic=deterministic)


def pool_sequence(hidden: jnp.ndarray, mask: Optional[jnp.ndarray],
                  pooling: str) -> jnp.ndarray:
    """Pool (B, L, D) -> (B, D). pooling in {cls, mean, max}
    (reference TextEncoder pooling, vqa_model.py:179-204)."""
    if pooling == "cls":
        return hidden[:, 0]
    if mask is None:
        mask = jnp.ones(hidden.shape[:2], dtype=hidden.dtype)
    m = mask[..., None].astype(hidden.dtype)
    if pooling == "mean":
        return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)
    if pooling == "max":
        neg = jnp.finfo(hidden.dtype).min
        return jnp.where(m > 0, hidden, neg).max(axis=1)
    raise ValueError(f"unknown pooling: {pooling}")


def make_attention_mask(query_mask: Optional[jnp.ndarray],
                        key_mask: Optional[jnp.ndarray],
                        dtype: Dtype = jnp.float32) -> Optional[jnp.ndarray]:
    """Build a (B, 1, Lq, Lk) boolean attention mask from padding masks."""
    if query_mask is None and key_mask is None:
        return None
    if query_mask is None:
        query_mask = jnp.ones((key_mask.shape[0], 1), key_mask.dtype)
    if key_mask is None:
        key_mask = jnp.ones((query_mask.shape[0], 1), query_mask.dtype)
    mask = nn.make_attention_mask(query_mask, key_mask, dtype=jnp.bool_)
    return mask


def make_causal_mask(x_ids: jnp.ndarray) -> jnp.ndarray:
    return nn.make_causal_mask(x_ids, dtype=jnp.bool_)
