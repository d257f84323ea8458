"""Swin Transformer visual encoder (flax).

Real windowed attention with shifted windows, relative position bias and
patch merging — the reference only reaches Swin through timm
(reference: src/modeling/heads/image_representation.py:16-80, enum
vqa_config.py:11-18); here it is a first-class static-shape implementation.

TPU notes: window partition is pure reshape/transpose (no gather); the
shift is `jnp.roll` (cheap HBM-contiguous rotate); the shifted-window
attention mask and relative-position index are host-precomputed numpy
constants baked into the compiled program.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.layers import MlpBlock, to_activation, to_dtype


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) boolean mask: True = may attend."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    return (win[:, :, None] == win[:, None, :])


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B * (H // ws) * (W // ws), ws * ws, C)


def window_reverse(x: jnp.ndarray, ws: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (nB, ws*ws, C); attn_mask: (nW, L, L) bool or None."""
        nB, L, C = x.shape
        h, hd = self.num_heads, C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nB, L, 3, h, hd), 3, axis=2)
        q = q.squeeze(2).transpose(0, 2, 1, 3)   # (nB, h, L, hd)
        k = k.squeeze(2).transpose(0, 2, 1, 3)
        v = v.squeeze(2).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhld,bhmd->bhlm", q, k,
                          preferred_element_type=jnp.float32) / np.sqrt(hd)
        bias_table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h), jnp.float32)
        idx = _rel_pos_index(self.window_size)
        attn = attn + bias_table[idx].transpose(2, 0, 1)[None]
        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(nB // nW, nW, h, L, L)
            attn = jnp.where(attn_mask[None, :, None], attn, -1e9)
            attn = attn.reshape(nB, h, L, L)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v).transpose(0, 2, 1, 3)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(nB, L, C))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    input_hw: tuple
    dropout: float = 0.0
    dtype: object = jnp.bfloat16
    activation: str = "gelu_tanh"
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        H, W = self.input_hw
        B, L, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln1")(x).reshape(B, H, W, C)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(H, W, self.window_size, self.shift))
        else:
            mask = None
        wins = window_partition(x, self.window_size)
        wins = WindowAttention(self.dim, self.num_heads, self.window_size,
                               dtype=self.dtype, name="attn")(wins, mask)
        x = window_reverse(wins, self.window_size, B, H, W)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(B, L, C)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln2")(x)
        return x + MlpBlock(4 * self.dim, dropout=self.dropout,
                            dtype=self.dtype,
                            activation=to_activation(self.activation),
                            name="mlp")(y, deterministic=deterministic)


class PatchMerging(nn.Module):
    dim: int
    input_hw: tuple
    dtype: object = jnp.bfloat16
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        H, W = self.input_hw
        B, L, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinEncoder(nn.Module):
    config: VisualEncoderConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.config
        dtype = to_dtype(cfg.dtype)
        ws = cfg.swin_window
        B = pixel_values.shape[0]

        x = nn.Conv(cfg.swin_embed_dim, (4, 4), strides=(4, 4), dtype=dtype,
                    name="patch_embed")(pixel_values.astype(dtype))
        H = W = cfg.image_size // 4
        x = x.reshape(B, H * W, cfg.swin_embed_dim)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype, name="ln_embed")(x)

        dim = cfg.swin_embed_dim
        for s, (depth, heads) in enumerate(zip(cfg.swin_depths, cfg.swin_heads)):
            # standard Swin rule (timm/HF parity): when one window covers
            # the whole map, shrink the window and disable the shift
            ws_s = min(ws, H)
            for b in range(depth):
                shift = 0 if (b % 2 == 0 or H <= ws_s) else ws_s // 2
                x = SwinBlock(dim, heads, ws_s, shift, (H, W), cfg.dropout,
                              dtype=dtype, activation=cfg.activation,
                              ln_eps=cfg.ln_eps,
                              name=f"stage{s}_block{b}")(x, deterministic=deterministic)
            if s < len(cfg.swin_depths) - 1:
                x = PatchMerging(dim, (H, W), dtype=dtype,
                                 ln_eps=cfg.ln_eps,
                                 name=f"merge{s}")(x)
                H, W, dim = H // 2, W // 2, dim * 2
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype, name="ln_final")(x)
        pooled, tokens = x.mean(axis=1), x
        if cfg.output_dim:
            proj = nn.Dense(cfg.output_dim, use_bias=False, dtype=dtype,
                            name="projection")
            pooled, tokens = proj(pooled), proj(tokens)
        return {"pooled": pooled, "tokens": tokens}
