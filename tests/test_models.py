"""Shape/behavior tests for encoders, fusion zoo, and the classification
meta-arch (tiny configs — single host CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.models.config import (FusionConfig, TextEncoderConfig,
                                     VisualEncoderConfig, VQAModelConfig,
                                     MoEModelConfig, KnowledgeModelConfig)
from vivqa_tpu.models.encoders import create_text_encoder, create_visual_encoder
from vivqa_tpu.models.fusion import create_fusion
from vivqa_tpu.models.vqa_model import VietnameseVQAModel

TINY_VIS = VisualEncoderConfig(image_size=32, patch_size=8, hidden_dim=32,
                               num_layers=2, num_heads=2)
TINY_TXT = TextEncoderConfig(vocab_size=100, hidden_dim=32, num_layers=2,
                             num_heads=2, max_length=8)


def _tiny_model(fusion_type="concat", **kw):
    return VQAModelConfig(
        visual=TINY_VIS, text=TINY_TXT,
        fusion=FusionConfig(fusion_type=fusion_type, hidden_dim=32,
                            num_heads=2, num_layers=1, num_query_tokens=4),
        num_answers=10, **kw)


def test_vit_encoder_shapes(rng):
    enc = create_visual_encoder(TINY_VIS)
    x = jnp.zeros((2, 32, 32, 3))
    out = enc.apply(enc.init(rng, x), x)
    assert out["pooled"].shape == (2, 32)
    assert out["tokens"].shape == (2, 16, 32)   # (32/8)^2 patches


def test_resnet_encoder_shapes(rng):
    cfg = VisualEncoderConfig(backbone="resnet", image_size=32,
                              resnet_stages=(1, 1), resnet_width=32,
                              output_dim=64)
    enc = create_visual_encoder(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    out = enc.apply(enc.init(rng, x), x)
    assert out["pooled"].shape == (2, 64)
    assert out["tokens"].shape[0] == 2 and out["tokens"].shape[2] == 64


def test_swin_encoder_shapes(rng):
    cfg = VisualEncoderConfig(backbone="swin", image_size=32, swin_window=4,
                              swin_depths=(2, 2), swin_heads=(2, 4),
                              swin_embed_dim=16)
    enc = create_visual_encoder(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    out = enc.apply(enc.init(rng, x), x)
    assert out["pooled"].shape == (2, 32)       # 16 * 2 after one merge
    assert out["tokens"].shape == (2, 16, 32)   # 8x8 -> 4x4 grid


def test_text_encoder_pooling_modes(rng):
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8])
    for pooling in ("cls", "mean", "max"):
        enc = create_text_encoder(TINY_TXT.replace(pooling=pooling))
        out = enc.apply(enc.init(rng, ids, mask), ids, mask)
        assert out["pooled"].shape == (2, 32)
        assert np.isfinite(np.asarray(out["pooled"], np.float32)).all()


def test_text_encoder_mask_respected(rng):
    """Mean pooling must ignore padded positions."""
    enc = create_text_encoder(TINY_TXT.replace(pooling="mean"))
    ids_a = jnp.array([[5, 6, 7, 1, 1, 1, 1, 1]])
    mask = jnp.array([[1, 1, 1, 0, 0, 0, 0, 0]])
    ids_b = jnp.array([[5, 6, 7, 9, 9, 9, 9, 9]])  # different pad content
    var = enc.init(rng, ids_a, mask)
    out_a = enc.apply(var, ids_a, mask)["pooled"]
    out_b = enc.apply(var, ids_b, mask)["pooled"]
    # identical because padded positions are masked in attention + pooling
    np.testing.assert_allclose(np.asarray(out_a, np.float32),
                               np.asarray(out_b, np.float32), atol=2e-2)


@pytest.mark.parametrize("fusion_type", ["concat", "add", "bilinear",
                                         "cross_attention", "mcan", "mutan",
                                         "qformer", "single_stream"])
def test_fusion_contract(rng, fusion_type):
    cfg = FusionConfig(fusion_type=fusion_type, hidden_dim=32, num_heads=2,
                       num_layers=1, num_query_tokens=4)
    fusion = create_fusion(cfg)
    visual = {"pooled": jnp.ones((2, 32)), "tokens": jnp.ones((2, 5, 32))}
    text = {"pooled": jnp.ones((2, 32)), "tokens": jnp.ones((2, 8, 32)),
            "mask": jnp.ones((2, 8), jnp.int32)}
    out = fusion.apply(fusion.init(rng, visual, text), visual, text)
    assert out["pooled"].shape == (2, 32)
    assert out["tokens"].ndim == 3 and out["tokens"].shape[-1] == 32
    assert out["mask"].shape == out["tokens"].shape[:2]


def test_fusion_unknown_type():
    with pytest.raises(ValueError, match="unknown fusion"):
        create_fusion(FusionConfig(fusion_type="nope"))


def test_vqa_model_forward(rng):
    model = VietnameseVQAModel(_tiny_model("mcan"))
    px = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    out = model.apply(model.init(rng, px, ids), px, ids)
    assert out["logits"].shape == (2, 10)
    assert out["logits"].dtype == jnp.float32
    assert float(out["aux_loss"]) == 0.0


def test_vqa_model_with_moe_and_knowledge(rng):
    cfg = _tiny_model(
        "concat",
        moe=MoEModelConfig(use_moe=True, num_experts=4, top_k=2,
                           expert_hidden_dim=64),
        knowledge=KnowledgeModelConfig(use_knowledge=True))
    model = VietnameseVQAModel(cfg)
    px = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    know = jnp.ones((2, 3, 16))
    var = model.init(rng, px, ids, knowledge_embeddings=know)
    out = model.apply(var, px, ids, knowledge_embeddings=know)
    assert out["logits"].shape == (2, 10)
    assert float(out["aux_loss"]) > 0.0
    assert "expert_usage" in out["moe_metrics"]


def test_vqa_model_grads_flow(rng):
    model = VietnameseVQAModel(_tiny_model("bilinear"))
    px = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    var = model.init(rng, px, ids)

    def loss_fn(params):
        out = model.apply({"params": params}, px, ids)
        return out["logits"].sum()

    grads = jax.grad(loss_fn)(var["params"])
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    # answer head must receive gradient
    assert any(n > 0 for n in norms)


def test_cross_attention_layer_decode_matches_full(rng):
    """CrossAttentionLayer's decode path (flax self-attn cache + cached
    context K/V) must reproduce the full causal teacher-forcing forward
    token-by-token."""
    import flax.linen as nn
    from vivqa_tpu.models.layers import CrossAttentionLayer

    B, L, Lc, D, H = 2, 6, 5, 32, 4
    x = jax.random.normal(rng, (B, L, D), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7), (B, Lc, D), jnp.float32)

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, x, ctx, self_mask=None, decode=False):
            return CrossAttentionLayer(H, 64, 0.0, jnp.float32)(
                x, ctx, self_mask=self_mask, deterministic=True,
                decode=decode)

    m = Dec()
    causal = nn.make_causal_mask(jnp.zeros((B, L), jnp.int32),
                                 dtype=jnp.bool_)
    p = m.init(rng, x, ctx, self_mask=causal)
    full = m.apply(p, x, ctx, self_mask=causal)

    _, vars_ = m.apply(p, jnp.zeros_like(x), ctx, decode=True,
                       mutable=["cache"])
    cache = vars_["cache"]
    outs = []
    for t in range(L):
        o, vars_ = m.apply({**p, "cache": cache}, x[:, t:t + 1], ctx,
                           decode=True, mutable=["cache"])
        cache = vars_["cache"]
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               atol=1e-5)


def test_cached_cross_attention_caches_context_kv(rng):
    """In decode mode the context K/V projections are computed ONCE at
    cache init and reused — decode steps must not depend on recomputing
    them (verified by corrupting the context after init). Param layout
    must equal flax MHDPA's (query/key/value/out)."""
    from vivqa_tpu.models.layers import CachedCrossAttention

    B, L, Lc, D, H = 2, 3, 5, 32, 4
    x = jax.random.normal(rng, (B, L, D), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7), (B, Lc, D), jnp.float32)
    mod = CachedCrossAttention(num_heads=H, dtype=jnp.float32)
    p = mod.init(rng, x, ctx)
    assert set(p["params"]) == {"query", "key", "value", "out"}
    assert p["params"]["query"]["kernel"].shape == (D, H, D // H)
    ref = mod.apply(p, x, ctx)

    dec = CachedCrossAttention(num_heads=H, dtype=jnp.float32, decode=True)
    _, vars_ = dec.apply(p, x, ctx, mutable=["cache"])
    cache = vars_["cache"]
    assert "cached_ckey" in cache and "cached_cvalue" in cache
    out, _ = dec.apply({**p, "cache": cache}, x, ctx * 1e3,
                       mutable=["cache"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
