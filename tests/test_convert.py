"""HF weight-conversion numerical parity tests.

Randomly initialized HF torch models (no network) are converted and
their outputs compared element-wise against our flax encoders in fp32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vivqa_tpu.models.config import TextEncoderConfig, VisualEncoderConfig  # noqa: E402
from vivqa_tpu.models.convert import (convert_bert, convert_clip_vision,  # noqa: E402
                                      convert_vit)
from vivqa_tpu.models.encoders.text import TextEncoder  # noqa: E402
from vivqa_tpu.models.encoders.vit import ViTEncoder  # noqa: E402

# flax LayerNorm uses epsilon=1e-6 while HF models use 1e-12 (BERT/ViT)
# or 1e-5 (CLIP); on random weights this bounds the element-wise gap at
# ~1e-3 — far below bf16 noise in real training. Mapping errors show up
# as O(1) differences (see the RoBERTa type-embedding case).
ATOL = 3e-3


def test_bert_conversion_parity():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=100, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=16,
                        type_vocab_size=2, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = TextEncoderConfig(vocab_size=100, hidden_dim=32, num_layers=2,
                            num_heads=2, mlp_ratio=2.0, max_length=8,
                            type_vocab_size=2, dropout=0.0,
                            norm_style="post", activation="gelu",
                            dtype="float32")
    params = convert_bert(hf, cfg)
    model = TextEncoder(cfg)

    ids = np.random.RandomState(0).randint(0, 100, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))["tokens"], np.float32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_roberta_conversion_offset():
    from transformers import RobertaConfig, RobertaModel
    hf_cfg = RobertaConfig(vocab_size=100, hidden_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=20, type_vocab_size=1,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0, pad_token_id=1)
    hf = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = TextEncoderConfig(vocab_size=100, hidden_dim=32, num_layers=1,
                            num_heads=2, mlp_ratio=2.0, max_length=8,
                            type_vocab_size=1, dropout=0.0,
                            norm_style="post", activation="gelu",
                            dtype="float32")
    params = convert_bert(hf, cfg, pos_offset=2)   # RoBERTa offset
    model = TextEncoder(cfg)
    # all-real tokens (no padding) so HF position ids are 2..9 contiguous
    ids = np.random.RandomState(1).randint(2, 100, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))["tokens"], np.float32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_vit_conversion_parity():
    from transformers import ViTConfig, ViTModel
    hf_cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       image_size=32, patch_size=8,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = VisualEncoderConfig(backbone="vit", image_size=32, patch_size=8,
                              hidden_dim=32, num_layers=2, num_heads=2,
                              mlp_ratio=2.0, dropout=0.0,
                              activation="gelu", dtype="float32")
    params = convert_vit(hf, cfg)
    model = ViTEncoder(cfg)
    px = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(
            px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = model.apply({"params": params}, jnp.asarray(px))
    got = np.concatenate([np.asarray(out["pooled"])[:, None],
                          np.asarray(out["tokens"])], axis=1)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_clip_vision_conversion_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=32, patch_size=8,
                              attention_dropout=0.0)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = VisualEncoderConfig(backbone="clip", image_size=32, patch_size=8,
                              hidden_dim=32, num_layers=2, num_heads=2,
                              mlp_ratio=2.0, dropout=0.0, vit_style="clip",
                              activation="quick_gelu", dtype="float32")
    params = convert_clip_vision(hf, cfg)
    model = ViTEncoder(cfg)
    px = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)))
        want_tokens = hf_out.last_hidden_state.numpy()[:, 1:]
        want_pooled = hf_out.pooler_output.numpy()
    out = model.apply({"params": params}, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(out["tokens"]), want_tokens,
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["pooled"]), want_pooled,
                               atol=ATOL)
