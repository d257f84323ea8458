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


def test_bartpho_conversion_parity():
    """BARTpho is an mBART; its encoder maps onto TextEncoder's pre-LN
    layout (verdict r4 missing #2). Random-init MBartModel, encoder
    outputs compared element-wise."""
    from transformers import MBartConfig, MBartModel
    from vivqa_tpu.models.convert import convert_bart
    hf_cfg = MBartConfig(vocab_size=100, d_model=32, encoder_layers=2,
                         decoder_layers=1, encoder_attention_heads=2,
                         decoder_attention_heads=2, encoder_ffn_dim=64,
                         decoder_ffn_dim=64, max_position_embeddings=20,
                         dropout=0.0, attention_dropout=0.0,
                         activation_dropout=0.0,
                         activation_function="gelu", scale_embedding=True,
                         pad_token_id=1)
    hf = MBartModel(hf_cfg).eval()

    cfg = TextEncoderConfig(vocab_size=100, hidden_dim=32, num_layers=2,
                            num_heads=2, mlp_ratio=2.0, max_length=8,
                            type_vocab_size=1, dropout=0.0,
                            norm_style="pre", activation="gelu",
                            dtype="float32")
    params = convert_bart(hf, cfg)
    model = TextEncoder(cfg)

    ids = np.random.RandomState(2).randint(2, 100, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        want = hf.get_encoder()(input_ids=torch.tensor(ids),
                                attention_mask=torch.tensor(mask)
                                ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))["tokens"], np.float32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_bartpho_loader_dispatch(tmp_path):
    """load_pretrained_text_encoder routes mbart checkpoints through
    convert_bart and re-derives the pre-LN architecture config."""
    from transformers import MBartConfig, MBartModel
    from vivqa_tpu.models.convert import load_pretrained_text_encoder
    d = tmp_path / "hf_bartpho"
    MBartModel(MBartConfig(vocab_size=128, d_model=32, encoder_layers=1,
                           decoder_layers=1, encoder_attention_heads=2,
                           decoder_attention_heads=2, encoder_ffn_dim=64,
                           decoder_ffn_dim=64, max_position_embeddings=16,
                           dropout=0.0, scale_embedding=True,
                           pad_token_id=1)).save_pretrained(d)
    cfg = TextEncoderConfig(backbone="bartpho", max_length=8, dropout=0.0,
                            dtype="float32")
    enc, params = load_pretrained_text_encoder(str(d), cfg)
    assert enc.config.norm_style == "pre"
    assert enc.config.hidden_dim == 32 and enc.config.num_layers == 1
    assert "ln_final" in params and "layers_0" in params
    # converted tree grafts into the module's own init tree
    ids = jnp.ones((1, 8), jnp.int32)
    import jax
    init = enc.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(
                jax.tree.map(jnp.asarray, params)))
    with pytest.raises(ValueError, match="usable positions"):
        load_pretrained_text_encoder(str(d), cfg.replace(max_length=64))


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


def test_resnet_conversion_parity():
    """HF ResNetModel (random init, eval) == ResNetEncoder with folded
    frozen-BN weights. Covers the north-star ResNet-50 tower
    (reference image_representation.py:16-80)."""
    from transformers import ResNetConfig, ResNetModel
    hf_cfg = ResNetConfig(embedding_size=8, hidden_sizes=[32, 64],
                          depths=[1, 1], layer_type="bottleneck",
                          num_channels=3)
    hf = ResNetModel(hf_cfg).eval()
    from vivqa_tpu.models.convert import convert_resnet
    from vivqa_tpu.models.encoders.resnet import ResNetEncoder
    cfg = VisualEncoderConfig(backbone="resnet", image_size=32,
                              resnet_width=8, resnet_stages=(1, 1),
                              resnet_norm="frozen_bn", dtype="float32")
    params = convert_resnet(hf, cfg)
    model = ResNetEncoder(cfg)
    px = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(px.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()       # (B, C, H, W)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(px))
                     ["tokens"], np.float32)        # (B, H*W, C)
    B, C, H, W = want.shape
    want_tokens = want.transpose(0, 2, 3, 1).reshape(B, H * W, C)
    np.testing.assert_allclose(got, want_tokens, atol=ATOL)


def test_swin_conversion_parity():
    """HF SwinModel == SwinEncoder with fused-qkv converted weights,
    incl. shifted windows, relative position bias and patch merging."""
    from transformers import SwinConfig, SwinModel
    hf_cfg = SwinConfig(image_size=56, patch_size=4, embed_dim=8,
                        depths=[2, 2], num_heads=[2, 4], window_size=7,
                        num_channels=3, drop_path_rate=0.0,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()
    from vivqa_tpu.models.convert import convert_swin
    from vivqa_tpu.models.encoders.swin import SwinEncoder
    cfg = VisualEncoderConfig(backbone="swin", image_size=56,
                              swin_embed_dim=8, swin_depths=(2, 2),
                              swin_heads=(2, 4), swin_window=7,
                              dropout=0.0, activation="gelu",
                              ln_eps=1e-5, dtype="float32")
    params = convert_swin(hf, cfg)
    model = SwinEncoder(cfg)
    px = np.random.RandomState(1).rand(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(px.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()       # (B, L, C)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(px))
                     ["tokens"], np.float32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_dinov2_conversion_parity():
    """HF Dinov2Model == ViTEncoder with LayerScale converted weights."""
    from transformers import Dinov2Config, Dinov2Model
    hf_cfg = Dinov2Config(image_size=28, patch_size=7, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          mlp_ratio=2, hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          layerscale_value=0.5)
    hf = Dinov2Model(hf_cfg).eval()
    from vivqa_tpu.models.convert import convert_dinov2
    from vivqa_tpu.models.encoders.vit import ViTEncoder
    cfg = VisualEncoderConfig(backbone="dino", image_size=28, patch_size=7,
                              hidden_dim=32, num_layers=2, num_heads=2,
                              mlp_ratio=2.0, dropout=0.0,
                              vit_style="vit", activation="gelu",
                              layer_scale_init=0.5, dtype="float32")
    params = convert_dinov2(hf, cfg)
    model = ViTEncoder(cfg)
    px = np.random.RandomState(2).rand(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(px.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()       # (B, 1+L, C)
    out = model.apply({"params": params}, jnp.asarray(px))
    got_cls = np.asarray(out["pooled"], np.float32)
    got_tokens = np.asarray(out["tokens"], np.float32)
    np.testing.assert_allclose(got_cls, want[:, 0], atol=ATOL)
    np.testing.assert_allclose(got_tokens, want[:, 1:], atol=ATOL)


def test_deberta_conversion_parity():
    """HF DebertaV2Model == DeBERTaEncoder (real disentangled attention:
    c2c + c2p + p2c over log-bucketed relative positions)."""
    from transformers import DebertaV2Config, DebertaV2Model
    hf_cfg = DebertaV2Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, relative_attention=True,
        position_buckets=8, max_relative_positions=32,
        norm_rel_ebd="layer_norm", pos_att_type=["p2c", "c2p"],
        position_biased_input=False, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, type_vocab_size=0,
        share_att_key=True)   # deberta-v3 layout (shared pos projections)
    hf = DebertaV2Model(hf_cfg).eval()
    from vivqa_tpu.models.convert import convert_deberta
    from vivqa_tpu.models.encoders.deberta import (DeBERTaConfig,
                                                   DeBERTaEncoder)
    cfg = DeBERTaConfig(vocab_size=100, hidden_dim=32, num_layers=2,
                        num_heads=2, mlp_ratio=2.0, max_length=8,
                        position_buckets=8, max_relative_positions=32,
                        pos_att_type=("p2c", "c2p"), norm_rel_ebd=True,
                        dropout=0.0, activation="gelu",
                        ln_eps=hf_cfg.layer_norm_eps, dtype="float32")
    params = convert_deberta(hf, cfg)
    model = DeBERTaEncoder(cfg)
    ids = np.random.RandomState(3).randint(0, 100, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))["tokens"], np.float32)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_graft_pretrained_strict():
    from vivqa_tpu.models.convert import graft_pretrained

    init = {"visual_encoder": {"a": np.zeros((2, 3)), "b": np.zeros(4)},
            "head": {"w": np.zeros(5)}}
    conv = {"a": np.ones((2, 3)), "b": np.ones(4)}
    out = graft_pretrained(init, "visual_encoder", conv)
    assert out["visual_encoder"] is conv
    assert out["head"] is init["head"]          # untouched subtree shared
    assert init["visual_encoder"]["a"].sum() == 0   # input not mutated

    with pytest.raises(KeyError, match="no tower"):
        graft_pretrained(init, "nope", conv)
    with pytest.raises(ValueError, match="structure mismatch"):
        graft_pretrained(init, "visual_encoder", {"a": np.ones((2, 3))})
    with pytest.raises(ValueError, match="shape"):
        graft_pretrained(init, "visual_encoder",
                         {"a": np.ones((9, 9)), "b": np.ones(4)})
