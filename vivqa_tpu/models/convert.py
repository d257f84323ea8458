"""HF (PyTorch) -> flax weight conversion for the encoder zoo.

The reference loads pretrained towers directly through HF AutoModel
(src/modeling/meta_arch/vqa_model.py:83-88,:134-234); this framework owns
its architectures, so pretrained weights arrive via explicit converters:

- convert_bert:        BertModel / RobertaModel / PhoBERT -> TextEncoder
                       (norm_style="post", activation="gelu")
- convert_vit:         ViTModel -> ViTEncoder (vit_style="vit",
                       activation="gelu")
- convert_clip_vision: CLIPVisionModel -> ViTEncoder (vit_style="clip",
                       activation="quick_gelu")

Numerical parity is validated in tests/test_convert.py against randomly
initialized HF torch models (no network needed). RoBERTa-family position
embeddings are offset by 2 (padding_idx+1) — handled via `pos_offset`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vivqa_tpu.models.config import TextEncoderConfig, VisualEncoderConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (detached, fp32)."""
    return np.asarray(x.detach().cpu().numpy(), np.float32)


def _attn_in(w, b, heads):
    """HF Linear (out=D, in=D) -> flax MHA in-proj kernel (D, H, Dh)."""
    D = w.shape[1]
    return (_t(w).T.reshape(D, heads, D // heads),
            _t(b).reshape(heads, D // heads))


def _attn_out(w, b, heads):
    """HF out-proj Linear (out=D, in=D) -> flax (H, Dh, D)."""
    D = w.shape[0]
    return _t(w).T.reshape(heads, D // heads, D), _t(b)


def _linear(w, b=None):
    out = {"kernel": _t(w).T}
    if b is not None:
        out["bias"] = _t(b)
    return out


def _ln(mod):
    return {"scale": _t(mod.weight), "bias": _t(mod.bias)}


def convert_bert(hf_model, config: TextEncoderConfig,
                 pos_offset: int = 0) -> Dict:
    """BertModel/RobertaModel -> TextEncoder params. For RoBERTa/PhoBERT
    pass pos_offset=2 (their position ids start at padding_idx+1)."""
    assert config.norm_style == "post", \
        "HF BERT-family weights require norm_style='post'"
    emb = hf_model.embeddings
    L = config.max_length
    pos = _t(emb.position_embeddings.weight)[pos_offset: pos_offset + L]
    if config.type_vocab_size <= 1 and hasattr(emb, "token_type_embeddings"):
        # RoBERTa-family keeps a 1-row type embedding that is always
        # added; fold it into the position table (exact equivalence)
        pos = pos + _t(emb.token_type_embeddings.weight)[0]
    params: Dict = {
        "token_embed": {"embedding": _t(emb.word_embeddings.weight)},
        "pos_embed": {"embedding": pos},
        "ln_embed": _ln(emb.LayerNorm),
    }
    if config.type_vocab_size > 1:
        params["type_embed"] = {
            "embedding": _t(emb.token_type_embeddings.weight)}
    H = config.num_heads
    for i, layer in enumerate(hf_model.encoder.layer):
        qk, qb = _attn_in(layer.attention.self.query.weight,
                          layer.attention.self.query.bias, H)
        kk, kb = _attn_in(layer.attention.self.key.weight,
                          layer.attention.self.key.bias, H)
        vk, vb = _attn_in(layer.attention.self.value.weight,
                          layer.attention.self.value.bias, H)
        ok, ob = _attn_out(layer.attention.output.dense.weight,
                           layer.attention.output.dense.bias, H)
        params[f"layers_{i}"] = {
            "self_attn": {"query": {"kernel": qk, "bias": qb},
                          "key": {"kernel": kk, "bias": kb},
                          "value": {"kernel": vk, "bias": vb},
                          "out": {"kernel": ok, "bias": ob}},
            "ln1": _ln(layer.attention.output.LayerNorm),
            "mlp": {"wi": _linear(layer.intermediate.dense.weight,
                                  layer.intermediate.dense.bias),
                    "wo": _linear(layer.output.dense.weight,
                                  layer.output.dense.bias)},
            "ln2": _ln(layer.output.LayerNorm),
        }
    return params


def convert_vit(hf_model, config: VisualEncoderConfig) -> Dict:
    """ViTModel -> ViTEncoder params."""
    emb = hf_model.embeddings
    params: Dict = {
        "cls_token": _t(emb.cls_token),
        "pos_embed": _t(emb.position_embeddings),
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": _t(emb.patch_embeddings.projection.weight
                         ).transpose(2, 3, 1, 0),
            "bias": _t(emb.patch_embeddings.projection.bias)},
        "ln_final": _ln(hf_model.layernorm),
    }
    H = config.num_heads
    for i, layer in enumerate(hf_model.encoder.layer):
        att = layer.attention.attention
        qk, qb = _attn_in(att.query.weight, att.query.bias, H)
        kk, kb = _attn_in(att.key.weight, att.key.bias, H)
        vk, vb = _attn_in(att.value.weight, att.value.bias, H)
        ok, ob = _attn_out(layer.attention.output.dense.weight,
                           layer.attention.output.dense.bias, H)
        params[f"layers_{i}"] = {
            "self_attn": {"query": {"kernel": qk, "bias": qb},
                          "key": {"kernel": kk, "bias": kb},
                          "value": {"kernel": vk, "bias": vb},
                          "out": {"kernel": ok, "bias": ob}},
            "ln1": _ln(layer.layernorm_before),
            "ln2": _ln(layer.layernorm_after),
            "mlp": {"wi": _linear(layer.intermediate.dense.weight,
                                  layer.intermediate.dense.bias),
                    "wo": _linear(layer.output.dense.weight,
                                  layer.output.dense.bias)},
        }
    return params


def convert_clip_vision(hf_model, config: VisualEncoderConfig) -> Dict:
    """CLIPVisionModel -> ViTEncoder(vit_style='clip') params."""
    assert config.vit_style == "clip"
    vm = hf_model.vision_model
    emb = vm.embeddings
    D = config.hidden_dim
    params: Dict = {
        "cls_token": _t(emb.class_embedding).reshape(1, 1, D),
        "pos_embed": _t(emb.position_embedding.weight)[None],
        "patch_embed": {
            "kernel": _t(emb.patch_embedding.weight).transpose(2, 3, 1, 0),
            # CLIP's patch conv has no bias
            "bias": np.zeros((D,), np.float32)},
        "ln_pre": _ln(vm.pre_layrnorm),       # (sic — HF attribute name)
        "ln_final": _ln(vm.post_layernorm),
    }
    H = config.num_heads
    for i, layer in enumerate(vm.encoder.layers):
        sa = layer.self_attn
        qk, qb = _attn_in(sa.q_proj.weight, sa.q_proj.bias, H)
        kk, kb = _attn_in(sa.k_proj.weight, sa.k_proj.bias, H)
        vk, vb = _attn_in(sa.v_proj.weight, sa.v_proj.bias, H)
        ok, ob = _attn_out(sa.out_proj.weight, sa.out_proj.bias, H)
        params[f"layers_{i}"] = {
            "self_attn": {"query": {"kernel": qk, "bias": qb},
                          "key": {"kernel": kk, "bias": kb},
                          "value": {"kernel": vk, "bias": vb},
                          "out": {"kernel": ok, "bias": ob}},
            "ln1": _ln(layer.layer_norm1),
            "ln2": _ln(layer.layer_norm2),
            "mlp": {"wi": _linear(layer.mlp.fc1.weight, layer.mlp.fc1.bias),
                    "wo": _linear(layer.mlp.fc2.weight, layer.mlp.fc2.bias)},
        }
    return params


def load_pretrained_text_encoder(name_or_path: str,
                                 config: TextEncoderConfig):
    """AutoModel (local cache only) -> (TextEncoder, params)."""
    from transformers import AutoModel
    from vivqa_tpu.models.encoders.text import TextEncoder
    hf = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    offset = 2 if hf.config.model_type in ("roberta", "phobert",
                                           "xlm-roberta") else 0
    cfg = config.replace(norm_style="post", activation="gelu",
                         vocab_size=hf.config.vocab_size,
                         hidden_dim=hf.config.hidden_size,
                         num_layers=hf.config.num_hidden_layers,
                         num_heads=hf.config.num_attention_heads)
    return TextEncoder(cfg), convert_bert(hf, cfg, pos_offset=offset)
