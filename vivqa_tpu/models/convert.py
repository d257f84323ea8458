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


def convert_bart(hf_model, config: TextEncoderConfig) -> Dict:
    """MBartModel (or its .encoder) -> TextEncoder params.

    BARTpho (vinai/bartpho-syllable|word) is an mBART: the reference
    declares it as a text-backbone choice but never loads it
    (vqa_config.py:20-27); here the ENCODER half maps onto TextEncoder's
    pre-LN layout exactly — layernorm_embedding after emb+pos (ln_embed),
    pre-LN layers (self_attn_layer_norm -> ln1, final_layer_norm -> ln2,
    fc1/fc2 -> mlp wi/wo), and mBART's final layer_norm -> ln_final.
    Learned positions are offset by 2 rows (BART convention) and there
    are no token types. mBART's sqrt(D) embedding scale is folded into
    the token table — exact, the table is only read by lookup here.
    Requires the mBART (pre-LN) layout; plain BART is post-LN WITHOUT a
    final layer_norm, which TextEncoder deliberately does not model."""
    assert config.norm_style == "pre", \
        "mBART/BARTpho weights require norm_style='pre'"
    enc = getattr(hf_model, "encoder", hf_model)
    assert getattr(enc, "layer_norm", None) is not None, \
        "convert_bart supports the mBART (pre-LN) encoder layout only"
    L = config.max_length
    # the sqrt(D) scale moved between transformers versions: older puts
    # it on the encoder, newer on MBartScaledWordEmbedding itself
    scale = float(getattr(enc, "embed_scale", None)
                  or getattr(enc.embed_tokens, "embed_scale", None) or 1.0)
    params: Dict = {
        "token_embed": {"embedding": _t(enc.embed_tokens.weight) * scale},
        # MBartLearnedPositionalEmbedding: table has 2 extra leading rows
        "pos_embed": {"embedding": _t(enc.embed_positions.weight)[2: 2 + L]},
        "ln_embed": _ln(enc.layernorm_embedding),
        "ln_final": _ln(enc.layer_norm),
    }
    H = config.num_heads
    for i, layer in enumerate(enc.layers):
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
            "ln1": _ln(layer.self_attn_layer_norm),
            "ln2": _ln(layer.final_layer_norm),
            "mlp": {"wi": _linear(layer.fc1.weight, layer.fc1.bias),
                    "wo": _linear(layer.fc2.weight, layer.fc2.bias)},
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
    """AutoModel (local cache only) -> (TextEncoder, params).

    Every architecture dimension is derived from the HF config so the
    returned module's param tree is structurally identical to the
    converted params — required for grafting into a pipeline-initialized
    model (graft_pretrained)."""
    from transformers import AutoModel
    from vivqa_tpu.models.encoders.text import TextEncoder
    hf = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    if hf.config.model_type in ("mbart", "bart"):
        # BARTpho family: encoder half of the seq2seq model, pre-LN
        usable = hf.config.max_position_embeddings  # table carries +2 rows
        if config.max_length > usable:
            raise ValueError(
                f"pretrained text encoder '{name_or_path}' has only "
                f"{usable} usable positions but max_length="
                f"{config.max_length} was requested — reduce "
                f"data.max_question_length to <= {usable}")
        cfg = config.replace(
            norm_style="pre",
            activation=getattr(hf.config, "activation_function", "gelu"),
            vocab_size=hf.config.vocab_size,
            hidden_dim=hf.config.d_model,
            num_layers=hf.config.encoder_layers,
            num_heads=hf.config.encoder_attention_heads,
            mlp_ratio=hf.config.encoder_ffn_dim / hf.config.d_model,
            type_vocab_size=1)
        return TextEncoder(cfg), convert_bart(hf, cfg)
    offset = 2 if hf.config.model_type in ("roberta", "phobert",
                                           "xlm-roberta") else 0
    usable = hf.config.max_position_embeddings - offset
    if config.max_length > usable:
        raise ValueError(
            f"pretrained text encoder '{name_or_path}' has only {usable} "
            f"usable positions (max_position_embeddings="
            f"{hf.config.max_position_embeddings}, offset {offset}) but "
            f"max_length={config.max_length} was requested — reduce "
            f"data.max_question_length to <= {usable}")
    cfg = config.replace(norm_style="post", activation="gelu",
                         vocab_size=hf.config.vocab_size,
                         hidden_dim=hf.config.hidden_size,
                         num_layers=hf.config.num_hidden_layers,
                         num_heads=hf.config.num_attention_heads,
                         mlp_ratio=(hf.config.intermediate_size
                                    / hf.config.hidden_size),
                         type_vocab_size=getattr(hf.config,
                                                 "type_vocab_size", 1))
    return TextEncoder(cfg), convert_bert(hf, cfg, pos_offset=offset)


def _fold_bn(bn) -> Dict:
    """torch BatchNorm (eval) -> FrozenAffine {scale, bias}:
    y = x*gamma/sqrt(var+eps) + (beta - mean*gamma/sqrt(var+eps))."""
    g, b = _t(bn.weight), _t(bn.bias)
    mean, var = _t(bn.running_mean), _t(bn.running_var)
    scale = g / np.sqrt(var + bn.eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv_nhwc(w) -> Dict:
    """torch conv (out, in, kh, kw) -> flax {kernel (kh, kw, in, out)}."""
    return {"kernel": _t(w).transpose(2, 3, 1, 0)}


def convert_resnet(hf_model, config: VisualEncoderConfig) -> Dict:
    """HF ResNetModel (microsoft/resnet-50 layout — the same weights the
    reference pulls via torchvision, image_representation.py:16-80) ->
    ResNetEncoder(resnet_norm='frozen_bn') params. BatchNorm running
    stats are folded into per-channel affines."""
    assert config.resnet_norm == "frozen_bn", \
        "pretrained ResNet weights require resnet_norm='frozen_bn'"
    emb = hf_model.embedder.embedder
    params: Dict = {
        "stem": _conv_nhwc(emb.convolution.weight),
        "stem_norm": _fold_bn(emb.normalization),
    }
    for s, stage in enumerate(hf_model.encoder.stages):
        for b, block in enumerate(stage.layers):
            p = {}
            for ci, conv_layer in enumerate(block.layer):
                p[f"conv{ci + 1}"] = _conv_nhwc(conv_layer.convolution.weight)
                p[f"norm{ci + 1}"] = _fold_bn(conv_layer.normalization)
            sc = getattr(block, "shortcut", None)
            if sc is not None and hasattr(sc, "convolution"):
                p["downsample"] = _conv_nhwc(sc.convolution.weight)
                p["downsample_norm"] = _fold_bn(sc.normalization)
            params[f"stage{s}_block{b}"] = p
    return params


def _swin_merge_perm(C: int) -> np.ndarray:
    """HF SwinPatchMerging concatenates 2x2 neighbourhoods in order
    (0,0),(1,0),(0,1),(1,1); our reshape-transpose produces
    (0,0),(0,1),(1,0),(1,1). Permutation of HF's 4C input dims into ours."""
    groups = [0, 2, 1, 3]    # ours[k] = HF[groups[k]]
    return np.concatenate([np.arange(g * C, (g + 1) * C) for g in groups])


def convert_swin(hf_model, config: VisualEncoderConfig) -> Dict:
    """HF SwinModel -> SwinEncoder params. Attention q/k/v weights fuse
    into the single `qkv` Dense; relative-position bias tables copy
    directly (identical index convention); patch-merging weights are
    permuted for the 2x2 concat-order difference."""
    emb = hf_model.embeddings
    params: Dict = {
        "patch_embed": {
            "kernel": _t(emb.patch_embeddings.projection.weight
                         ).transpose(2, 3, 1, 0),
            "bias": _t(emb.patch_embeddings.projection.bias)},
        "ln_embed": _ln(emb.norm),
        "ln_final": _ln(hf_model.layernorm),
    }
    for s, stage in enumerate(hf_model.encoder.layers):
        for b, block in enumerate(stage.blocks):
            att = block.attention
            qkv_kernel = np.concatenate(
                [_t(att.self.query.weight).T, _t(att.self.key.weight).T,
                 _t(att.self.value.weight).T], axis=1)
            qkv_bias = np.concatenate(
                [_t(att.self.query.bias), _t(att.self.key.bias),
                 _t(att.self.value.bias)])
            params[f"stage{s}_block{b}"] = {
                "ln1": _ln(block.layernorm_before),
                "attn": {
                    "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                    "proj": _linear(att.output.dense.weight,
                                    att.output.dense.bias),
                    "rel_pos_bias": _t(att.self.relative_position_bias_table),
                },
                "ln2": _ln(block.layernorm_after),
                "mlp": {"wi": _linear(block.intermediate.dense.weight,
                                      block.intermediate.dense.bias),
                        "wo": _linear(block.output.dense.weight,
                                      block.output.dense.bias)},
            }
        ds = getattr(stage, "downsample", None)
        if ds is not None:
            C = _t(ds.norm.weight).shape[0] // 4
            perm = _swin_merge_perm(C)
            params[f"merge{s}"] = {
                "ln": {"scale": _t(ds.norm.weight)[perm],
                       "bias": _t(ds.norm.bias)[perm]},
                "reduction": {"kernel": _t(ds.reduction.weight).T[perm]},
            }
    return params


def convert_dinov2(hf_model, config: VisualEncoderConfig) -> Dict:
    """HF Dinov2Model -> ViTEncoder(layer_scale_init>0) params."""
    assert config.layer_scale_init > 0, \
        "DINOv2 weights require layer_scale_init > 0 (LayerScale towers)"
    emb = hf_model.embeddings
    params: Dict = {
        "cls_token": _t(emb.cls_token),
        "pos_embed": _t(emb.position_embeddings),
        "patch_embed": {
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
            "ln1": _ln(layer.norm1),
            "ln2": _ln(layer.norm2),
            "ls1_scale": _t(layer.layer_scale1.lambda1),
            "ls2_scale": _t(layer.layer_scale2.lambda1),
            "mlp": {"wi": _linear(layer.mlp.fc1.weight, layer.mlp.fc1.bias),
                    "wo": _linear(layer.mlp.fc2.weight, layer.mlp.fc2.bias)},
        }
    return params


def load_pretrained_visual_encoder(name_or_path: str,
                                   config: VisualEncoderConfig):
    """AutoModel (local cache only) -> (encoder module, params) for the
    four north-star visual towers: ViT, CLIP-vision, ResNet-50, Swin,
    DINOv2 (reference pulls these via torchvision/timm/HF,
    image_representation.py:16-80)."""
    from transformers import AutoModel
    hf = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    mt = hf.config.model_type
    from vivqa_tpu.models.encoders.resnet import ResNetEncoder
    from vivqa_tpu.models.encoders.swin import SwinEncoder
    from vivqa_tpu.models.encoders.vit import ViTEncoder
    if mt == "resnet":
        cfg = config.replace(
            backbone="resnet", resnet_norm="frozen_bn",
            resnet_width=hf.config.embedding_size,
            resnet_stages=tuple(hf.config.depths))
        return ResNetEncoder(cfg), convert_resnet(hf, cfg)
    if mt == "swin":
        cfg = config.replace(
            backbone="swin", swin_embed_dim=hf.config.embed_dim,
            swin_depths=tuple(hf.config.depths),
            swin_heads=tuple(hf.config.num_heads),
            swin_window=hf.config.window_size,
            activation="gelu", ln_eps=hf.config.layer_norm_eps)
        return SwinEncoder(cfg), convert_swin(hf, cfg)
    if mt == "dinov2":
        cfg = config.replace(
            backbone="dino", vit_style="vit", activation="gelu",
            hidden_dim=hf.config.hidden_size,
            num_layers=hf.config.num_hidden_layers,
            num_heads=hf.config.num_attention_heads,
            patch_size=hf.config.patch_size,
            mlp_ratio=hf.config.mlp_ratio,
            layer_scale_init=hf.config.layerscale_value)
        return ViTEncoder(cfg), convert_dinov2(hf, cfg)
    if mt == "clip_vision_model" or mt == "clip":
        vc = hf.config.vision_config if mt == "clip" else hf.config
        cfg = config.replace(backbone="clip", vit_style="clip",
                             activation="quick_gelu",
                             image_size=vc.image_size,
                             patch_size=vc.patch_size,
                             hidden_dim=vc.hidden_size,
                             num_layers=vc.num_hidden_layers,
                             num_heads=vc.num_attention_heads,
                             mlp_ratio=(vc.intermediate_size
                                        / vc.hidden_size))
        return ViTEncoder(cfg), convert_clip_vision(hf, cfg)
    if mt == "vit":
        cfg = config.replace(backbone="vit", vit_style="vit",
                             activation="gelu",
                             image_size=hf.config.image_size,
                             patch_size=hf.config.patch_size,
                             hidden_dim=hf.config.hidden_size,
                             num_layers=hf.config.num_hidden_layers,
                             num_heads=hf.config.num_attention_heads,
                             mlp_ratio=(hf.config.intermediate_size
                                        / hf.config.hidden_size))
        return ViTEncoder(cfg), convert_vit(hf, cfg)
    raise ValueError(f"no converter for model_type '{mt}'")


def graft_pretrained(params: Dict, tower: str, converted: Dict,
                     log=None) -> Dict:
    """Replace ``params[tower]`` with converted pretrained weights.

    Strict: the converted tree must have exactly the structure and leaf
    shapes of the initialized tower — a mismatch means the model config
    does not describe the pretrained architecture, and silently training
    from a half-grafted tower would be worse than failing. Returns a NEW
    top-level dict (subtrees shared). This is the pipeline-side half of
    the reference's pretrained-backbone initialization
    (src/core/model_pipeline.py:303-352, vqa_model.py:83-98)."""
    import jax
    if tower not in params:
        raise KeyError(f"model has no tower '{tower}' "
                       f"(have: {sorted(params)})")
    init_tree = params[tower]
    want = jax.tree.structure(init_tree)
    got = jax.tree.structure(converted)
    if want != got:
        raise ValueError(
            f"pretrained '{tower}' tree structure mismatch:\n"
            f"  initialized: {want}\n  converted:   {got}")
    for path, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(init_tree),
            zip(jax.tree.leaves(init_tree), jax.tree.leaves(converted))):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"pretrained '{tower}' leaf "
                f"{jax.tree_util.keystr(path[0])}: initialized shape "
                f"{np.shape(a)} != converted {np.shape(b)}")
    out = dict(params)
    out[tower] = converted
    if log is not None:
        n = sum(int(np.size(x)) for x in jax.tree.leaves(converted))
        log.success(f"grafted pretrained weights into '{tower}' "
                    f"({n:,} params)")
    return out


def convert_deberta(hf_model, config) -> Dict:
    """HF DebertaV2Model -> DeBERTaEncoder params (disentangled
    attention; reference wraps this model at
    text_representation.py:350-473). Requires the deberta-v3 layout:
    share_att_key=True (shared q/k projections for the positional terms)
    and position_biased_input=False (relative positions only)."""
    assert getattr(hf_model.config, "share_att_key", False), \
        "convert_deberta supports the v3 layout (share_att_key=True)"
    assert not getattr(hf_model.config, "position_biased_input", True), \
        "convert_deberta expects position_biased_input=False"
    emb = hf_model.embeddings
    enc = hf_model.encoder
    params: Dict = {
        "token_embed": {"embedding": _t(emb.word_embeddings.weight)},
        "ln_embed": _ln(emb.LayerNorm),
        "rel_embeddings": _t(enc.rel_embeddings.weight),
    }
    if config.norm_rel_ebd:
        params["ln_rel"] = _ln(enc.LayerNorm)
    for i, layer in enumerate(hf_model.encoder.layer):
        att = layer.attention
        params[f"layers_{i}"] = {
            "self_attn": {
                "query_proj": _linear(att.self.query_proj.weight,
                                      att.self.query_proj.bias),
                "key_proj": _linear(att.self.key_proj.weight,
                                    att.self.key_proj.bias),
                "value_proj": _linear(att.self.value_proj.weight,
                                      att.self.value_proj.bias),
                "out_proj": _linear(att.output.dense.weight,
                                    att.output.dense.bias),
            },
            "ln1": _ln(att.output.LayerNorm),
            "wi": _linear(layer.intermediate.dense.weight,
                          layer.intermediate.dense.bias),
            "wo": _linear(layer.output.dense.weight,
                          layer.output.dense.bias),
            "ln2": _ln(layer.output.LayerNorm),
        }
    return params
