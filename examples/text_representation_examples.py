"""Text representation tutorial (reference:
examples/text_representation_examples.py).

The text side of the framework: the shared BERT-family encoder and its
config-driven variants, the real DeBERTa(-v2/v3) encoder with
disentangled attention, pooling strategies, both tokenizers, and the
pretrained-weight conversion workflow.

Reference surface: src/modeling/heads/text_representation.py (BERT :98,
RoBERTa :228, DeBERTaV3 :350, Generic :473, factory :625) and
src/modeling/tokenizer/.

Sections
  1. Design: one transformer, many family members
  2. The factory and the family matrix
  3. Pooling strategies (cls / mean / max) and masking
  4. DeBERTa: disentangled attention for real
  5. Tokenizers: from-scratch whitespace and HF pretrained
  6. Pre-LN vs post-LN and HF weight parity
  7. Pretrained weights: the converter workflow (offline demo)
  8. Vietnamese specifics

Run (any platform; shapes are tiny):
    python examples/text_representation_examples.py
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.data import WhitespaceTokenizer
from vivqa_tpu.models.config import TextEncoderConfig
from vivqa_tpu.models.encoders.representation import (TEXT_EMBEDDING_KINDS,
                                                      create_text_embedding)

CORPUS = ["con mèo đen đang ngủ trên ghế",
          "hai con chó chạy ngoài công viên",
          "quả táo màu đỏ nằm trên bàn",
          "người đàn ông đội mũ màu xanh"]


def banner(title):
    print(f"\n{'=' * 64}\n{title}\n{'=' * 64}")


def params_of(variables):
    return sum(p.size for p in jax.tree.leaves(variables))


def section_design():
    banner("1. Design: one transformer, many family members")
    print("""The reference wraps four separate HF model classes (BERT, RoBERTa,
DeBERTaV3, generic AutoModel). Architecturally, BERT / RoBERTa /
PhoBERT differ only in data-level details — vocabulary, token-type
embeddings, tokenization — so here they SHARE one flax module
(vivqa_tpu/models/encoders/text.py) and the deltas live in the
config (type_vocab_size, norm_style, vocab_size). DeBERTa is the
exception: its disentangled attention is a genuinely different
computation and gets its own module (section 4).

Benefits of config-over-classes on TPU: one jit cache entry per
shape (not per class), one converter code path, one set of
partition rules for all family members.""")


def section_factory(rng, ids, mask):
    banner("2. The factory and the family matrix")
    print(f"kinds: {TEXT_EMBEDDING_KINDS}\n")
    for kind in TEXT_EMBEDDING_KINDS:
        cfg = TextEncoderConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                                num_heads=2, max_length=12)
        m = create_text_embedding(kind, cfg)
        variables = m.init(rng, ids)
        out = m.apply(variables, ids, mask)
        note = {"bert": "type_vocab_size=2 (segment A/B embeddings)",
                "roberta": "type_vocab_size=1 (no NSP -> no segments)",
                "phobert": "RoBERTa layout + Vietnamese 64k vocab",
                "deberta": "disentangled-attention module (own params)",
                "generic": "fallback for unknown model names "
                           "(reference :660-663)"}[kind]
        print(f"  {kind:>8}: pooled={tuple(out['pooled'].shape)} "
              f"tokens={tuple(out['tokens'].shape)} "
              f"params={params_of(variables):,}   {note}")


def section_pooling(rng, ids, mask):
    banner("3. Pooling strategies and masking")
    print("""How (B, L, D) token states become the (B, D) sentence vector:
  cls   take position 0 (the [CLS]/<s> token) — BERT's pretraining
        objective concentrates sentence meaning there
  mean  masked average over REAL tokens (padding excluded)
  max   masked element-wise max over real tokens

Padding must not leak: verify by re-encoding with extra padding and
checking the pooled vector is unchanged:
""")
    longer = jnp.pad(ids, ((0, 0), (0, 4)))          # 4 extra pad tokens
    longer_mask = jnp.pad(mask, ((0, 0), (0, 4)))
    for pooling in ("cls", "mean", "max"):
        cfg = TextEncoderConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                                num_heads=2, max_length=16, pooling=pooling,
                                dropout=0.0)
        m = create_text_embedding("phobert", cfg)
        variables = m.init(rng, longer)
        a = m.apply(variables, jnp.pad(ids, ((0, 0), (0, 4))),
                    jnp.pad(mask, ((0, 0), (0, 4))))["pooled"]
        b = m.apply(variables, longer, longer_mask)["pooled"]
        delta = float(jnp.abs(a - b).max())
        print(f"  {pooling:>4}: |pooled(padded) - pooled(padded)| = {delta:.1e}"
              "   (identical inputs sanity)")
    print("  (tests/test_models.py asserts the real padding-invariance\n"
          "   property: different pad content, identical pooled output.)")


def section_deberta(rng, ids, mask):
    banner("4. DeBERTa: disentangled attention for real")
    print("""Round 1 aliased "deberta" to the vanilla encoder; now it is the
real DebertaV2 computation (vivqa_tpu/models/encoders/deberta.py,
reference text_representation.py:350-473 wraps HF's):

  * content and position are DISENTANGLED: attention =
    content-to-content + content-to-position (c2p) + p2c terms
  * relative positions are log-bucketed (position_buckets=256 covers
    max_relative_positions=512) — exact HF make_log_bucket_position
  * the shared rel-embedding table is LayerNormed (norm_rel_ebd)

A converter (convert_deberta) imports microsoft/deberta-v3 weights;
parity is tested against the torch module in tests/test_convert.py.
""")
    from vivqa_tpu.models.encoders.deberta import (DeBERTaConfig,
                                                   DeBERTaEncoder,
                                                   make_log_bucket_position)
    rel = np.arange(-8, 9)
    buckets = make_log_bucket_position(rel, bucket_size=4, max_position=16)
    print("  log-bucketing of relative positions -8..8 (bucket_size=4):")
    print(f"    rel    : {rel.tolist()}")
    print(f"    bucket : {buckets.astype(int).tolist()}")
    cfg = DeBERTaConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                        num_heads=2, max_length=12, position_buckets=4,
                        max_relative_positions=16)
    enc = DeBERTaEncoder(cfg)
    variables = enc.init(rng, ids)
    out = enc.apply(variables, ids, mask)
    print(f"\n  DeBERTaEncoder: pooled={tuple(out['pooled'].shape)} "
          f"params={params_of(variables):,}")
    print("  (near positions get exact buckets, far positions share\n"
          "   log-spaced ones — long-range structure at small table size)")


def section_tokenizers():
    banner("5. Tokenizers")
    print("""Two implementations behind one encode_batch() contract
(reference src/modeling/tokenizer/):

  WhitespaceTokenizer   from-scratch: build_vocab(corpus, min_freq),
                        <unk>=1, <pad>=0, JSON save/load — for
                        offline/synthetic runs and tests.
  PretrainedTokenizer   wraps HF AutoTokenizer (PhoBERT, BARTpho...);
                        fixed max_length padding for static shapes.
""")
    tok = WhitespaceTokenizer(max_length=10)
    tok.build_vocab(CORPUS)
    enc = tok.encode_batch(CORPUS[:2])
    print(f"  vocab_size={tok.vocab_size}")
    print(f"  '{CORPUS[0]}'")
    print(f"    -> ids  {enc['input_ids'][0].tolist()}")
    print(f"    -> mask {enc['attention_mask'][0].tolist()}")
    print("\n  Fixed max_length padding is not an accident: every batch has\n"
          "  the same shape, so the jitted train step compiles ONCE.")


def section_norm_style():
    banner("6. Pre-LN vs post-LN and HF parity")
    print("""norm_style="pre"  (default): LayerNorm before attention/FFN —
                  the modern layout, more stable to train from scratch.
norm_style="post" : the original BERT/PhoBERT/RoBERTa layout —
                  REQUIRED when importing HF weights, or activations
                  diverge despite identical parameters.

The converter sets norm_style="post" automatically. Parity with HF
is bounded by LayerNorm-eps differences (flax 1e-6 vs HF 1e-12):
~1e-3 at real scale, up to ~1e-2 on tiny random-init demo models
(tests/test_convert.py documents this).""")


def section_converter(rng):
    banner("7. Pretrained weights — the converter workflow")
    print("""    from vivqa_tpu.models.convert import load_pretrained_text_encoder
    params, cfg = load_pretrained_text_encoder("vinai/phobert-base")
    enc = create_text_encoder(cfg)
    out = enc.apply({"params": params}, input_ids, attention_mask)

Offline demo — converting a RANDOM-INIT torch BERT (no download):""")
    try:
        import torch
        from transformers import BertConfig, BertModel
        from vivqa_tpu.models.convert import convert_bert
        tcfg = BertConfig(vocab_size=64, hidden_size=32,
                          num_hidden_layers=1, num_attention_heads=2,
                          intermediate_size=128,    # = hidden * mlp_ratio(4)
                          max_position_embeddings=16)
        tmodel = BertModel(tcfg).eval()
        cfg = TextEncoderConfig(backbone="bert", vocab_size=64, hidden_dim=32,
                                num_layers=1, num_heads=2, max_length=16,
                                type_vocab_size=2, norm_style="post",
                                dropout=0.0, activation="gelu",
                                dtype="float32")   # f32 for numerical parity
        params = convert_bert(tmodel, cfg)
        from vivqa_tpu.models.encoders import create_text_encoder
        enc = create_text_encoder(cfg)
        ids = np.array([[2, 5, 9, 3, 0, 0]], np.int32)
        mask = (ids != 0).astype(np.int32)
        ours = enc.apply({"params": params}, jnp.asarray(ids),
                         jnp.asarray(mask))["tokens"]
        with torch.no_grad():
            theirs = tmodel(torch.tensor(ids.astype(np.int64)),
                            attention_mask=torch.tensor(mask.astype(np.int64))
                            ).last_hidden_state.numpy()
        err = float(np.abs(np.asarray(ours, np.float32) - theirs).max())
        print(f"\n  converted 1-layer BERT: max |jax - torch| = {err:.2e}")
    except Exception as e:
        print(f"\n  (skipped live conversion: {type(e).__name__}: {e})")


def section_vietnamese():
    banner("8. Vietnamese specifics")
    print("""* PhoBERT expects WORD-SEGMENTED input ("Hà_Nội", not "Hà Nội");
  the knowledge subsystem's VietnameseTokenizer wraps underthesea /
  pyvi with a whitespace fallback (vivqa_tpu/knowledge/vietnamese.py).
* Diacritic-aware normalization, stopwords, and a diacritic-density
  language detector live there too — used by BM25 retrieval and the
  question-type classifier in the evaluator.
* BARTpho (seq2seq) is the text side of the generative RAG config;
  see examples/generative_decoding_examples.py.""")


def main():
    rng = jax.random.PRNGKey(0)
    tok = WhitespaceTokenizer(max_length=12)
    tok.build_vocab(CORPUS)
    enc = tok.encode_batch(CORPUS)
    ids = jnp.asarray(enc["input_ids"])
    mask = jnp.asarray(enc["attention_mask"])

    section_design()
    section_factory(rng, ids, mask)
    section_pooling(rng, ids, mask)
    section_deberta(rng, ids, mask)
    section_tokenizers()
    section_norm_style()
    section_converter(rng)
    section_vietnamese()

    banner("Done")
    print("Choose the text tower by config string:\n"
          '  VQAModelConfig(text=TextEncoderConfig(backbone="phobert", ...))')


if __name__ == "__main__":
    main()
