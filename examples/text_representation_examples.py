"""Text representation demo (reference:
examples/text_representation_examples.py): the BERT-family factory,
pooling modes, and whitespace tokenization feeding the encoder."""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import jax
import jax.numpy as jnp

from vivqa_tpu.data import WhitespaceTokenizer
from vivqa_tpu.models.config import TextEncoderConfig
from vivqa_tpu.models.encoders.representation import create_text_embedding


def main():
    tok = WhitespaceTokenizer(max_length=12)
    corpus = ["con mèo đen đang ngủ", "hai con chó chạy ngoài công viên",
              "quả táo màu đỏ"]
    tok.build_vocab(corpus)
    enc = tok.encode_batch(corpus)
    rng = jax.random.PRNGKey(0)

    for kind in ("phobert", "bert", "roberta", "generic"):
        for pooling in ("cls", "mean", "max"):
            cfg = TextEncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                                    num_layers=1, num_heads=2, max_length=12,
                                    pooling=pooling)
            m = create_text_embedding(kind, cfg)
            out = m.apply(m.init(rng, jnp.asarray(enc["input_ids"])),
                          jnp.asarray(enc["input_ids"]),
                          jnp.asarray(enc["attention_mask"]))
            if pooling == "cls":
                print(f"{kind:>8}/{pooling}: pooled="
                      f"{tuple(out['pooled'].shape)} "
                      f"tokens={tuple(out['tokens'].shape)}")


if __name__ == "__main__":
    main()
