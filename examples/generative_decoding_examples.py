"""Generative decoding demo (reference: examples/vivqa_examples.py):
KV-cached greedy / top-k / top-p / beam over a random-init model."""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.models.config import (GenerativeVQAConfig, TextEncoderConfig,
                                     VisualEncoderConfig)
from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
from vivqa_tpu.models.generative import GenerativeVQAModel


def main():
    cfg = GenerativeVQAConfig(
        visual=VisualEncoderConfig(image_size=32, patch_size=8,
                                   hidden_dim=32, num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=50, hidden_dim=32, num_layers=1,
                               num_heads=2, max_length=8),
        fusion_dim=32, fusion_layers=1, fusion_heads=2, vocab_size=50,
        decoder_layers=2, decoder_heads=2, decoder_dim=32,
        decoder_ff_dim=64, max_answer_length=8, dropout=0.0,
        bos_token_id=0, eos_token_id=49, pad_token_id=1)
    model = GenerativeVQAModel(cfg)
    px = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    q = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), px, q,
                        jnp.zeros((2, 8), jnp.int32))["params"]

    for strategy in ("greedy", "top_k", "top_p", "beam"):
        dc = DecodeConfig(max_length=8, strategy=strategy, num_beams=3,
                          bos_token_id=0, eos_token_id=49, pad_token_id=1)
        gen = jax.jit(build_generate_fn(model, dc))
        seqs, scores = gen(params, px, q, rng=jax.random.PRNGKey(7))
        print(f"{strategy:>7}: seqs={np.asarray(seqs)[0].tolist()} "
              f"score={float(scores[0]):.2f}")


if __name__ == "__main__":
    main()
