"""Generative serving benchmark: answers/sec + p50/p95 latency with
KV-cached batched beam decode (BASELINE.md target row 2).

Prints one JSON line. Not the driver bench (that's bench.py); run
manually on TPU:  python bench_serving.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vivqa_tpu.models.config import (GenerativeVQAConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig)
    from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
    from vivqa_tpu.models.generative import GenerativeVQAModel

    cfg = GenerativeVQAConfig(
        visual=VisualEncoderConfig(backbone="clip", image_size=224,
                                   patch_size=32, hidden_dim=768,
                                   num_layers=12, num_heads=12),
        text=TextEncoderConfig(backbone="phobert", vocab_size=64001,
                               hidden_dim=768, num_layers=12, num_heads=12,
                               max_length=64),
        fusion_dim=512, fusion_layers=3, fusion_heads=8,
        vocab_size=64001, decoder_layers=6, decoder_heads=8,
        decoder_dim=512, decoder_ff_dim=2048, max_answer_length=32,
        dropout=0.0)
    model = GenerativeVQAModel(cfg)

    import os
    # 16 = latency-representative serving batch; BENCH_SERVE_BATCH=64+
    # measures the throughput-optimal regime (beam decode is launch-
    # latency-bound at small batches — bigger batches amortize the 32
    # sequential steps over more rows)
    B = int(os.environ.get("BENCH_SERVE_BATCH", 16))
    rng = jax.random.PRNGKey(0)
    px = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3),
                     jnp.float32)
    q = jnp.asarray(np.random.RandomState(1).randint(0, 64000, (B, 64)),
                    jnp.int32)
    dec = jnp.zeros((B, 32), jnp.int32)
    params = model.init({"params": rng, "router": rng}, px[:2], q[:2],
                        dec[:2])["params"]

    # Throughput: N back-to-back generates with ONE host sync at the end
    # (float() is the true barrier under the axon tunnel; per-call
    # block_until_ready returns early through the loopback relay, and a
    # per-call host sync would charge one ~25ms tunnel RTT to every
    # request — a measurement artifact, not device latency). Device-side
    # per-batch latency is reported as total/N.
    results = {}
    for strategy, beams in (("greedy", 1), ("beam", 4)):
        gen = jax.jit(build_generate_fn(model, DecodeConfig(
            max_length=32, strategy=strategy, num_beams=beams,
            bos_token_id=0, eos_token_id=2, pad_token_id=1)))
        seqs, _ = gen(params, px, q)            # compile
        int(np.asarray(seqs).sum())             # host barrier
        N = 30
        t0 = time.perf_counter()
        for _ in range(N):
            seqs, _ = gen(params, px, q)
        int(np.asarray(seqs).sum())             # host barrier
        dt = (time.perf_counter() - t0) / N
        results[strategy] = {
            "answers_per_sec": round(B / dt, 2),
            "device_ms_per_batch": round(dt * 1000, 2),
        }

    print(json.dumps({
        "metric": "generative_serving",
        "value": results["beam"]["answers_per_sec"],
        "unit": "answers/sec (batch 16, beam 4, 32 new tokens, pipelined)",
        "vs_baseline": 1.0,
        "detail": results,
    }))


if __name__ == "__main__":
    main()
