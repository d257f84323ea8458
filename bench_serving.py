"""Generative serving benchmark: answers/sec + p50/p95 latency with
KV-cached batched beam decode (BASELINE.md target row 2).

Methodology (bench.py standard — see vivqa_tpu/utils/profiling.py for
why naive timing lies through remote-dispatch tunnels):

- THROUGHPUT: back-to-back pipelined generates, ONE host barrier per
  window, median of BENCH_SERVE_WINDOWS (>=3) windows, RTT floor
  subtracted. This is the number a saturated serving queue sees.
- LATENCY: per-call wall time with a host barrier on EVERY call over
  BENCH_SERVE_LAT_CALLS calls -> true p50/p95 per-batch latency. Each
  call pays one tunnel RTT; the measured RTT floor is reported alongside
  and subtracted for the device-only percentiles.
- REGIMES: batch 16 (latency-representative) and 64 (throughput-
  optimal; beam decode is launch-latency-bound at small batches — the 32
  sequential steps amortize over more rows). Override with
  BENCH_SERVE_BATCHES="16,64"; BENCH_SERVE_STRATEGIES="greedy,beam".

Prints one JSON line. Not the driver bench (that's bench.py); run
manually on TPU:  python bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def _note(msg):
    print(f"[bench_serving] {msg}", file=sys.stderr, flush=True)


_note("starting (pre-device-init)...")

import jax
import jax.numpy as jnp
import numpy as np


def _percentile(xs, q):
    return float(np.percentile(xs, q, method="nearest"))


def main():
    from vivqa_tpu.models.config import (GenerativeVQAConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig)
    from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
    from vivqa_tpu.models.generative import GenerativeVQAModel
    from vivqa_tpu.utils.profiling import measure_rtt

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

    batches = [int(b) for b in
               os.environ.get("BENCH_SERVE_BATCHES", "16,64").split(",")]
    strategies = os.environ.get("BENCH_SERVE_STRATEGIES",
                                "greedy,beam").split(",")
    windows = max(3, int(os.environ.get("BENCH_SERVE_WINDOWS", 3)))
    N = int(os.environ.get("BENCH_SERVE_WINDOW_ITERS", 20))
    lat_calls = int(os.environ.get("BENCH_SERVE_LAT_CALLS", 15))

    _note(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    Bmax = max(batches)
    px_all = jnp.asarray(np.random.RandomState(0).rand(Bmax, 224, 224, 3),
                         jnp.float32)
    q_all = jnp.asarray(np.random.RandomState(1).randint(
        0, 64000, (Bmax, 64)), jnp.int32)
    dec = jnp.zeros((2, 32), jnp.int32)
    _note("initializing params...")
    params = model.init({"params": rng, "router": rng}, px_all[:2],
                        q_all[:2], dec)["params"]
    _note("measuring tunnel RTT floor...")
    rtt = measure_rtt()
    _note(f"RTT floor {rtt * 1e3:.1f} ms")

    results = {}
    for B in batches:
        px, q = px_all[:B], q_all[:B]
        for strategy in strategies:
            beams = 4 if strategy == "beam" else 1
            key = f"{strategy}_b{B}"
            _note(f"{key}: compiling (first TPU compile ~20-40s)...")
            # early_exit=False: untrained weights never emit a real EOS,
            # and the benchmark must do fixed work per call for
            # round-over-round comparability. Production decode defaults
            # to early_exit=True (output-identical, exits when all rows
            # finish — real answers are 1-5 tokens vs max_length 32).
            gen = jax.jit(build_generate_fn(model, DecodeConfig(
                max_length=32, strategy=strategy, num_beams=beams,
                bos_token_id=0, eos_token_id=2, pad_token_id=1,
                early_exit=False)))
            seqs, _ = gen(params, px, q)            # compile
            int(np.asarray(seqs).sum())             # host barrier

            # -- pipelined throughput: median of >=3 windows ------------
            _note(f"{key}: {windows} throughput windows x {N} iters...")
            win = []
            for _ in range(windows):
                t0 = time.perf_counter()
                for _ in range(N):
                    seqs, _ = gen(params, px, q)
                int(np.asarray(seqs).sum())         # one barrier/window
                win.append(time.perf_counter() - t0)
            win.sort()
            per_batch = max(win[len(win) // 2] - rtt, 1e-9) / N
            spread = (win[-1] - win[0]) / win[len(win) // 2]

            # -- per-call latency percentiles ---------------------------
            _note(f"{key}: {lat_calls} per-call latency samples...")
            lats = []
            for _ in range(lat_calls):
                t0 = time.perf_counter()
                seqs, _ = gen(params, px, q)
                int(np.asarray(seqs).sum())         # barrier EVERY call
                lats.append(time.perf_counter() - t0)
            p50, p95 = _percentile(lats, 50), _percentile(lats, 95)

            results[key] = {
                "answers_per_sec": round(B / per_batch, 2),
                "device_ms_per_batch": round(per_batch * 1000, 2),
                "window_spread_pct": round(spread * 100, 1),
                "latency_ms_p50": round(p50 * 1000, 2),
                "latency_ms_p95": round(p95 * 1000, 2),
                # RTT is a noisy one-shot sample: clamp so a slow RTT
                # draw can't report negative device latency
                "device_latency_ms_p50": round(max(p50 - rtt, 0.0) * 1000,
                                               2),
                "device_latency_ms_p95": round(max(p95 - rtt, 0.0) * 1000,
                                               2),
            }
            _note(f"{key}: {results[key]}")

    head_key = "beam_b16" if "beam_b16" in results else next(iter(results))
    head = results[head_key]
    strat, bsz = head_key.rsplit("_b", 1)
    print(json.dumps({
        "metric": "generative_serving",
        "value": head["answers_per_sec"],
        "unit": "answers/sec (batch %s, %s, 32 new tokens, pipelined, "
                "median of %d windows)" % (bsz, strat, windows),
        "vs_baseline": 1.0,
        "rtt_ms": round(rtt * 1e3, 2),
        "detail": results,
    }))


if __name__ == "__main__":
    main()
