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


def _bench_one(gen, params, px, q, windows, N, lat_calls, rtt, B,
               qmask=None):
    """bench.py-standard measurement of one compiled generate fn:
    pipelined throughput (median of windows, RTT subtracted) + per-call
    latency percentiles."""
    args = (params, px, q) if qmask is None else (params, px, q, qmask)
    seqs, _ = gen(*args)                        # compile
    int(np.asarray(seqs).sum())                 # host barrier
    win = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(N):
            seqs, _ = gen(*args)
        int(np.asarray(seqs).sum())             # one barrier/window
        win.append(time.perf_counter() - t0)
    win.sort()
    per_batch = max(win[len(win) // 2] - rtt, 1e-9) / N
    spread = (win[-1] - win[0]) / win[len(win) // 2]
    lats = []
    for _ in range(lat_calls):
        t0 = time.perf_counter()
        seqs, _ = gen(*args)
        int(np.asarray(seqs).sum())             # barrier EVERY call
        lats.append(time.perf_counter() - t0)
    p50, p95 = _percentile(lats, 50), _percentile(lats, 95)
    return {
        "answers_per_sec": round(B / per_batch, 2),
        "device_ms_per_batch": round(per_batch * 1000, 2),
        "window_spread_pct": round(spread * 100, 1),
        "latency_ms_p50": round(p50 * 1000, 2),
        "latency_ms_p95": round(p95 * 1000, 2),
        # RTT is a noisy one-shot sample: clamp so a slow RTT draw can't
        # report negative device latency
        "device_latency_ms_p50": round(max(p50 - rtt, 0.0) * 1000, 2),
        "device_latency_ms_p95": round(max(p95 - rtt, 0.0) * 1000, 2),
    }, seqs


def bench_fitted(ckpt_dir: str):
    """Early-exit decode measured in WALL-CLOCK on a FITTED model
    (round-3 verdict weak #4): restores the bench_convergence_gen
    checkpoint, rebuilds its val split (real EOS at realistic 1-5-token
    answers), and benches the production-default early_exit=True decode
    against the fixed-length early_exit=False decode on the SAME batch.
    The decodes are output-identical (tests/test_decoding.py); this
    records what the identity costs/saves in time."""
    import tempfile

    from vivqa_tpu.data import ensure_synthetic_vivqa
    from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
    from vivqa_tpu.pipelines import DataPipeline, DataPipelineConfig
    from vivqa_tpu.pipelines.vivqa_evaluation import \
        load_model_from_checkpoint
    from vivqa_tpu.utils.profiling import measure_rtt

    _note(f"fitted mode: restoring {ckpt_dir}")
    # load_model_from_checkpoint device_puts the restored params (Orbax
    # restores to HOST numpy; without placement every benchmark call
    # would re-upload the whole param tree through the tunnel).
    model, params, meta = load_model_from_checkpoint(ckpt_dir)
    cfg = model.config
    n = int(os.environ.get("GEN_SAMPLES", 2048))
    batches = [int(b) for b in
               os.environ.get("BENCH_SERVE_BATCHES", "16,64").split(",")]
    strategies = os.environ.get("BENCH_SERVE_STRATEGIES",
                                "greedy,beam").split(",")
    windows = max(3, int(os.environ.get("BENCH_SERVE_WINDOWS", 3)))
    N = int(os.environ.get("BENCH_SERVE_WINDOW_ITERS", 20))
    lat_calls = int(os.environ.get("BENCH_SERVE_LAT_CALLS", 15))

    img_size = cfg.visual.image_size
    with tempfile.TemporaryDirectory() as d:
        # the bench_convergence_gen corpus, bit-identical (same seed);
        # GEN_CORPUS_DIR reuses a pre-rendered cache (224^2 rendering
        # costs minutes on a 1-core host). ensure_ verifies the cache's
        # manifest (n/image_size/seed/flags) and raises on mismatch.
        corpus_dir = os.environ.get("GEN_CORPUS_DIR") or d
        csv, imgs = ensure_synthetic_vivqa(corpus_dir, n=n,
                                           image_size=img_size,
                                           learnable=True,
                                           seq_answers=True)
        data = DataPipeline(DataPipelineConfig(
            csv_path=str(csv), image_dir=str(imgs), image_size=img_size,
            max_question_length=cfg.text.max_length,
            max_answer_length=cfg.max_answer_length,
            batch_size=max(batches), augmentation_strength="light",
            generative=True)).run()
        batch = next(iter(data.val_loader))
    px_all = jnp.asarray(batch["pixel_values"])
    q_all = jnp.asarray(batch["question_ids"])
    qmask_all = jnp.asarray(batch["question_mask"])

    _note("measuring tunnel RTT floor...")
    rtt = measure_rtt()
    _note(f"RTT floor {rtt * 1e3:.1f} ms")

    # BENCH_SERVE_MODES chunks fixed/early into separate runs when the
    # tunnel is in a slow-compile period (results print per run; the
    # speedup line needs both in ONE run)
    mode_sel = os.environ.get("BENCH_SERVE_MODES", "fixed32,early")
    modes = [m == "early" for m in mode_sel.split(",")]
    results = {}
    for B in batches:
        px, q, qm = px_all[:B], q_all[:B], qmask_all[:B]
        for strategy in strategies:
            beams = 4 if strategy == "beam" else 1
            for early_exit in modes:
                key = f"{strategy}_b{B}_" + ("early" if early_exit
                                             else "fixed32")
                _note(f"{key}: compiling...")
                gen = jax.jit(build_generate_fn(model, DecodeConfig(
                    max_length=cfg.max_answer_length, strategy=strategy,
                    num_beams=beams, bos_token_id=cfg.bos_token_id,
                    eos_token_id=cfg.eos_token_id,
                    pad_token_id=cfg.pad_token_id,
                    early_exit=early_exit)))
                results[key], seqs = _bench_one(
                    gen, params, px, q, windows, N, lat_calls, rtt, B,
                    qmask=qm)
                seqs = np.asarray(seqs)
                # decoded answer lengths (tokens before first EOS),
                # substantiating the "real answers are short" premise
                lens = []
                for row in seqs:
                    eos = np.where(row == cfg.eos_token_id)[0]
                    lens.append(int(eos[0]) if len(eos) else len(row))
                results[key]["mean_answer_tokens"] = round(
                    float(np.mean(lens)), 2)
                _note(f"{key}: {results[key]}")
            fixed = results.get(f"{strategy}_b{B}_fixed32")
            early = results.get(f"{strategy}_b{B}_early")
            if fixed and early:
                early["speedup_vs_fixed"] = round(
                    fixed["device_ms_per_batch"]
                    / early["device_ms_per_batch"], 2)

    head_key = next((k for k in ("beam_b16_early", "greedy_b16_early")
                     if k in results), next(iter(results)))
    head = results[head_key]
    print(json.dumps({
        "metric": "generative_serving_fitted_early_exit",
        "value": head["answers_per_sec"],
        "unit": "answers/sec (%s, fitted ckpt, early_exit=True, "
                "max %d tokens)" % (head_key, cfg.max_answer_length),
        "vs_baseline": head.get("speedup_vs_fixed", 1.0),
        "rtt_ms": round(rtt * 1e3, 2),
        "model": {"decoder_layers": cfg.decoder_layers,
                  "decoder_dim": cfg.decoder_dim,
                  "fusion_dim": cfg.fusion_dim,
                  "visual_layers": cfg.visual.num_layers},
        "detail": results,
    }))


def main():
    from vivqa_tpu.models.config import (GenerativeVQAConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig)
    from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
    from vivqa_tpu.models.generative import GenerativeVQAModel
    from vivqa_tpu.utils.profiling import measure_rtt

    ckpt = os.environ.get("BENCH_SERVE_CKPT", "")
    if ckpt:
        return bench_fitted(ckpt)

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
            _note(f"{key}: {windows} windows x {N} iters + "
                  f"{lat_calls} latency samples...")
            results[key], _ = _bench_one(gen, params, px, q, windows, N,
                                         lat_calls, rtt, B)
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
