"""Probe: is early_exit=True output-identical to the fixed-length decode
on a FITTED checkpoint (where EOS actually fires)?

bench_serving.py's fitted run showed mean first-EOS position differing
between the two paths (greedy 18.31 fixed vs 5.0 early; beam 0.0 vs
5.0) — this isolates whether that is (a) run-to-run nondeterminism of
one executable, (b) a scan-vs-while lowering difference flipping
near-tie argmaxes, or (c) a real logic bug.

Run on TPU:  python tools/probe_decode_identity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print("[probe] importing jax (silent stall = tunnel hang; retry)...",
      flush=True)
import jax

if os.environ.get("PROBE_CPU"):
    # env var alone is ignored by the axon plugin — pin the config knob
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.data import ensure_synthetic_vivqa
from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
from vivqa_tpu.pipelines import DataPipeline, DataPipelineConfig
from vivqa_tpu.pipelines.vivqa_evaluation import load_model_from_checkpoint

CKPT = os.environ.get("BENCH_SERVE_CKPT", "runs_local/gen_ckpt_flagship")
CORPUS = os.environ.get("GEN_CORPUS_DIR", "runs_local/gen_corpus_flagship")

print(f"[probe] devices: {jax.devices()}", flush=True)
model, params, meta = load_model_from_checkpoint(CKPT)
cfg = model.config
csv, imgs = ensure_synthetic_vivqa(CORPUS, n=1024,
                                   image_size=cfg.visual.image_size,
                                   learnable=True, seq_answers=True)
data = DataPipeline(DataPipelineConfig(
    csv_path=str(csv), image_dir=str(imgs),
    image_size=cfg.visual.image_size,
    max_question_length=cfg.text.max_length,
    max_answer_length=cfg.max_answer_length,
    batch_size=16, augmentation_strength="light", generative=True)).run()
batch = next(iter(data.val_loader))
px = jnp.asarray(batch["pixel_values"])[:16]
q = jnp.asarray(batch["question_ids"])[:16]
qm = jnp.asarray(batch["question_mask"])[:16]


def first_eos(row):
    w = np.where(row == cfg.eos_token_id)[0]
    return int(w[0]) if len(w) else len(row)


RUNS = int(os.environ.get("PROBE_RUNS", 3))
for strategy in os.environ.get("PROBE_STRATEGIES", "greedy,beam").split(","):
    seqs = {}
    modes = {"fixed": False, "early": True}
    sel = os.environ.get("PROBE_MODES", "fixed,early").split(",")
    for early in [modes[m] for m in sel]:
        gen = jax.jit(build_generate_fn(model, DecodeConfig(
            max_length=cfg.max_answer_length, strategy=strategy,
            num_beams=4, bos_token_id=cfg.bos_token_id,
            eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
            early_exit=early)))
        runs = []
        for r in range(RUNS):
            s, sc = gen(params, px, q, qm)
            runs.append((np.asarray(s), np.asarray(sc)))
        det = all(np.array_equal(runs[0][0], r[0]) for r in runs[1:])
        key = f"{strategy}_{'early' if early else 'fixed'}"
        seqs[key] = runs[-1][0]
        lens = [first_eos(r) for r in runs[-1][0]]
        print(f"[probe] {key}: deterministic_across_{RUNS}_runs={det} "
              f"first_eos={lens}", flush=True)
        print(f"[probe]   row0: {runs[-1][0][0][:12].tolist()} "
              f"score0={runs[-1][1][0]:.4f}", flush=True)
    if f"{strategy}_fixed" not in seqs or f"{strategy}_early" not in seqs:
        continue
    a = seqs[f"{strategy}_fixed"]
    b = seqs[f"{strategy}_early"]
    eq = np.array_equal(a, b)
    # prefix agreement up to each row's min(first_eos)+1
    pref = []
    for ra, rb in zip(a, b):
        n = min(first_eos(ra), first_eos(rb)) + 1
        pref.append(bool(np.array_equal(ra[:n], rb[:n])))
    print(f"[probe] {strategy}: fixed==early {eq}; per-row prefix "
          f"agreement {sum(pref)}/{len(pref)}", flush=True)
    if not eq:
        for i in range(3):
            print(f"[probe]   row{i} fixed: {a[i][:14].tolist()}")
            print(f"[probe]   row{i} early: {b[i][:14].tolist()}")
print("[probe] done", flush=True)
