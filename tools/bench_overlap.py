"""Input-pipeline / train-step OVERLAP measurement (round-4 verdict #4).

The headline 1,160 QA-pairs/s/chip is a device-only number measured on a
pre-staged batch (bench.py:75-83); the host-loader margin was a linear
extrapolation. This closes the last unmeasured link: it runs the REAL
chain — C++ fastloader decode+augment -> BatchLoader -> device_prefetch
double-buffering -> jitted flagship train step — and reports sustained
end-to-end steps/s against the loader-only and device-only rates.

Pass = end-to-end ~= min(loader, device) (no serialization). On this
1-core dev host the loader is the bottleneck by design, so the check is
end-to-end ~= loader rate with the device hidden under it.

Corpus: reuses runs_local/gen_corpus_flagship's 1,024 224x224 JPEGs
(manifest-validated); the CSV's generative answers double as
classification labels — label semantics don't affect throughput.

Run on TPU:  python tools/bench_overlap.py   (env: OVL_BATCH, OVL_STEPS)
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print("[overlap] importing jax (silent stall = tunnel hang; retry)...",
      flush=True)
import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.data import (BatchLoader, ImageAugmentation,
                            WhitespaceTokenizer, build_answer_vocab,
                            device_prefetch, ensure_synthetic_vivqa,
                            load_raw_data, vqa_collate)
from vivqa_tpu.data.dataset import VQADataset
from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                     TextEncoderConfig, VisualEncoderConfig,
                                     VQAModelConfig)
from vivqa_tpu.models.vqa_model import VietnameseVQAModel
from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig, TrainState,
                             create_optimizer, cross_entropy_loss,
                             make_train_step)
from vivqa_tpu.utils.profiling import time_train_steps
from vivqa_tpu.utils.seeding import enable_fast_prng

B = int(os.environ.get("OVL_BATCH", 128))
N_STEPS = int(os.environ.get("OVL_STEPS", 16))
CORPUS = os.environ.get("GEN_CORPUS_DIR", "runs_local/gen_corpus_flagship")

enable_fast_prng()
print(f"[overlap] devices: {jax.devices()}", flush=True)

csv, imgs = ensure_synthetic_vivqa(CORPUS, n=1024, image_size=224,
                                   learnable=True, seq_answers=True)
samples = load_raw_data(csv, imgs)
tok = WhitespaceTokenizer(max_length=64)
tok.build_vocab([s.question for s in samples])
answer2id, _ = build_answer_vocab(samples)
ds = VQADataset(samples, tok, answer2id,
                ImageAugmentation(224, mode="train"),
                max_question_length=64)
assert ds.load_batch([0, 1]) is not None, \
    "native fastloader unavailable — run bash native/build.sh first"

# --- 1. loader-only rate (C++ decode+augment+collate, no device) -----
loader = BatchLoader(ds, batch_size=B, collate=vqa_collate, shuffle=True)
n_batches = len(loader)
it = iter(loader)
next(it)                                    # warm (first-touch caches)
t0 = time.perf_counter()
n_loader = 0
for _ in it:
    n_loader += 1
loader_s_per_batch = (time.perf_counter() - t0) / n_loader
print(f"[overlap] loader-only: {loader_s_per_batch * 1e3:.0f} ms/batch "
      f"({B / loader_s_per_batch:.1f} img/s)", flush=True)

# --- 2. device-only rate (bench.py instrument, same model/step) ------
cfg = VQAModelConfig(
    visual=VisualEncoderConfig(backbone="clip", image_size=224,
                               patch_size=32, hidden_dim=768,
                               num_layers=12, num_heads=12),
    text=TextEncoderConfig(backbone="phobert", vocab_size=64001,
                           hidden_dim=768, num_layers=12, num_heads=12,
                           max_length=64),
    fusion=FusionConfig(fusion_type="mcan", hidden_dim=512, num_heads=8,
                        num_layers=4),
    moe=MoEModelConfig(use_moe=True, num_experts=4, top_k=2,
                       expert_hidden_dim=1024),
    num_answers=1000)
model = VietnameseVQAModel(cfg)
rng = jax.random.PRNGKey(0)
dev_batch = {
    "pixel_values": jnp.asarray(
        np.random.RandomState(0).rand(B, 224, 224, 3), jnp.float32),
    "input_ids": jnp.asarray(
        np.random.RandomState(1).randint(0, 64000, (B, 64)), jnp.int32),
    "attention_mask": jnp.ones((B, 64), jnp.int32),
    "labels": jnp.asarray(
        np.random.RandomState(2).randint(0, 1000, (B,)), jnp.int32),
}
print("[overlap] initializing params...", flush=True)
params = model.init({"params": rng, "router": rng},
                    dev_batch["pixel_values"][:2],
                    dev_batch["input_ids"][:2])["params"]
tx = create_optimizer(OptimizerConfig(learning_rate=1e-4),
                      SchedulerConfig(name="warmup_cosine", warmup_steps=100,
                                      total_steps=10000), params=params)
state = TrainState.create(model.apply, params, tx, rng)


def loss_fn(params, batch, rng, apply_fn):
    out = apply_fn({"params": params}, batch["pixel_values"],
                   batch["input_ids"], batch["attention_mask"],
                   deterministic=False, rngs={"dropout": rng, "router": rng})
    return cross_entropy_loss(out["logits"], batch["labels"]) \
        + 0.01 * out["aux_loss"], {}


print("[overlap] compiling + timing device-only step...", flush=True)
dev_s_per_step = time_train_steps(make_train_step(loss_fn), state, dev_batch,
                                  steps=10)
print(f"[overlap] device-only: {dev_s_per_step * 1e3:.1f} ms/step "
      f"({B / dev_s_per_step:.1f} QA-pairs/s)", flush=True)

# --- 2b. cross-check the chained-fori timing instrument ---------------
# The fori_loop DECODE body was caught miscompiling on this runtime
# (models/decoding.py note); the fori-chained timing instrument is
# numerics-blind, so independently time N naive async dispatches
# (donated chain, one final barrier). Enqueue overhead (~ms/call) is
# negligible against a 110 ms step; agreement within ~10% certifies the
# instrument.
step_fn = jax.jit(make_train_step(loss_fn), donate_argnums=(0,))
# each state gets its OWN param/opt buffers: TrainState.create does not
# copy, and the donated step deletes whatever its state aliases
state_x = TrainState.create(model.apply,
                            jax.tree.map(jnp.copy, params), tx, rng)
state_x, m = step_fn(state_x, dev_batch)
jax.block_until_ready(m["loss"])            # compile + settle
t0 = time.perf_counter()
for _ in range(10):
    state_x, m = step_fn(state_x, dev_batch)
float(m["loss"])
naive_s_per_step = (time.perf_counter() - t0) / 10
print(f"[overlap] device-only (naive dispatch x10): "
      f"{naive_s_per_step * 1e3:.1f} ms/step — fori instrument "
      f"agreement {dev_s_per_step / naive_s_per_step * 100:.0f}%",
      flush=True)
del state_x

# --- 3. end-to-end: prefetch-fed sustained steps ----------------------
DEV_KEYS = ("pixel_values", "input_ids", "attention_mask", "labels")


def epochs():
    for _ in itertools.count():
        for b in BatchLoader(ds, batch_size=B, collate=vqa_collate,
                             shuffle=True):
            yield {k: b[k] for k in DEV_KEYS}


feed = device_prefetch(epochs(), sharding=jax.devices()[0], buffer_size=2)
# warm: one step to compile against prefetch-placed buffers
state2 = TrainState.create(model.apply,
                           jax.tree.map(jnp.copy, params), tx, rng)
state2, metrics = step_fn(state2, next(feed))
jax.block_until_ready(metrics["loss"])
t0 = time.perf_counter()
for _ in range(N_STEPS):
    state2, metrics = step_fn(state2, next(feed))
float(metrics["loss"])                      # host barrier on the chain
e2e_s_per_step = (time.perf_counter() - t0) / N_STEPS
print(f"[overlap] end-to-end: {e2e_s_per_step * 1e3:.0f} ms/step "
      f"({B / e2e_s_per_step:.1f} QA-pairs/s sustained)", flush=True)

bottleneck = max(loader_s_per_batch, dev_s_per_step)
overlap_eff = bottleneck / e2e_s_per_step
serial = loader_s_per_batch + dev_s_per_step
print(json.dumps({
    "metric": "input_pipeline_overlap_efficiency",
    "value": round(overlap_eff * 100, 1),
    "unit": "% (bottleneck rate / sustained end-to-end rate)",
    "loader_ms_per_batch": round(loader_s_per_batch * 1e3, 1),
    "device_ms_per_step": round(dev_s_per_step * 1e3, 1),
    "end_to_end_ms_per_step": round(e2e_s_per_step * 1e3, 1),
    "serialized_would_be_ms": round(serial * 1e3, 1),
    "device_ms_naive_dispatch": round(naive_s_per_step * 1e3, 1),
    "batch": B, "steps": N_STEPS,
    "passed": bool(overlap_eff >= 0.9),
}))
