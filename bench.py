"""Benchmark harness — prints ONE JSON line.

Metric: classification VQA training throughput, QA-pairs/sec/chip, on the
flagship config (CLIP-ViT-B/32-class + PhoBERT-class + MCAN + MoE) with
synthetic fixed-shape batches, bf16, jitted sharded train step.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded run of THIS framework (stored in
BENCH_BASELINE.json on first execution) — i.e. round 1 sets 1.0 and later
rounds show the trajectory.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FILE = Path(__file__).parent / "BENCH_BASELINE.json"


def main():
    from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig, VQAModelConfig)
    from vivqa_tpu.models.vqa_model import VietnameseVQAModel
    from vivqa_tpu.parallel import MeshConfig, create_mesh
    from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig,
                                 ShardedStep, TrainState, create_optimizer,
                                 cross_entropy_loss, make_train_step,
                                 place_state)

    from vivqa_tpu.utils.seeding import enable_fast_prng
    enable_fast_prng()   # hardware RNG for dropout (threefry costs ~30ms/step)

    _note("querying devices...")
    n_chips = len(jax.devices())
    _note(f"{n_chips} device(s): {jax.devices()[0].platform}")
    mesh = create_mesh(MeshConfig(data_axis=n_chips, model_axis=1))

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

    import os
    # Default batch: measured sweep on the v5e chip (BENCH_BATCH override):
    #   64 -> 799.8 QA/s, 128 -> 832.1 QA/s (+4%), 256 -> compile too slow
    # over the dev tunnel to sweep routinely. 128/chip is the throughput
    # knee; the baseline was recorded at 64 so vs_baseline reflects both
    # the batch knee and the per-step wins honestly (same instrument).
    B = int(os.environ.get("BENCH_BATCH", 128)) * n_chips
    rng = jax.random.PRNGKey(0)
    batch = {
        "pixel_values": jnp.asarray(
            np.random.RandomState(0).rand(B, 224, 224, 3), jnp.float32),
        "input_ids": jnp.asarray(
            np.random.RandomState(1).randint(0, 64000, (B, 64)), jnp.int32),
        "attention_mask": jnp.ones((B, 64), jnp.int32),
        "labels": jnp.asarray(
            np.random.RandomState(2).randint(0, 1000, (B,)), jnp.int32),
    }
    _note("initializing params...")
    params = model.init({"params": rng, "router": rng},
                        batch["pixel_values"][:2], batch["input_ids"][:2])["params"]
    tx = create_optimizer(
        OptimizerConfig(learning_rate=1e-4),
        SchedulerConfig(name="warmup_cosine", warmup_steps=100,
                        total_steps=10000),
        params=params)
    state = TrainState.create(model.apply, params, tx, rng)
    if n_chips > 1 or os.environ.get("BENCH_PLACE"):
        # multi-chip: rule-based placement (DP/TP/EP). On a single chip
        # placement is semantically a no-op but switches XLA into SPMD
        # partitioning mode, which pessimizes several fusions — skip it.
        state = place_state(state, mesh)

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       deterministic=False,
                       rngs={"dropout": rng, "router": rng})
        loss = cross_entropy_loss(out["logits"], batch["labels"])
        return loss + 0.01 * out["aux_loss"], {}

    if n_chips > 1 or os.environ.get("BENCH_PLACE"):
        jit_train, _, _, batch_sh = ShardedStep(
            mesh, make_train_step(loss_fn)).compile(state)
        batch = jax.device_put(batch, jax.tree.map(lambda _: batch_sh, batch))

    # Device step time via the calibrated chained-fori methodology
    # (see vivqa_tpu/utils/profiling.py for why naive timing lies
    # through remote-dispatch tunnels).
    _note("compiling + timing train step...")
    from vivqa_tpu.utils.profiling import time_train_steps
    per_step = time_train_steps(make_train_step(loss_fn), state, batch,
                                steps=20)
    qps_per_chip = B / per_step / n_chips

    vs_baseline = 1.0
    if BASELINE_FILE.exists():
        base = json.loads(BASELINE_FILE.read_text()).get("value", 0)
        if base > 0:
            vs_baseline = qps_per_chip / base
    else:
        BASELINE_FILE.write_text(json.dumps(
            {"metric": "train_qa_pairs_per_sec_per_chip",
             "value": qps_per_chip,
             "recorded": "round1"}))

    print(json.dumps({
        "metric": "train_qa_pairs_per_sec_per_chip",
        "value": round(qps_per_chip, 2),
        "unit": "QA-pairs/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
