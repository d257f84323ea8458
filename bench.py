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

_note("importing jax / connecting to device (a silent stall here is the "
      "known tunnel hang — retry the identical command)...")

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
    # optimizer-state experiment knobs (round-5 lever: the opt pass is
    # pure HBM traffic): BENCH_OPT_NAME=adafactor, BENCH_MU_DTYPE=bfloat16
    tx = create_optimizer(
        OptimizerConfig(learning_rate=1e-4,
                        name=os.environ.get("BENCH_OPT_NAME", "adamw"),
                        mu_dtype=os.environ.get("BENCH_MU_DTYPE",
                                                "float32")),
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
    from vivqa_tpu.utils.profiling import (peak_tflops, time_train_steps,
                                           train_step_flops)
    per_step = time_train_steps(make_train_step(loss_fn), state, batch,
                                steps=20)
    qps_per_chip = B / per_step / n_chips

    # MFU: model FLOPs per step / peak bf16 FLOPs (VERDICT r2 #4 — "is it
    # fast" as a fraction of the chip, not just of our own round-1
    # number). Default: analytic matmul count for THIS flagship config
    # (XLA cost analysis would be exact but costs another server-side
    # compile, which intermittently hangs the dev tunnel past the
    # 10-minute budget — opt in with BENCH_XLA_COST=1).
    def tower_macs(tokens, d, layers):
        # per token-layer: QKV+O 4d^2 + attention scores/values 2*T*d
        # + MLP(4x) 8d^2 MACs
        return tokens * layers * (12 * d * d + 2 * tokens * d)

    L_v = (cfg.visual.image_size // cfg.visual.patch_size) ** 2 + 1
    L_t = cfg.text.max_length
    d_f = cfg.fusion.hidden_dim
    macs = (tower_macs(L_v, cfg.visual.hidden_dim, cfg.visual.num_layers)
            + L_v * 3 * cfg.visual.patch_size ** 2 * cfg.visual.hidden_dim
            + tower_macs(L_t, cfg.text.hidden_dim, cfg.text.num_layers)
            # MCAN: text SA stream + visual SA+guided-attention stream
            + tower_macs(L_t, d_f, cfg.fusion.num_layers)
            + tower_macs(L_v, d_f, cfg.fusion.num_layers)
            + cfg.fusion.num_layers * L_v * (4 * d_f * d_f + 2 * L_t * d_f)
            # dense MoE: every expert computes every fused token
            + (L_v + L_t) * cfg.moe.num_experts
            * 2 * d_f * cfg.moe.expert_hidden_dim
            + d_f * cfg.num_answers)
    # fwd 2*MACs; backward ~2x forward => train step ~6*MACs (optimizer
    # and elementwise are noise at these shapes)
    flops = 6.0 * macs * B
    if os.environ.get("BENCH_XLA_COST"):
        _note("XLA cost analysis (one extra compile)...")
        flops = train_step_flops(make_train_step(loss_fn), state,
                                 batch) or flops
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 0)) or peak_tflops()
    step_tflops = flops / 1e12
    mfu = (flops / per_step / (peak * 1e12) / n_chips) if peak else None

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

    out = {
        "metric": "train_qa_pairs_per_sec_per_chip",
        "value": round(qps_per_chip, 2),
        "unit": "QA-pairs/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "step_ms": round(per_step * 1e3, 2),
    }
    if step_tflops:
        out["step_tflops"] = round(step_tflops, 3)
    if mfu:
        out["mfu_pct"] = round(mfu * 100, 1)
        out["peak_tflops_bf16"] = peak
    print(json.dumps(out))


if __name__ == "__main__":
    main()
