"""Component-level step-time budget for the flagship bench model.

Isolates where the train-step milliseconds go, using the same DCE-proof
chained-fori methodology as bench.py (vivqa_tpu/utils/profiling.py):

  fwd            forward pass only (loss value)
  fwd+bwd        value_and_grad, gradients consumed by the barrier
  full step      fwd+bwd + adamw/clip/schedule + state update (bench.py's
                 number)
  opt only       apply_gradients on frozen random grads
  tower ablation full step with the named tower swapped for identity

Usage (real TPU, serialize with other TPU work):
    python tools/profile_components.py [--batch 64] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", type=str, default="",
                    help="comma list of full,fwd,fwd_eval,fwd_bwd,opt "
                         "(each compile is minutes over the dev tunnel; "
                         "run in <10-min chunks)")
    ap.add_argument("--threefry", action="store_true",
                    help="keep the default threefry dropout PRNG. By "
                         "default this profiler enables the hardware "
                         "RngBitGenerator exactly like bench.py — "
                         "without it, fwd/fwd_bwd numbers are NOT "
                         "comparable to the bench step (threefry mask "
                         "generation alone is ~30ms on the flagship).")
    args = ap.parse_args()
    if not args.threefry:
        from vivqa_tpu.utils.seeding import enable_fast_prng
        enable_fast_prng()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig, VQAModelConfig)
    from vivqa_tpu.models.vqa_model import VietnameseVQAModel
    from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig, TrainState,
                                 create_optimizer, cross_entropy_loss,
                                 make_train_step)
    from vivqa_tpu.utils.profiling import (measure_rtt, time_chained,
                                           time_train_steps)

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

    B = args.batch
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
    params = model.init({"params": rng, "router": rng},
                        batch["pixel_values"][:2], batch["input_ids"][:2]
                        )["params"]
    tx = create_optimizer(
        OptimizerConfig(learning_rate=1e-4),
        SchedulerConfig(name="warmup_cosine", warmup_steps=100,
                        total_steps=10000),
        params=params)
    state = TrainState.create(model.apply, params, tx, rng)

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       deterministic=False,
                       rngs={"dropout": rng, "router": rng})
        loss = cross_entropy_loss(out["logits"], batch["labels"])
        return loss + 0.01 * out["aux_loss"], {}

    rtt = measure_rtt(batch)
    print(f"devices: {jax.devices()}  rtt={rtt * 1e3:.1f}ms  "
          f"B={B} steps={args.steps}")
    results = {}

    # full step (bench.py parity)
    if want("full"):
        t = time_train_steps(make_train_step(loss_fn), state, batch,
                             steps=args.steps, rtt=rtt)
        results["full_step"] = t
        print(f"full step      : {t * 1e3:8.2f} ms   "
              f"({B / t:,.0f} QA-pairs/s)", flush=True)

    # forward only
    def fwd(batch_in, params, rng):
        loss, _ = loss_fn(params, batch_in, rng, state.apply_fn)
        return loss
    if want("fwd"):
        t = time_chained(fwd, (batch, state.params, rng), steps=args.steps,
                         rtt=rtt)
        results["forward"] = t
        print(f"forward only   : {t * 1e3:8.2f} ms", flush=True)

    # forward in eval mode (no dropout/router noise)
    def fwd_eval(batch_in, params):
        out = state.apply_fn({"params": params}, batch_in["pixel_values"],
                             batch_in["input_ids"],
                             batch_in["attention_mask"], deterministic=True)
        return cross_entropy_loss(out["logits"], batch_in["labels"])
    if want("fwd_eval"):
        t = time_chained(fwd_eval, (batch, state.params), steps=args.steps,
                         rtt=rtt)
        results["forward_eval"] = t
        print(f"fwd (eval mode): {t * 1e3:8.2f} ms", flush=True)

    # fwd + bwd, no optimizer
    def fwdbwd(batch_in, params, rng):
        def inner(p):
            loss, _ = loss_fn(p, batch_in, rng, state.apply_fn)
            return loss
        loss, grads = jax.value_and_grad(inner)(params)
        return grads
    if want("fwd_bwd"):
        t = time_chained(fwdbwd, (batch, state.params, rng), steps=args.steps,
                         rtt=rtt)
        results["fwd_bwd"] = t
        print(f"fwd + bwd      : {t * 1e3:8.2f} ms", flush=True)

    # optimizer only: fixed grads, thread opt_state+params through
    fixed_grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6,
                               state.params)

    def opt_only(params, opt_state):
        updates, new_opt = tx.update(fixed_grads, opt_state, params)
        return jax.tree.map(lambda a, b: a + b, params, updates), new_opt

    @jax.jit
    def opt_chain(params, opt_state):
        def body(i, carry):
            p, o = carry
            p2, o2 = opt_only(jax.tree.map(
                lambda x: x * (1.0 + i * 0.0), p), o)
            return (p2, o2)
        p, o = jax.lax.fori_loop(0, args.steps, body, (params, opt_state))
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(p))

    if want("opt"):
        float(opt_chain(state.params, state.opt_state))
        t0 = time.perf_counter()
        float(opt_chain(state.params, state.opt_state))
        t = max(time.perf_counter() - t0 - rtt, 1e-9) / args.steps
        results["optimizer"] = t
        print(f"optimizer only : {t * 1e3:8.2f} ms", flush=True)

    if "fwd_bwd" in results and "forward" in results:
        print(f"implied backward = "
              f"{(results['fwd_bwd'] - results['forward']) * 1e3:.2f} ms")
    if "full_step" in results and "fwd_bwd" in results:
        print(f"implied opt+update = "
              f"{(results['full_step'] - results['fwd_bwd']) * 1e3:.2f} ms")
    if "forward" in results and "forward_eval" in results:
        print(f"dropout/router-noise cost = "
              f"{(results['forward'] - results['forward_eval']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
