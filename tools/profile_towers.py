"""Per-tower fwd+bwd timing for the flagship bench model.

Isolates which tower's BACKWARD is inefficient (profile_components.py
showed backward at ~6x forward where ~2x is healthy). Each tower is
timed standalone with the same chained-fori instrument.

Usage (one tower per run over the dev tunnel — compiles are minutes):
    python tools/profile_towers.py --tower visual [--batch 128]
    python tools/profile_towers.py --tower text
    python tools/profile_towers.py --tower fusion     # mcan+moe+head
    python tools/profile_towers.py --tower embed      # embedding only
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tower", required=True,
                    choices=["visual", "text", "fusion", "embed", "trunk"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--eval", action="store_true",
                    help="deterministic mode (no dropout)")
    ap.add_argument("--nomask", action="store_true",
                    help="text tower: skip the attention mask")
    ap.add_argument("--threefry", action="store_true",
                    help="keep the threefry dropout PRNG (default: the "
                         "hardware RngBitGenerator, matching bench.py)")
    args = ap.parse_args()
    if not args.threefry:
        from vivqa_tpu.utils.seeding import enable_fast_prng
        enable_fast_prng()
    B = args.batch

    from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig)
    from vivqa_tpu.utils.profiling import measure_rtt, time_chained

    rng = jax.random.PRNGKey(0)
    det = bool(args.eval)

    if args.tower == "visual":
        from vivqa_tpu.models.encoders import create_visual_encoder
        enc = create_visual_encoder(VisualEncoderConfig(
            backbone="clip", image_size=224, patch_size=32, hidden_dim=768,
            num_layers=12, num_heads=12))
        px = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3),
                         jnp.float32)
        params = enc.init(rng, px[:2])

        def loss(p, px_in, r):
            out = enc.apply(p, px_in, deterministic=det,
                            rngs=None if det else {"dropout": r})
            return (out["pooled"].astype(jnp.float32) ** 2).mean()
        arg0, rest = params, (px, rng)

    elif args.tower == "text":
        from vivqa_tpu.models.encoders import create_text_encoder
        enc = create_text_encoder(TextEncoderConfig(
            backbone="phobert", vocab_size=64001, hidden_dim=768,
            num_layers=12, num_heads=12, max_length=64))
        ids = jnp.asarray(np.random.RandomState(1).randint(0, 64000, (B, 64)),
                          jnp.int32)
        mask = jnp.ones((B, 64), jnp.int32)
        params = enc.init(rng, ids[:2])

        if args.nomask:
            mask = None

        def loss(p, ids_in, r):
            out = enc.apply(p, ids_in, mask, deterministic=det,
                            rngs=None if det else {"dropout": r})
            return (out["pooled"].astype(jnp.float32) ** 2).mean()
        arg0, rest = params, (ids, rng)

    elif args.tower == "embed":
        from vivqa_tpu.ops.embedding import MatmulGradEmbed
        emb = MatmulGradEmbed(64001, 768)
        ids = jnp.asarray(np.random.RandomState(1).randint(0, 64000, (B, 64)),
                          jnp.int32)
        params = emb.init(rng, ids[:2])

        def loss(p, ids_in, r):
            return (emb.apply(p, ids_in).astype(jnp.float32) ** 2).mean()
        arg0, rest = params, (ids, rng)

    elif args.tower == "trunk":
        # 12 bare EncoderLayers on (B, 64, 768) — isolates the masked-
        # attention cost from embeddings/pooling (--nomask to compare)
        import flax.linen as nn
        from vivqa_tpu.models.layers import EncoderLayer, make_attention_mask

        class Trunk(nn.Module):
            @nn.compact
            def __call__(self, x, mask=None, *, deterministic=True):
                for i in range(12):
                    x = EncoderLayer(num_heads=12, d_ff=3072, dropout=0.1,
                                     name=f"l{i}")(x, mask=mask,
                                                   deterministic=deterministic)
                return x

        mod = Trunk()
        x = jax.random.normal(rng, (B, 64, 768))
        pad = jnp.ones((B, 64), jnp.int32)
        attn_mask = None if args.nomask else make_attention_mask(pad, pad)
        params = mod.init(rng, x[:2],
                          None if attn_mask is None else attn_mask[:2])

        def loss(p, x_in, r):
            out = mod.apply(p, x_in, attn_mask, deterministic=det,
                            rngs=None if det else {"dropout": r})
            return (out.astype(jnp.float32) ** 2).mean()
        arg0, rest = params, (x, rng)

    else:  # fusion: mcan + moe + answer head on synthetic tokens
        import flax.linen as nn
        from vivqa_tpu.models.fusion import create_fusion
        from vivqa_tpu.models.moe import (MoEConfig, ExpertConfig,
                                          RouterConfig, create_moe_layer)
        from vivqa_tpu.models.heads import AnswerHead
        from vivqa_tpu.models.config import AnswerHeadConfig

        class Fuse(nn.Module):
            @nn.compact
            def __call__(self, visual, text, *, deterministic=True):
                fusion = create_fusion(FusionConfig(
                    fusion_type="mcan", hidden_dim=512, num_heads=8,
                    num_layers=4))
                moe = create_moe_layer(MoEConfig(
                    num_experts=4, input_dim=512,
                    expert=ExpertConfig(hidden_dim=1024),
                    router=RouterConfig(router_type="noisy_topk", top_k=2)))
                head = AnswerHead(AnswerHeadConfig(), num_answers=1000)
                out = fusion(visual, text, deterministic=deterministic)
                tokens, aux = moe(out["tokens"],
                                  deterministic=deterministic)
                logits = head(tokens.mean(axis=1),
                              deterministic=deterministic)
                return logits, aux["aux_loss"]

        mod = Fuse()
        k1, k2 = jax.random.split(rng)
        visual = {"pooled": jax.random.normal(k1, (B, 768)),
                  "tokens": jax.random.normal(k1, (B, 49, 768))}
        text = {"pooled": jax.random.normal(k2, (B, 768)),
                "tokens": jax.random.normal(k2, (B, 64, 768)),
                "mask": jnp.ones((B, 64), jnp.int32)}
        params = mod.init({"params": rng, "router": rng},
                          jax.tree.map(lambda x: x[:2], visual),
                          jax.tree.map(lambda x: x[:2], text))

        def loss(p, visual_in, r):
            logits, aux = mod.apply(
                p, visual_in, text, deterministic=det,
                rngs=None if det else {"dropout": r, "router": r})
            return (logits.astype(jnp.float32) ** 2).mean() + 0.01 * aux
        arg0, rest = params, (visual, rng)

    rtt = measure_rtt(jnp.zeros((8,)))
    print(f"tower={args.tower} B={B} det={det} rtt={rtt * 1e3:.1f}ms")

    from vivqa_tpu.utils.profiling import time_chained
    t_f = time_chained(loss, (arg0, *rest), steps=args.steps, rtt=rtt)
    print(f"forward : {t_f * 1e3:8.2f} ms", flush=True)

    def fwdbwd(p, a, r):
        return jax.grad(lambda pp: loss(pp, a, r))(p)
    t_fb = time_chained(fwdbwd, (arg0, *rest), steps=args.steps, rtt=rtt)
    print(f"fwd+bwd : {t_fb * 1e3:8.2f} ms   "
          f"(bwd/fwd ratio {(t_fb - t_f) / t_f:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
