"""MoE demo (reference: examples/moe_examples.py).

Shows routers, dense/sparse/hierarchical/VQA layers, expert masking
(the ablation mechanism), and router telemetry.
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import jax
import jax.numpy as jnp

from vivqa_tpu.models.moe import (ExpertConfig, MoEConfig, RouterConfig,
                                  VQAMoEConfig, create_moe_layer,
                                  create_router)

RNGS = {"params": jax.random.PRNGKey(0), "router": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


def main():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 64))

    print("== routers ==")
    for rt in ("topk", "noisy_topk", "soft", "expert_choice"):
        router = create_router(RouterConfig(router_type=rt, top_k=2), 4)
        out = router.apply(router.init(RNGS, x), x)
        print(f"{rt:>14}: usage={out.metrics['expert_usage'].round(2)} "
              f"aux={float(out.aux_loss):.4f}")

    print("== layers ==")
    for mt in ("standard", "sparse", "hierarchical"):
        cfg = MoEConfig(num_experts=4, input_dim=64,
                        expert=ExpertConfig(hidden_dim=128),
                        router=RouterConfig(top_k=2), moe_type=mt)
        layer = create_moe_layer(cfg)
        y, aux = layer.apply(layer.init(RNGS, x), x)
        print(f"{mt:>14}: out={tuple(y.shape)} aux={float(aux['aux_loss']):.4f}")

    print("== VQA MoE (heterogeneous, fixed order) ==")
    vcfg = VQAMoEConfig(input_dim=64, num_vision_experts=1,
                        num_text_experts=1, num_multimodal_experts=1,
                        specialized_types=("counting",),
                        expert_hidden_dim=128, num_heads=4)
    layer = create_moe_layer(vcfg)
    var = layer.init(RNGS, x)
    print("expert ranges:", vcfg.expert_index_ranges())
    _, aux = layer.apply(var, x)
    print("full usage:   ", aux["metrics"]["expert_usage"].round(3))
    mask = jnp.array([0.0, 1.0, 1.0, 1.0])       # ablate expert 0
    _, aux = layer.apply(var, x, mask)
    print("masked usage: ", aux["metrics"]["expert_usage"].round(3))


if __name__ == "__main__":
    main()
