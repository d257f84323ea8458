"""Mixture-of-Experts tutorial (reference: examples/moe_examples.py).

The MoE subsystem is this framework's flagship ablation subject. This
walkthrough covers every router, every layer type, every expert family
(including all six specialized experts), the dispatch designs that make
MoE fast on TPU, the aux losses, the telemetry, and the expert-masking
mechanism the ablation study is built on.

Reference surface: src/modeling/moe/ (router.py, expert_types.py,
specialized_experts.py, moe_layer.py, moe_utils.py). The TPU redesign
differs deliberately: homogeneous experts are ONE stacked (E, D, H)
tensor computed in a single einsum (MXU-friendly, shardable over the
'model' mesh axis = expert parallelism) instead of a Python loop over
expert modules, and the sparse path uses sort-based (Megablocks-style)
static-shape dispatch instead of index_add scatter.

Sections
  1. Routers: topk / noisy_topk / soft / expert_choice
  2. Aux losses: load-balance and router z-loss, and why they exist
  3. Homogeneous layers: standard (dense) vs sparse (capacity) dispatch
  4. Capacity & dropped-token telemetry
  5. Hierarchical MoE (2-level routing)
  6. Expert families: FF / GLU / vision / text / multimodal
  7. The six specialized experts and their distinct inductive biases
  8. VQA MoE layer: fixed expert order + ablation masks
  9. Expert parallelism: sharding the expert axis over a device mesh

Run (any platform; shapes are tiny):
    python examples/moe_examples.py
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.models.moe import (ExpertConfig, MoEConfig, RouterConfig,
                                  VQAMoEConfig, create_moe_layer,
                                  create_router, load_balance_loss,
                                  router_z_loss)
from vivqa_tpu.models.moe.config import SPECIALIZED_TYPES

RNGS = {"params": jax.random.PRNGKey(0), "router": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}
DIM = 64


def banner(title):
    print(f"\n{'=' * 64}\n{title}\n{'=' * 64}")


def section_routers(x):
    banner("1. Routers")
    print("""A router maps each token to a distribution over experts and
selects which experts compute it. Four strategies (reference
router.py:75-449), each with a different compute/quality trade:

  topk           softmax -> top-k -> renormalize. The classic Shazeer
                 gate; deterministic given the logits.
  noisy_topk     adds learned, softplus-scaled Gaussian noise to the
                 logits during training (exploration; the default for
                 the VQA MoE layer). Needs an rng stream: rngs={'router': key}.
  soft           every expert computes every token, combined by the full
                 softmax. No discreteness -> no load-balance problem,
                 but no compute savings either.
  expert_choice  inverted: each EXPERT picks its top-capacity tokens.
                 Perfect load balance by construction; a token may be
                 picked by 0 or several experts.
""")
    for rt in ("topk", "noisy_topk", "soft", "expert_choice"):
        router = create_router(RouterConfig(router_type=rt, top_k=2), 4)
        variables = router.init(RNGS, x)
        out = router.apply(variables, x, rngs={"router": RNGS["router"]})
        print(f"  {rt:>14}: usage={np.asarray(out.metrics['expert_usage']).round(2)}"
              f"  aux={float(out.aux_loss):.4f}")
    print("\n  'usage' = fraction of routed token-slots per expert; a\n"
          "  uniform vector means balanced load.")


def section_aux_losses(x):
    banner("2. Aux losses")
    print("""Discrete routing collapses without regularization: the router
finds one good expert and starves the rest. Two standard fixes,
exposed as pure functions (reference moe_utils.py:35-97):

  load_balance_loss   E * sum_e(frac_tokens_e * mean_prob_e)
                      (Switch Transformer eq. 4) — minimized when the
                      routing is uniform; differentiable through the
                      mean-prob factor.
  router_z_loss       mean(logsumexp(logits)^2) — keeps router logits
                      small so the softmax stays in a trainable regime
                      (ST-MoE). Off by default; enable with
                      RouterConfig(z_loss_weight=1e-3).
""")
    router = create_router(RouterConfig(router_type="topk", top_k=2), 4)
    variables = router.init(RNGS, x)
    out = router.apply(variables, x)
    probs = out.metrics["router_probs"] if "router_probs" in out.metrics else None
    print(f"  combined aux from the router: {float(out.aux_loss):.4f}")
    # Show the functions directly on a synthetic skewed distribution
    skewed = jnp.array([[0.97, 0.01, 0.01, 0.01]] * 100)
    uniform = jnp.full((100, 4), 0.25)
    for name, p in (("skewed", skewed), ("uniform", uniform)):
        dispatch = jax.nn.one_hot(p.argmax(-1), 4)
        lb = float(load_balance_loss(p, dispatch))
        print(f"  load_balance_loss on {name:>7} routing: {lb:.3f}")
    logits_big = jnp.full((100, 4), 30.0)
    logits_small = jnp.zeros((100, 4))
    print(f"  router_z_loss   on large logits: "
          f"{float(router_z_loss(logits_big)):.1f}   "
          f"on small logits: {float(router_z_loss(logits_small)):.2f}")


def section_layers(x):
    banner("3. Homogeneous layers: dense vs sparse dispatch")
    print("""Two dispatch designs for the same (router, experts) pair:

  standard  every expert computes EVERY token in one stacked einsum
            (B,L,D)x(E,D,H); the router weights only the combine. On
            TPU this is often FASTER than sparse for small E: the MXU
            loves the extra batch dimension and there is no gather.
            (This matches what the reference's MOELayer computes, minus
            its Python loop.)
  sparse    tokens are sorted by assigned expert and each expert
            computes only its capacity slice — Megablocks-style
            static-shape dispatch (sort + segment boundaries), NOT a
            dynamic scatter. Wins when E is large or experts are heavy.
""")
    for mt in ("standard", "sparse"):
        cfg = MoEConfig(num_experts=4, input_dim=DIM,
                        expert=ExpertConfig(hidden_dim=128),
                        router=RouterConfig(top_k=2), moe_type=mt)
        layer = create_moe_layer(cfg)
        variables = layer.init(RNGS, x)
        n = sum(p.size for p in jax.tree.leaves(variables))
        y, aux = layer.apply(variables, x)
        print(f"  {mt:>10}: out={tuple(y.shape)}  params={n:,}  "
              f"aux={float(aux['aux_loss']):.4f}")
    print("\n  Identical parameter trees -> you can switch moe_type in the\n"
          "  config without invalidating a checkpoint.")


def section_capacity(x):
    banner("4. Capacity & dropped-token telemetry")
    print("""Sparse dispatch must bound each expert's token count at compile
time (XLA needs static shapes). capacity = factor * T * k / E.
Tokens routed to a full expert are DROPPED (their residual passes
through unchanged). The layer reports the dropped fraction — watch
it during training; >5% sustained means raise capacity_factor:
""")
    for cf in (0.5, 1.0, 1.25, 2.0):
        cfg = MoEConfig(num_experts=4, input_dim=DIM,
                        expert=ExpertConfig(hidden_dim=128),
                        router=RouterConfig(top_k=2, capacity_factor=cf),
                        moe_type="sparse")
        layer = create_moe_layer(cfg)
        variables = layer.init(RNGS, x)
        _, aux = layer.apply(variables, x)
        dropped = float(aux["metrics"]["dropped_token_fraction"])
        print(f"  capacity_factor={cf:<5} -> dropped {dropped * 100:5.1f}% of tokens")


def section_hierarchical(x):
    banner("5. Hierarchical MoE")
    print("""Two-level routing (reference moe_layer.py:361-548): a group
router picks among num_groups groups, then a per-group router picks
experts inside the winning group. Aux losses from both levels sum.
Useful when experts have natural families (e.g. per-modality).
""")
    cfg = MoEConfig(num_experts=4, input_dim=DIM, num_groups=2,
                    expert=ExpertConfig(hidden_dim=128),
                    router=RouterConfig(top_k=1), moe_type="hierarchical")
    layer = create_moe_layer(cfg)
    variables = layer.init(RNGS, x)
    y, aux = layer.apply(variables, x)
    print(f"  2 groups x 2 experts: out={tuple(y.shape)} "
          f"aux={float(aux['aux_loss']):.4f}")


def section_expert_families(x):
    banner("6. Expert families")
    print("""Homogeneous experts (FF, GLU) live in stacked tensors; the
heterogeneous families have real sub-architectures and compute
per-module (reference expert_types.py):

  feed_forward  2-layer MLP + residual + LN   (stacked)
  glu           gated linear unit variant     (stacked)
  vision        spatial multi-head attention over patch tokens
  text          self-attention + FFN over word tokens
  multimodal    cross-attention with a learned sigmoid modality gate
""")
    from vivqa_tpu.models.moe.experts import StackedExperts, create_expert
    stacked = StackedExperts(num_experts=4, hidden_dim=128)
    v = stacked.init(RNGS, x)
    per_expert = stacked.apply(v, x)
    print(f"  StackedExperts(4): (B,L,D) -> per-expert {tuple(per_expert.shape)}"
          "   [one einsum for all four]")
    for et in ("vision", "text", "multimodal"):
        mod = create_expert(ExpertConfig(expert_type=et, hidden_dim=128,
                                         num_heads=4), name=et)
        variables = mod.init(RNGS, x)
        y = mod.apply(variables, x)
        n = sum(p.size for p in jax.tree.leaves(variables))
        print(f"  {et:>16}: (B,L,D) -> {tuple(y.shape)}  ({n:,} params)")


def section_specialized(x):
    banner("7. The six specialized experts")
    print("""Reference-grade architectures (specialized_experts.py), each a
(B,L,D)->(B,L,D) module with a distinct inductive bias:

  segmentation      mask tokens -> transformer decoder -> boundary conv
  object_detection  DETR-style: learned object queries through a
                    multi-layer decoder, cross-attended back to tokens
  ocr               text-region queries + reading-order attention +
                    Vietnamese diacritic head
  scene             scene tokens + encoder + global context attention
  spatial           O(S^2) pairwise relation embeddings + graph attention
  counting          count queries + density head (soft counting)
""")
    from vivqa_tpu.models.moe.experts import create_expert
    for name in SPECIALIZED_TYPES:
        mod = create_expert(ExpertConfig(expert_type=name, hidden_dim=128,
                                         num_heads=4), name=name)
        variables = mod.init(RNGS, x)
        y = mod.apply(variables, x)
        n = sum(p.size for p in jax.tree.leaves(variables))
        print(f"  {name:>16}: out={tuple(y.shape)}  params={n:,}")
    print("\n  Distinctness matters: the ablation study's expert-importance\n"
          "  numbers are only meaningful if experts are architecturally\n"
          "  different (tests/test_moe.py::test_specialized_experts_are_nonlocal\n"
          "  proves each one is, and the spatial expert's relation\n"
          "  embeddings demonstrably learn on a relational task).")


def section_vqa_layer(x):
    banner("8. VQA MoE layer + ablation masks")
    print("""The heterogeneous flagship layer. Experts are created in a FIXED
order — vision, text, multimodal, then specialized (reference
moe_layer.py:617-689) — because the ablation study addresses
experts by index. Masking an expert zeroes its router weight and
renormalizes the remainder, exactly reproducing the reference's
monkey-patched router semantics, but functionally (a mask array,
not a mutation):
""")
    vcfg = VQAMoEConfig(input_dim=DIM, num_vision_experts=1,
                        num_text_experts=1, num_multimodal_experts=1,
                        specialized_types=("counting", "spatial_reasoning"),
                        expert_hidden_dim=128, num_heads=4)
    layer = create_moe_layer(vcfg)
    variables = layer.init(RNGS, x)
    print(f"  expert order/ranges: {vcfg.expert_index_ranges()}")
    _, aux = layer.apply(variables, x)
    print(f"  full usage:        {np.asarray(aux['metrics']['expert_usage']).round(3)}")
    mask = jnp.array([0.0, 1.0, 1.0, 1.0, 1.0])     # ablate vision expert
    _, aux = layer.apply(variables, x, mask)
    print(f"  vision-masked:     {np.asarray(aux['metrics']['expert_usage']).round(3)}")
    mask = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0])     # specialized off
    _, aux = layer.apply(variables, x, mask)
    print(f"  specialized-off:   {np.asarray(aux['metrics']['expert_usage']).round(3)}")
    print("\n  The ablation runner builds these masks from experiment\n"
          "  configs (vivqa_tpu/ablation/modifier.py) — see\n"
          "  vivqa_tpu/cli/run_ablation.sh for the full study.")


def section_expert_parallel(x):
    banner("9. Expert parallelism on a device mesh")
    print("""Because homogeneous experts are ONE (E, D, H) tensor, expert
parallelism is just a sharding annotation: partition the E axis
over the 'model' mesh axis and XLA places each expert's slice on a
different chip, inserting the all-to-alls itself. The partition
rules in vivqa_tpu/parallel/mesh.py do this for every stacked
expert tensor. Demonstration on however many devices exist:
""")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices())
    if devs.size < 2:
        print(f"  ({devs.size} device visible — run under\n"
              "   XLA_FLAGS=--xla_force_host_platform_device_count=8\n"
              "   JAX_PLATFORMS=cpu to see a real 8-way mesh; the\n"
              "   sharding below is a 1-device no-op.)")
    mesh = Mesh(devs.reshape(-1), ("model",))
    w = jnp.zeros((4, DIM, 128))        # (E, D, H) stacked expert weights
    sharded = jax.device_put(w, NamedSharding(mesh, P("model", None, None)))
    print(f"  stacked weights {tuple(w.shape)} sharded as "
          f"{sharded.sharding.spec} over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    print("  Training this way needs no code change: see\n"
          "  tests/test_multichip.py::test_sparse_moe_expert_parallel_parity.")


def main():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, DIM))
    section_routers(x)
    section_aux_losses(x)
    section_layers(x)
    section_capacity(x)
    section_hierarchical(x)
    section_expert_families(x)
    section_specialized(x)
    section_vqa_layer(x)
    section_expert_parallel(x)
    banner("Done")
    print("Wire MoE into a full model with\n"
          "  MoEModelConfig(use_moe=True, num_experts=..., top_k=...)\n"
          "inside VQAModelConfig — see examples/complete_vqa_pipeline.py.")


if __name__ == "__main__":
    main()
