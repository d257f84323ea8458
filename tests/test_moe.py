"""MoE tests: routers, layers, expert masking semantics, sparse dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.models.moe import (ExpertConfig, MoEConfig, RouterConfig,
                                  VQAMoEConfig, create_moe_layer,
                                  create_router, load_balance_loss,
                                  router_z_loss)

RNGS = {"params": jax.random.PRNGKey(0), "router": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}
APPLY_RNGS = {"router": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}


def _x(B=2, L=6, D=32, seed=9):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, L, D))


@pytest.mark.parametrize("rt", ["topk", "noisy_topk", "soft", "expert_choice"])
def test_router_weight_properties(rt):
    cfg = RouterConfig(router_type=rt, top_k=2)
    router = create_router(cfg, 4)
    x = _x()
    var = router.init(RNGS, x)
    out = router.apply(var, x, deterministic=True)
    w = np.asarray(out.combine_weights, np.float32)
    assert w.shape == (2, 6, 4)
    assert (w >= 0).all()
    if rt in ("topk", "noisy_topk"):
        # renormalized top-k: weights sum to 1, at most k nonzero
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert ((w > 0).sum(-1) <= 2).all()
    if rt == "soft":
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.isfinite(float(out.aux_loss))
    assert out.metrics["expert_usage"].shape == (4,)


def test_topk_expert_mask_renormalizes():
    """Disabling experts must renormalize remaining weights exactly —
    the functional equivalent of the reference's router monkey-patch
    (ablation_trainer.py:150-197)."""
    router = create_router(RouterConfig(router_type="topk", top_k=4), 4)
    x = _x()
    var = router.init(RNGS, x)
    full = router.apply(var, x)
    mask = jnp.array([0.0, 1.0, 1.0, 1.0])
    masked = router.apply(var, x, mask)
    w = np.asarray(masked.combine_weights, np.float32)
    assert (w[..., 0] == 0).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # masked weights proportional to surviving unmasked weights
    fw = np.asarray(full.combine_weights, np.float32)
    expected = fw[..., 1:] / fw[..., 1:].sum(-1, keepdims=True)
    np.testing.assert_allclose(w[..., 1:], expected, atol=1e-4)


def test_load_balance_loss_uniform_is_one():
    """Perfectly uniform routing gives loss == 1.0 (E * E * (1/E * 1/E))."""
    probs = jnp.full((10, 4), 0.25)
    assign = jnp.full((10, 4), 0.25)
    assert np.isclose(float(load_balance_loss(probs, assign)), 1.0)


def test_router_z_loss_zero_logits():
    logits = jnp.zeros((5, 4))
    expected = np.log(4.0) ** 2
    assert np.isclose(float(router_z_loss(logits)), expected, atol=1e-5)


@pytest.mark.parametrize("mt", ["standard", "sparse", "hierarchical"])
def test_moe_layer_forward(mt):
    cfg = MoEConfig(num_experts=4, input_dim=32,
                    expert=ExpertConfig(hidden_dim=64),
                    router=RouterConfig(top_k=2), moe_type=mt)
    layer = create_moe_layer(cfg)
    x = _x()
    var = layer.init(RNGS, x)
    y, aux = layer.apply(var, x, deterministic=False, rngs=APPLY_RNGS)
    assert y.shape == x.shape
    assert np.isfinite(float(aux["aux_loss"]))
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_sparse_no_drops_with_high_capacity():
    cfg = MoEConfig(num_experts=2, input_dim=32,
                    expert=ExpertConfig(hidden_dim=64),
                    router=RouterConfig(top_k=1, capacity_factor=4.0),
                    moe_type="sparse")
    layer = create_moe_layer(cfg)
    x = _x()
    var = layer.init(RNGS, x)
    _, aux = layer.apply(var, x)
    assert float(aux["metrics"]["dropped_token_fraction"]) == 0.0


def test_sparse_drops_with_tiny_capacity():
    cfg = MoEConfig(num_experts=4, input_dim=32,
                    expert=ExpertConfig(hidden_dim=64),
                    router=RouterConfig(top_k=1, capacity_factor=0.3),
                    moe_type="sparse")
    layer = create_moe_layer(cfg)
    x = _x(B=4, L=8)
    var = layer.init(RNGS, x)
    _, aux = layer.apply(var, x)
    assert float(aux["metrics"]["dropped_token_fraction"]) > 0.0


def test_vqa_moe_fixed_order_and_mask():
    cfg = VQAMoEConfig(input_dim=32, num_vision_experts=1, num_text_experts=1,
                       num_multimodal_experts=1,
                       specialized_types=("counting",), expert_hidden_dim=64,
                       num_heads=2)
    assert cfg.num_experts == 4
    assert cfg.expert_index_ranges() == {
        "vision": (0, 1), "text": (1, 2), "multimodal": (2, 3),
        "specialized": (3, 4)}
    layer = create_moe_layer(cfg)
    x = _x()
    var = layer.init(RNGS, x)
    # param tree has the fixed-order expert names
    names = set(var["params"].keys())
    assert {"experts/vision_0", "experts/text_0", "experts/multimodal_0",
            "experts/specialized_0_counting"} <= names
    mask = jnp.array([1.0, 0.0, 1.0, 1.0])
    _, aux = layer.apply(var, x, mask)
    assert float(aux["metrics"]["expert_usage"][1]) == 0.0


@pytest.mark.parametrize("spec", ["segmentation", "object_detection", "ocr",
                                  "scene_understanding", "spatial_reasoning",
                                  "counting"])
def test_specialized_experts(spec):
    from vivqa_tpu.models.moe.experts import create_expert
    ex = create_expert(ExpertConfig(expert_type=spec, hidden_dim=64,
                                    num_heads=2), name=spec)
    x = _x()
    var = ex.init(RNGS, x)
    y = ex.apply(var, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_stacked_experts_match_individual():
    """StackedExperts einsum == applying each expert's slice manually."""
    from vivqa_tpu.models.moe.experts import StackedExperts
    m = StackedExperts(num_experts=3, hidden_dim=16)
    x = _x(D=8)
    var = m.init(RNGS, x)
    outs = m.apply(var, x)                       # (B, L, E, D)
    p = var["params"]
    for e in range(3):
        h = np.asarray(x, np.float32) @ np.asarray(p["w_in"][e])
        h = h + np.asarray(p["bias_in"][e])
        h = np.asarray(jax.nn.gelu(jnp.asarray(h, jnp.bfloat16)), np.float32)
        y = h @ np.asarray(p["w_out"][e]) + np.asarray(p["bias_out"][e])
        y = y + np.asarray(x, np.float32)
        # apply the shared LayerNorm manually (init scale=1, bias=0)
        mu = y.mean(-1, keepdims=True)
        var_ = y.var(-1, keepdims=True)
        y_ln = (y - mu) / np.sqrt(var_ + 1e-6)
        ref = np.asarray(outs[:, :, e], np.float32)
        np.testing.assert_allclose(ref, y_ln, atol=0.1), f"expert {e}"


def test_sparse_priority_earlier_token_wins():
    """With capacity 1 and both tokens routed to the same expert, the
    earlier token is kept and the later one is dropped (residual only) —
    the reference's truncation semantics."""
    cfg = MoEConfig(num_experts=2, input_dim=8,
                    expert=ExpertConfig(hidden_dim=16),
                    router=RouterConfig(top_k=1, capacity_factor=0.5),
                    moe_type="sparse")
    layer = create_moe_layer(cfg)
    # identical tokens -> same routing; T=2, k=1, E=2 ->
    # cap = int(0.5 * 2 * 1 / 2) = 1 per expert
    x = jnp.ones((1, 2, 8))
    var = layer.init(RNGS, x)
    y, aux = layer.apply(var, x)
    assert np.isclose(float(aux["metrics"]["dropped_token_fraction"]), 0.5)
    y = np.asarray(y, np.float32)
    # dropped token's output is LN(residual only); kept token got expert
    # output added -> the two rows must differ
    assert not np.allclose(y[0, 0], y[0, 1], atol=1e-3)


@pytest.mark.parametrize("spec", ["segmentation", "object_detection", "ocr",
                                  "scene_understanding", "spatial_reasoning",
                                  "counting"])
def test_specialized_experts_are_nonlocal(spec):
    """Distinct inductive behavior vs FeedForwardExpert: every specialized
    expert routes information ACROSS tokens (perturbing token j changes
    the output at token i != j), while the FF expert is strictly
    pointwise. This is what makes the ablation study's expert deltas
    meaningful (VERDICT r1 #6)."""
    from vivqa_tpu.models.moe.experts import create_expert
    cfg = ExpertConfig(expert_type=spec, hidden_dim=64, num_heads=2,
                       dropout=0.0)
    ex = create_expert(cfg, name=spec)
    x = np.asarray(_x(), np.float32)
    var = ex.init(RNGS, jnp.asarray(x))
    y0 = np.asarray(ex.apply(var, jnp.asarray(x)), np.float32)
    x2 = x.copy()
    x2[:, -1] += 3.0                             # perturb the LAST token
    y1 = np.asarray(ex.apply(var, jnp.asarray(x2)), np.float32)
    # output at token 0 moved -> cross-token information flow
    assert np.abs(y1[:, 0] - y0[:, 0]).max() > 1e-4, spec

    # control: the FF expert is pointwise — token 0 must NOT move
    ff = create_expert(ExpertConfig(expert_type="feedforward",
                                    hidden_dim=64, dropout=0.0), name="ff")
    var_ff = ff.init(RNGS, jnp.asarray(x))
    f0 = np.asarray(ff.apply(var_ff, jnp.asarray(x)), np.float32)
    f1 = np.asarray(ff.apply(var_ff, jnp.asarray(x2)), np.float32)
    assert np.abs(f1[:, 0] - f0[:, 0]).max() < 1e-5


def test_spatial_expert_relation_embeddings_learn():
    """The relation-type table participates in the computation: gradients
    reach it (reference relation_embeddings, specialized_experts.py:184)."""
    from vivqa_tpu.models.moe.experts import create_expert
    ex = create_expert(ExpertConfig(expert_type="spatial_reasoning",
                                    hidden_dim=64, num_heads=2, dropout=0.0),
                       name="sp")
    x = _x()
    var = ex.init(RNGS, x)

    def loss(params):
        return (ex.apply({"params": params}, x).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(var["params"])
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    rel = [l for kp, l in flat if "relation_embeddings" in str(kp)]
    assert rel and np.abs(np.asarray(rel[0])).max() > 0
