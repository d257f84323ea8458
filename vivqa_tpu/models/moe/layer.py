"""MoE layers: dense, sparse (capacity-based), VQA-heterogeneous, hierarchical.

Counterpart of src/modeling/moe/moe_layer.py:29-693 in the reference,
re-architected for XLA:

- **MOELayer** (dense): all experts computed in ONE stacked einsum
  (StackedExperts), combined by router weights. Replaces the reference's
  per-expert Python loop + masked weighted sum (moe_layer.py:152-168).
- **SparseMOELayer**: Switch/flaxformer-style static capacity dispatch —
  (T, E, C) one-hot dispatch/combine tensors built from top-k assignments
  and a cumsum position-in-expert, all static shapes. Tokens over capacity
  are dropped (residual passes them through), exactly the semantics of the
  reference's truncation (moe_layer.py:327-335) but without index_add_.
- **VQAMoELayer**: heterogeneous vision/text/multimodal/specialized expert
  groups in FIXED order (ablation masks index into this order; reference
  moe_layer.py:617-689), dense combine.
- **HierarchicalMoE**: 2-level group -> expert routing with summed aux
  losses (reference moe_layer.py:361-548).

All layers return ``(y, aux)`` with aux = {"aux_loss": scalar fp32,
"metrics": {...router telemetry...}}.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vivqa_tpu.models.moe.config import (ExpertConfig, MoEConfig, VQAMoEConfig)
from vivqa_tpu.models.moe.experts import (MultimodalExpert, StackedExperts,
                                          TextExpert, VisionExpert,
                                          create_expert)
from vivqa_tpu.models.moe.routers import create_router


class MOELayer(nn.Module):
    """Dense MoE: every expert sees every token; router weights combine."""
    config: MoEConfig

    @nn.compact
    def __call__(self, x, expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        router = create_router(cfg.router, cfg.num_experts)
        rout = router(x, expert_mask, deterministic=deterministic)
        experts = StackedExperts(cfg.num_experts, cfg.expert.hidden_dim,
                                 glu=(cfg.expert.expert_type == "glu"),
                                 dropout=cfg.expert.dropout, name="experts")
        outs = experts(x, deterministic=deterministic)          # (B, L, E, D)
        w = rout.combine_weights.astype(outs.dtype)             # (B, L, E)
        y = jnp.einsum("ble,bled->bld", w, outs)
        y = nn.LayerNorm(dtype=outs.dtype, name="ln_out")(y + x.astype(outs.dtype))
        return y, {"aux_loss": rout.aux_loss, "metrics": rout.metrics}


class SparseMOELayer(nn.Module):
    """Capacity-based sparse dispatch — compute scales with k/E, not E."""
    config: MoEConfig

    @nn.compact
    def __call__(self, x, expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        B, L, D = x.shape
        E, k = cfg.num_experts, min(cfg.router.top_k, cfg.num_experts)
        T = B * L
        cap = max(1, int(cfg.router.capacity_factor * T * k / E))

        router = create_router(cfg.router, E)
        rout = router(x, expert_mask, deterministic=deterministic)
        flat_w = rout.combine_weights.reshape(T, E).astype(jnp.float32)

        gates, top_idx = jax.lax.top_k(flat_w, k)               # (T, k)
        # Build dispatch/combine with static shapes, slot by slot.
        # Position in expert queue accumulates across slots so capacity is
        # shared between k assignments (slot 0 has priority).
        dispatch = jnp.zeros((T, E, cap), jnp.float32)
        combine = jnp.zeros((T, E, cap), jnp.float32)
        counts = jnp.zeros((E,), jnp.int32)
        for j in range(k):
            assign = jax.nn.one_hot(top_idx[:, j], E, dtype=jnp.int32)  # (T, E)
            pos = jnp.cumsum(assign, axis=0) - 1 + counts[None, :]
            counts = counts + assign.sum(axis=0)
            within = (pos < cap) & (assign > 0)
            pos_oh = jax.nn.one_hot(jnp.where(within, pos, 0), cap,
                                    dtype=jnp.float32)           # (T, E, cap)
            slot = pos_oh * within.astype(jnp.float32)[..., None]
            dispatch = dispatch + slot
            combine = combine + slot * gates[:, j][:, None, None]

        xf = x.reshape(T, D)
        expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), xf)
        # Stacked FF expert compute on (E, cap, D)
        init = nn.initializers.lecun_normal()
        H = cfg.expert.hidden_dim
        w_in = self.param("experts_w_in", init, (E, D, H), jnp.float32)
        w_out = self.param("experts_w_out", init, (E, H, D), jnp.float32)
        h = jnp.einsum("ecd,edh->ech", expert_in, w_in.astype(x.dtype))
        h = nn.gelu(h)
        expert_out = jnp.einsum("ech,ehd->ecd", h, w_out.astype(x.dtype))

        y = jnp.einsum("tec,ecd->td", combine.astype(x.dtype), expert_out)
        y = y.reshape(B, L, D)
        y = nn.LayerNorm(dtype=x.dtype, name="ln_out")(y + x)
        dropped = 1.0 - dispatch.sum() / jnp.maximum(float(k) * T, 1.0)
        metrics = dict(rout.metrics)
        metrics["dropped_token_fraction"] = dropped
        return y, {"aux_loss": rout.aux_loss, "metrics": metrics}


class VQAMoELayer(nn.Module):
    """Heterogeneous VQA MoE in fixed expert order
    vision -> text -> multimodal -> specialized."""
    config: VQAMoEConfig

    @nn.compact
    def __call__(self, x, expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        ex_cfg = ExpertConfig(hidden_dim=cfg.expert_hidden_dim,
                              num_heads=cfg.num_heads, dropout=cfg.dropout)
        experts = []
        for i in range(cfg.num_vision_experts):
            experts.append(VisionExpert(ex_cfg, name=f"experts/vision_{i}"))
        for i in range(cfg.num_text_experts):
            experts.append(TextExpert(ex_cfg, name=f"experts/text_{i}"))
        for i in range(cfg.num_multimodal_experts):
            experts.append(MultimodalExpert(ex_cfg, name=f"experts/multimodal_{i}"))
        for i, s in enumerate(cfg.specialized_types):
            experts.append(create_expert(
                ex_cfg.replace(expert_type=s), name=f"experts/specialized_{i}_{s}"))
        E = len(experts)
        assert E == cfg.num_experts

        router = create_router(cfg.router, E)
        rout = router(x, expert_mask, deterministic=deterministic)
        outs = jnp.stack([ex(x, deterministic=deterministic) for ex in experts],
                         axis=2)                                # (B, L, E, D)
        w = rout.combine_weights.astype(outs.dtype)
        y = jnp.einsum("ble,bled->bld", w, outs)
        y = nn.LayerNorm(dtype=outs.dtype, name="ln_out")(y + x.astype(outs.dtype))
        return y, {"aux_loss": rout.aux_loss, "metrics": rout.metrics}


class HierarchicalMoE(nn.Module):
    """Two-level routing: groups, then experts within the winning group."""
    config: MoEConfig

    @nn.compact
    def __call__(self, x, expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        G = cfg.num_groups
        per_group = cfg.num_experts // G
        group_router = create_router(
            cfg.router.replace(top_k=1), G, name="group_router")
        g_out = group_router(x, None, deterministic=deterministic)

        total_aux = g_out.aux_loss
        group_ys = []
        for g in range(G):
            sub = MOELayer(cfg.replace(num_experts=per_group, moe_type="standard"),
                           name=f"group_{g}")
            sub_mask = None
            if expert_mask is not None:
                sub_mask = jax.lax.dynamic_slice_in_dim(
                    expert_mask, g * per_group, per_group)
            y_g, aux_g = sub(x, sub_mask, deterministic=deterministic)
            total_aux = total_aux + aux_g["aux_loss"]
            group_ys.append(y_g)
        ys = jnp.stack(group_ys, axis=2)                        # (B, L, G, D)
        gw = g_out.combine_weights.astype(ys.dtype)
        y = jnp.einsum("blg,blgd->bld", gw, ys)
        return y, {"aux_loss": total_aux, "metrics": g_out.metrics}


def create_moe_layer(config, name: str = "moe"):
    """Factory over the four layer types (reference factory usage in
    generative CrossModalFusion, generative_vqa_model.py:224-284)."""
    if isinstance(config, VQAMoEConfig):
        return VQAMoELayer(config, name=name)
    kind = config.moe_type
    if kind == "standard":
        return MOELayer(config, name=name)
    if kind == "sparse":
        return SparseMOELayer(config, name=name)
    if kind == "hierarchical":
        return HierarchicalMoE(config, name=name)
    raise ValueError(f"unknown moe_type '{kind}'")
