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
    """Dense MoE: every expert sees every token; router weights combine.

    Layout: one stacked (E, D, H) / (E, H, D) weight pair; the router
    combine is FUSED into the output einsum ('bleh,ehd,ble->bld'), and
    the residual + LayerNorm sit OUTSIDE the combine (Switch-style:
    y = LN(x + sum_e w_e * FF_e(x))). This avoids materializing the
    (B, L, E, D) per-expert output tensor and its 4-D residual/LayerNorm
    — measured ~3x faster fwd+bwd than the naive combine on v5e.
    """
    config: MoEConfig

    @nn.compact
    def __call__(self, x, expert_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        cfg = self.config
        E, H, D = cfg.num_experts, cfg.expert.hidden_dim, x.shape[-1]
        router = create_router(cfg.router, E)
        rout = router(x, expert_mask, deterministic=deterministic)
        w = rout.combine_weights.astype(x.dtype)                # (B, L, E)

        init = nn.initializers.lecun_normal()
        w_in = self.param("experts_w_in", init, (E, D, H), jnp.float32)
        b_in = self.param("experts_bias_in", nn.initializers.zeros,
                          (E, H), jnp.float32)
        w_out = self.param("experts_w_out", init, (E, H, D), jnp.float32)
        b_out = self.param("experts_bias_out", nn.initializers.zeros,
                           (E, D), jnp.float32)

        h = jnp.einsum("bld,edh->bleh", x, w_in.astype(x.dtype))
        h = h + b_in.astype(x.dtype)
        h = nn.gelu(h)
        if cfg.expert.expert_type == "glu":
            w_gate = self.param("experts_w_gate", init, (E, D, H), jnp.float32)
            h = h * nn.sigmoid(jnp.einsum("bld,edh->bleh", x,
                                          w_gate.astype(x.dtype)))
        h = nn.Dropout(cfg.expert.dropout)(h, deterministic=deterministic)
        # fused combine: contract expert AND hidden dims in one einsum
        y = jnp.einsum("bleh,ehd,ble->bld", h, w_out.astype(x.dtype), w)
        y = y + jnp.einsum("ble,ed->bld", w, b_out.astype(x.dtype))
        y = nn.LayerNorm(dtype=x.dtype, name="ln_out")(y + x)
        return y, {"aux_loss": rout.aux_loss, "metrics": rout.metrics}


class SparseMOELayer(nn.Module):
    """Capacity-based sparse dispatch — compute scales with k/E, not E.

    Dispatch is SORT-based (Megablocks-style): token->expert assignments
    are sorted by expert id, positions within each expert's queue come
    from one exclusive cumsum, and tokens move through a single
    gather -> stacked expert matmul -> scatter-add. Memory traffic is
    O(T*k*D); the naive one-hot einsum alternative materializes a
    (T, E, C) dispatch tensor (O(T*E*C)) which dominates HBM at scale.
    Tokens over capacity are dropped (earlier tokens win, matching the
    reference's truncation semantics, moe_layer.py:327-335); the residual
    carries them through.
    """
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

        Tk = T * k
        expert_flat = top_idx.reshape(Tk)
        token_flat = jnp.repeat(jnp.arange(T), k)
        gate_flat = gates.reshape(Tk)
        # stable sort by expert keeps token order = priority within expert
        order = jnp.argsort(expert_flat, stable=True)
        sorted_e = expert_flat[order]
        sorted_t = token_flat[order]
        sorted_g = gate_flat[order]

        counts = jnp.sum(jax.nn.one_hot(expert_flat, E, dtype=jnp.int32),
                         axis=0)                                 # (E,)
        seg_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        pos_in_expert = jnp.arange(Tk, dtype=jnp.int32) - seg_start[sorted_e]
        keep = pos_in_expert < cap
        # overflow rows land in a trash slot at index E*cap
        dest = jnp.where(keep, sorted_e * cap + pos_in_expert, E * cap)

        xf = x.reshape(T, D)
        buf = jnp.zeros((E * cap + 1, D), x.dtype)
        buf = buf.at[dest].set(xf[sorted_t])                     # gather+scatter
        expert_in = buf[: E * cap].reshape(E, cap, D)

        init = nn.initializers.lecun_normal()
        H = cfg.expert.hidden_dim
        w_in = self.param("experts_w_in", init, (E, D, H), jnp.float32)
        w_out = self.param("experts_w_out", init, (E, H, D), jnp.float32)
        h = jnp.einsum("ecd,edh->ech", expert_in, w_in.astype(x.dtype))
        h = nn.gelu(h)
        expert_out = jnp.einsum("ech,ehd->ecd", h, w_out.astype(x.dtype))

        rows = expert_out.reshape(E * cap, D)
        contrib = rows[jnp.where(keep, dest, 0)] * \
            (sorted_g * keep.astype(jnp.float32))[:, None].astype(x.dtype)
        y = jnp.zeros((T, D), x.dtype).at[sorted_t].add(contrib)
        y = y.reshape(B, L, D)
        y = nn.LayerNorm(dtype=x.dtype, name="ln_out")(y + x)
        dropped = 1.0 - keep.sum() / jnp.maximum(float(Tk), 1.0)
        metrics = dict(rout.metrics)
        metrics["dropped_token_fraction"] = dropped.astype(jnp.float32)
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
