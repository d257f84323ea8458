"""MoE routers — top-k, noisy top-k, soft, expert-choice.

Counterpart of the reference's router zoo (src/modeling/moe/router.py:
14-494), redesigned for XLA static shapes: every router returns a DENSE
per-token combine-weight matrix (B, L, E) plus aux losses, so downstream
dispatch is einsum-only (no data-dependent shapes). Sparse capacity-based
dispatch consumes the same outputs (see layer.py).

Ablation support: all routers accept an optional ``expert_mask`` (E,)
float array; disabled experts get -inf logits before top-k/softmax so the
remaining weights renormalize exactly like the reference's monkey-patched
router (reference: ablation_trainer.py:150-197) — but functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vivqa_tpu.models.moe.config import RouterConfig

NEG_INF = -1e9


@dataclasses.dataclass
class RouterOutput:
    combine_weights: jnp.ndarray   # (B, L, E) dense per-token expert weights
    router_probs: jnp.ndarray      # (B, L, E) full softmax (fp32)
    aux_loss: jnp.ndarray          # scalar fp32: weighted sum of aux terms
    metrics: dict                  # expert_usage (E,), entropy, ...


def load_balance_loss(probs: jnp.ndarray, assignment: jnp.ndarray) -> jnp.ndarray:
    """Switch-style load balance: E * sum_e(frac_tokens_e * mean_prob_e)
    (reference TopKRouter loss, router.py:144-178)."""
    E = probs.shape[-1]
    frac = assignment.reshape(-1, E).mean(axis=0)
    mean_prob = probs.reshape(-1, E).mean(axis=0)
    return E * jnp.sum(frac * mean_prob)


def router_z_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """ST-MoE z-loss: mean(logsumexp(logits)^2)
    (reference moe_utils.compute_router_z_loss, moe_utils.py:79)."""
    z = jax.nn.logsumexp(logits, axis=-1)
    return jnp.mean(z**2)


def _router_metrics(probs: jnp.ndarray, weights: jnp.ndarray) -> dict:
    E = probs.shape[-1]
    usage = (weights.reshape(-1, E) > 0).astype(jnp.float32).mean(axis=0)
    p = probs.reshape(-1, E)
    entropy = -jnp.mean(jnp.sum(p * jnp.log(p + 1e-9), axis=-1))
    imbalance = jnp.std(usage) / (jnp.mean(usage) + 1e-9)
    return {"expert_usage": usage, "routing_entropy": entropy,
            "load_imbalance": imbalance}


class _RouterBase(nn.Module):
    config: RouterConfig
    num_experts: int

    def _logits(self, x: jnp.ndarray,
                expert_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        # Bias-free linear gate (reference BaseRouter, router.py:14-72),
        # computed in fp32 for routing stability.
        logits = nn.Dense(self.num_experts, use_bias=False,
                          dtype=jnp.float32, name="gate")(x.astype(jnp.float32))
        logits = logits / self.config.temperature
        if expert_mask is not None:
            logits = jnp.where(expert_mask > 0, logits, NEG_INF)
        return logits

    def _finish(self, logits: jnp.ndarray, weights: jnp.ndarray,
                assignment: jnp.ndarray) -> RouterOutput:
        probs = jax.nn.softmax(logits, axis=-1)
        aux = self.config.load_balance_weight * load_balance_loss(probs, assignment)
        if self.config.z_loss_weight:
            aux = aux + self.config.z_loss_weight * router_z_loss(logits)
        return RouterOutput(weights, probs, aux, _router_metrics(probs, weights))


def _topk_dense(probs: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k then renormalize, scattered back to dense (..., E)."""
    top_vals, top_idx = jax.lax.top_k(probs, k)
    top_vals = top_vals / jnp.maximum(top_vals.sum(axis=-1, keepdims=True), 1e-9)
    one_hot = jax.nn.one_hot(top_idx, probs.shape[-1], dtype=probs.dtype)
    dense = jnp.einsum("...ke,...k->...e", one_hot, top_vals)
    assignment = (dense > 0).astype(probs.dtype)
    return dense, assignment


class TopKRouter(_RouterBase):
    """softmax -> top-k -> renormalize (reference router.py:75-178)."""

    @nn.compact
    def __call__(self, x, expert_mask=None, *, deterministic: bool = True):
        logits = self._logits(x, expert_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        weights, assignment = _topk_dense(probs, min(self.config.top_k, self.num_experts))
        return self._finish(logits, weights, assignment)


class NoisyTopKRouter(_RouterBase):
    """Learned-noise top-k (reference router.py:251-366): during training
    adds N(0,1)*softplus(w_noise(x)) to the logits."""

    @nn.compact
    def __call__(self, x, expert_mask=None, *, deterministic: bool = True):
        logits = self._logits(x, expert_mask)
        # w_noise must exist regardless of mode so init/apply see the same
        # param tree (flax conditional-param pitfall).
        noise_std = jax.nn.softplus(
            nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                     name="w_noise")(x.astype(jnp.float32)))
        if not deterministic:
            noise = jax.random.normal(self.make_rng("router"), logits.shape)
            noisy = logits + noise * noise_std * self.config.noise_std
            if expert_mask is not None:
                noisy = jnp.where(expert_mask > 0, noisy, NEG_INF)
        else:
            noisy = logits
        probs = jax.nn.softmax(noisy, axis=-1)
        weights, assignment = _topk_dense(probs, min(self.config.top_k, self.num_experts))
        return self._finish(logits, weights, assignment)


class SoftRouter(_RouterBase):
    """All experts, temperature softmax, entropy regularizer
    (reference router.py:181-248)."""

    @nn.compact
    def __call__(self, x, expert_mask=None, *, deterministic: bool = True):
        logits = self._logits(x, expert_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        out = self._finish(logits, probs, (probs > 1e-6).astype(probs.dtype))
        if self.config.entropy_weight:
            ent = -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-9), axis=-1))
            out.aux_loss = out.aux_loss + self.config.entropy_weight * ent
        return out


class ExpertChoiceRouter(_RouterBase):
    """Experts pick their top-C tokens (reference router.py:369-449).
    Capacity C = capacity_factor * T / E, static at trace time. Tokens not
    chosen by any expert get zero weight (natural token-dropping)."""

    @nn.compact
    def __call__(self, x, expert_mask=None, *, deterministic: bool = True):
        logits = self._logits(x, expert_mask)           # (B, L, E)
        B, L, E = logits.shape
        probs = jax.nn.softmax(logits, axis=-1)
        cap = max(1, int(self.config.capacity_factor * L / E))
        # scores over tokens per expert: (B, E, L)
        scores = jnp.swapaxes(probs, 1, 2)
        top_vals, top_idx = jax.lax.top_k(scores, min(cap, L))   # (B, E, C)
        sel = jax.nn.one_hot(top_idx, L, dtype=probs.dtype)      # (B, E, C, L)
        weights = jnp.einsum("becl,bec->ble", sel, top_vals)
        assignment = (weights > 0).astype(probs.dtype)
        return self._finish(logits, weights, assignment)


_ROUTERS = {"topk": TopKRouter, "noisy_topk": NoisyTopKRouter,
            "soft": SoftRouter, "expert_choice": ExpertChoiceRouter}
_ALIASES = {"top_k": "topk", "noisy_top_k": "noisy_topk"}


def create_router(config: RouterConfig, num_experts: int,
                  name: str = "router") -> nn.Module:
    kind = _ALIASES.get(config.router_type, config.router_type)
    if kind not in _ROUTERS:
        raise ValueError(f"unknown router '{config.router_type}' "
                         f"(choices: {tuple(_ROUTERS)})")
    return _ROUTERS[kind](config, num_experts, name=name)
