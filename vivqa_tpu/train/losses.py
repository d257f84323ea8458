"""Loss functions — pure jnp, fp32 accumulation.

Counterpart of the reference's loss zoo (src/solvers/losses/vqa_losses.py:
27-674): cross-entropy w/ label smoothing, BCE multi-label, focal, soft
target (VQA-v2), contrastive, triplet, InfoNCE, MoE load-balancing, and a
multi-task combiner with optional learned uncertainty weights.

Design: plain functions of (logits/embeddings, targets) -> scalar, usable
inside any jitted train step; the multi-task combiner is a small class
holding weights only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       label_smoothing: float = 0.0,
                       ignore_index: Optional[int] = None,
                       weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE over the last axis. labels: int (...,). ignore_index positions
    contribute zero (reference: -100 masking, generative_training_pipeline
    .py:286-362)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = jnp.ones(labels.shape, jnp.float32)
    if ignore_index is not None:
        valid = (labels != ignore_index).astype(jnp.float32)
        labels = jnp.where(labels == ignore_index, 0, labels)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -(onehot * logp).sum(axis=-1) * valid
    if weights is not None:
        nll = nll * weights
        valid = valid * weights
    return nll.sum() / jnp.maximum(valid.sum(), 1.0)


def soft_target_loss(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """VQA-v2 soft-target BCE (reference SoftTargetLoss, vqa_losses.py:281):
    targets in [0,1] per answer class."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_sigmoid(logits)
    lognotp = jax.nn.log_sigmoid(-logits)
    loss = -(soft_targets * logp + (1 - soft_targets) * lognotp)
    return loss.sum(axis=-1).mean()


def binary_cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Multi-label BCE (reference vqa_losses.py:100)."""
    return soft_target_loss(logits, targets)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               alpha: float = 0.25) -> jnp.ndarray:
    """Focal loss (reference FocalLoss, vqa_losses.py:149)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    pt = jnp.exp((onehot * logp).sum(-1))
    ce = -(onehot * logp).sum(-1)
    return (alpha * (1 - pt) ** gamma * ce).mean()


def contrastive_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray,
                     temperature: float = 0.07) -> jnp.ndarray:
    """Symmetric InfoNCE between two aligned embedding batches
    (reference ContrastiveLoss/InfoNCELoss, vqa_losses.py:338,:446)."""
    a = emb_a / (jnp.linalg.norm(emb_a, axis=-1, keepdims=True) + 1e-8)
    b = emb_b / (jnp.linalg.norm(emb_b, axis=-1, keepdims=True) + 1e-8)
    sim = (a @ b.T).astype(jnp.float32) / temperature
    labels = jnp.arange(a.shape[0])
    loss_ab = cross_entropy_loss(sim, labels)
    loss_ba = cross_entropy_loss(sim.T, labels)
    return 0.5 * (loss_ab + loss_ba)


def info_nce_loss(query: jnp.ndarray, positive: jnp.ndarray,
                  temperature: float = 0.07) -> jnp.ndarray:
    return contrastive_loss(query, positive, temperature)


def triplet_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                 negative: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """Margin triplet loss (reference TripletLoss, vqa_losses.py:395)."""
    d_pos = jnp.sum((anchor - positive) ** 2, axis=-1)
    d_neg = jnp.sum((anchor - negative) ** 2, axis=-1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


def perplexity(loss: jnp.ndarray) -> jnp.ndarray:
    """exp(min(loss, 100)) — reference's clamp
    (generative_training_pipeline.py:348)."""
    return jnp.exp(jnp.minimum(loss, 100.0))


@dataclasses.dataclass
class MultiTaskLoss:
    """answer + aux (MoE) + optional consistency terms with static weights
    (reference VQAMultiTaskLoss, vqa_losses.py:576-674; the learned-
    uncertainty variant is expressed by passing log-var params explicitly)."""
    answer_weight: float = 1.0
    aux_weight: float = 1.0
    consistency_weight: float = 0.0

    def __call__(self, answer_loss, aux_loss=0.0, consistency_loss=0.0,
                 log_vars: Optional[jnp.ndarray] = None):
        if log_vars is not None:
            # Kendall-style uncertainty weighting over the active terms
            terms = jnp.stack([answer_loss, aux_loss, consistency_loss])
            prec = jnp.exp(-log_vars)
            return (prec * terms).sum() + log_vars.sum()
        return (self.answer_weight * answer_loss
                + self.aux_weight * aux_loss
                + self.consistency_weight * consistency_loss)


_LOSSES = {
    "cross_entropy": cross_entropy_loss,
    "bce": binary_cross_entropy_loss,
    "focal": focal_loss,
    "label_smoothing": cross_entropy_loss,
    "soft_target": soft_target_loss,
    "contrastive": contrastive_loss,
    "triplet": triplet_loss,
    "infonce": info_nce_loss,
}


def create_loss(name: str):
    """Factory (reference create_loss, vqa_losses.py:676)."""
    if name not in _LOSSES:
        raise ValueError(f"unknown loss '{name}' (choices: {tuple(_LOSSES)})")
    return _LOSSES[name]
