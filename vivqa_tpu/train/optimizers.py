"""Optimizers & LR schedules (optax).

Counterpart of src/solvers/optimizers/vqa_optimizers.py:39-617 in the
reference: AdamW/Adam/SGD/RAdam (+ Lookahead wrapper), warmup-cosine /
warmup-linear / polynomial / step / OneCycle schedules, no-decay param
groups, layer-wise LR decay, and gradient clipping.

TPU notes: no GradScaler anywhere — bf16 needs no loss scaling
(reference's fp16 AMP plumbing, training_pipeline.py:342, disappears
by design). Weight-decay masking and layer-wise decay are optax masks /
per-path scale maps over the param tree. Optimizer-state HBM levers
(round 5): `mu_dtype="bfloat16"` halves first-moment traffic;
`name="adafactor"` factors the second moment (row+col stats) — the
optimizer pass is pure HBM bandwidth, see BASELINE.md MFU row.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import optax

from vivqa_tpu.config.base import ConfigBase

NO_DECAY_PATTERNS = (r"bias", r"/ln[0-9_a-z]*/", r"layernorm", r"ln_",
                     r"_embed/embedding", r"cls_token", r"pos_embed",
                     r"scale$")


@dataclasses.dataclass(frozen=True)
class OptimizerConfig(ConfigBase):
    name: str = "adamw"             # adamw | adam | sgd | radam | lamb
    #                               # | adafactor
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    momentum: float = 0.9           # sgd
    grad_clip_norm: float = 1.0
    lookahead: bool = False
    lookahead_sync: int = 5
    lookahead_slow_step: float = 0.5
    layer_decay: float = 0.0        # 0 = off; e.g. 0.9 for LLRD
    accumulate_steps: int = 1
    # dtype of Adam-family FIRST moment (params/updates stay fp32). The
    # optimizer pass is pure HBM traffic (read params+mu+nu+grad, write
    # params+mu+nu); bf16 mu cuts ~1/7 of it at negligible quality cost
    # (the mu read feeds a lerp, not a sqrt). "bfloat16" | "float32".
    mu_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SchedulerConfig(ConfigBase):
    name: str = "warmup_cosine"     # warmup_cosine | warmup_linear |
    # polynomial | step | onecycle | constant
    warmup_steps: int = 0
    warmup_ratio: float = 0.1       # used if warmup_steps == 0
    total_steps: int = 10000
    min_lr_ratio: float = 0.0
    power: float = 1.0              # polynomial
    step_size: int = 1000           # step decay
    gamma: float = 0.5              # step decay


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts).lower()


def decay_mask(params) -> object:
    """True where weight decay applies (reference no-decay list,
    training_pipeline.py:234, training_utils.py:82-166)."""
    def check(keypath, _):
        path = _path_str(keypath)
        return not any(re.search(p, path) for p in NO_DECAY_PATTERNS)
    return jax.tree_util.tree_map_with_path(check, params)


def layer_decay_scales(params, decay: float):
    """Per-leaf LR scale: deeper layers get larger LR (decay^(L-1-i));
    encoder layer index parsed from 'layers_<i>' in the path
    (reference LayerWiseLearningRateDecay, vqa_optimizers.py:329-423)."""
    def get_layer(keypath, _):
        path = _path_str(keypath)
        m = re.search(r"layers_(\d+)", path)
        return int(m.group(1)) if m else -1
    ids = jax.tree_util.tree_map_with_path(get_layer, params)
    max_layer = max([x for x in jax.tree.leaves(ids)] + [0])

    def scale(i):
        if i < 0:
            return 1.0
        return decay ** (max_layer - i)
    return jax.tree.map(scale, ids)


def create_schedule(sched: SchedulerConfig, base_lr: float):
    """Factory (reference create_scheduler, vqa_optimizers.py:518)."""
    warmup = sched.warmup_steps or max(1, int(sched.warmup_ratio * sched.total_steps))
    # tiny runs (total <= warmup) must still build a valid schedule:
    # optax requires a positive post-warmup decay span
    warmup = min(warmup, max(0, sched.total_steps - 1))
    decay_steps = max(1, sched.total_steps - warmup)
    end = base_lr * sched.min_lr_ratio
    if sched.name == "constant":
        return optax.constant_schedule(base_lr)
    if sched.name == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, sched.total_steps, end_value=end)
    if sched.name == "warmup_linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup),
             optax.linear_schedule(base_lr, end, decay_steps)], [warmup])
    if sched.name == "polynomial":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup),
             optax.polynomial_schedule(base_lr, end, sched.power, decay_steps)],
            [warmup])
    if sched.name == "step":
        bounds = {i * sched.step_size: sched.gamma
                  for i in range(1, max(1, sched.total_steps // sched.step_size) + 1)}
        return optax.piecewise_constant_schedule(base_lr, bounds)
    if sched.name == "onecycle":
        # optax NaNs on zero-width ramp intervals: need total >= 2 and
        # pct_start strictly inside (0, 1)
        total = max(sched.total_steps, 2)
        pct = min(max(warmup / total, 1.0 / total), 1.0 - 1.0 / total)
        return optax.cosine_onecycle_schedule(
            total, peak_value=base_lr, pct_start=pct)
    raise ValueError(f"unknown scheduler '{sched.name}'")


def create_optimizer(config: OptimizerConfig,
                     sched: Optional[SchedulerConfig] = None,
                     params=None,
                     freeze_mask=None) -> optax.GradientTransformation:
    """Build the full optax chain: clip -> (llrd scale) -> optimizer
    (+schedule) -> (lookahead) -> (freeze) -> (accumulation).

    `freeze_mask`: pytree of bool, True = trainable (see strategies.py).
    """
    lr = (create_schedule(sched, config.learning_rate)
          if sched is not None else config.learning_rate)

    mask = decay_mask(params) if params is not None else None
    import jax.numpy as jnp
    mu_dtype = jnp.dtype(config.mu_dtype)
    if config.name == "adamw":
        opt = optax.adamw(lr, b1=config.beta1, b2=config.beta2,
                          eps=config.eps, weight_decay=config.weight_decay,
                          mask=mask, mu_dtype=mu_dtype)
    elif config.name == "adam":
        opt = optax.adam(lr, b1=config.beta1, b2=config.beta2, eps=config.eps,
                         mu_dtype=mu_dtype)
    elif config.name == "adafactor":
        # factored second moment (row+col stats instead of a full fp32
        # tree) — the MaxText-class lever for the optimizer's pure-HBM
        # param/moment sweep; momentum off = no first moment either
        opt = optax.adafactor(
            lr, multiply_by_parameter_scale=False,
            clipping_threshold=None,
            momentum=config.beta1 if config.beta1 > 0 else None,
            dtype_momentum=mu_dtype,
            weight_decay_rate=config.weight_decay or None,
            weight_decay_mask=mask)
    elif config.name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(config.weight_decay, mask=mask),
            optax.sgd(lr, momentum=config.momentum))
    elif config.name == "radam":
        opt = optax.chain(
            optax.add_decayed_weights(config.weight_decay, mask=mask),
            optax.radam(lr, b1=config.beta1, b2=config.beta2, eps=config.eps))
    elif config.name == "lamb":
        opt = optax.lamb(lr, b1=config.beta1, b2=config.beta2,
                         eps=config.eps, weight_decay=config.weight_decay,
                         mask=mask)
    else:
        raise ValueError(f"unknown optimizer '{config.name}'")

    parts = []
    if config.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clip_norm))
    parts.append(opt)
    if config.layer_decay and params is not None:
        # AFTER the inner optimizer: adaptive optimizers normalize by
        # sqrt(v), which cancels any constant pre-optimizer gradient
        # scale — LLRD must scale the post-normalization UPDATE (the
        # reference sets per-group LRs, vqa_optimizers.py:329-423).
        parts.append(_scale_by_tree(layer_decay_scales(params, config.layer_decay)))
    if config.lookahead:
        # exact Lookahead (Zhang et al. 2019; reference wrapper
        # vqa_optimizers.py:266-327): keep slow weights in the opt state,
        # every k steps pull fast weights toward slow and sync. Implemented
        # as a post-optimizer transformation so params stay a plain tree
        # (no LookaheadParams wrapper to complicate checkpoints).
        parts.append(_lookahead(config.lookahead_sync,
                                config.lookahead_slow_step))
    tx = optax.chain(*parts)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", freeze_mask))
    if config.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, config.accumulate_steps)
    return tx


def _lookahead(sync_period: int, slow_step: float):
    """Exact Lookahead as an optax transformation applied AFTER the inner
    optimizer: fast' = params + updates; every `sync_period` steps the
    emitted update instead moves params to
    slow + slow_step * (fast' - slow) and syncs the slow copy."""
    import jax.numpy as jnp

    def init_fn(params):
        return {"slow": jax.tree.map(lambda x: x, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        count = state["count"] + 1
        sync = (count % sync_period) == 0

        def leaf(u, p, s):
            fast = p + u
            synced = s + slow_step * (fast - s)
            return jnp.where(sync, synced - p, u)

        new_updates = jax.tree.map(leaf, updates, params, state["slow"])
        new_slow = jax.tree.map(
            lambda u, p, s: jnp.where(sync, p + u, s),
            new_updates, params, state["slow"])
        return new_updates, {"slow": new_slow, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_tree(scales):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state
    return optax.GradientTransformation(init_fn, update_fn)


def global_grad_norm(grads) -> jax.Array:
    return optax.global_norm(grads)
