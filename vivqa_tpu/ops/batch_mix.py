"""Device-side batch-mix augmentation: MixUp and CutMix.

Counterpart of the reference's host-side torch ops
(src/data/augmentation.py:219-348: MixUp.__call__, CutMix._rand_bbox /
__call__). TPU re-design: both run *inside* the jitted train step on the
already-sharded batch — beta-sampled lambda, a batch-roll pairing, and a
mask-built CutMix box (static shapes; no dynamic slicing), so XLA fuses
the mix into the first conv/patchify read with zero extra HBM traffic.

The loss side is the lam-weighted pair formulation
``lam * CE(labels_a) + (1-lam) * CE(labels_b)`` — mathematically
identical to cross-entropy against the mixed soft target
(``mixed_soft_targets`` builds that explicit distribution for the
soft-target/BCE path and for tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pair_permutation(batch_size: int) -> jnp.ndarray:
    """Mixing partner for each row.

    The reference draws ``torch.randperm``; under jit a random
    permutation works too, but a fixed roll-by-one is the standard
    JAX-native choice (timm does the same under ``--mixup-mode batch``
    determinism): the batch is already shuffled by the loader, so
    roll(1) is a uniformly random pairing in distribution while keeping
    the gather trivially fusable.
    """
    return jnp.roll(jnp.arange(batch_size), 1)


def sample_lambda(rng: jax.Array, alpha: float) -> jnp.ndarray:
    """Beta(alpha, alpha) mixing ratio (reference :251-254, :328-331)."""
    if alpha <= 0:
        return jnp.float32(1.0)
    return jax.random.beta(rng, alpha, alpha, dtype=jnp.float32)


def mixup(rng: jax.Array, images: jnp.ndarray, alpha: float = 0.4
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MixUp a NHWC batch (reference MixUp.__call__ :236-261).

    Returns (mixed_images, partner_index, lam).
    """
    lam = sample_lambda(rng, alpha)
    perm = _pair_permutation(images.shape[0])
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed.astype(images.dtype), perm, lam


def cutmix(rng: jax.Array, images: jnp.ndarray, alpha: float = 1.0
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CutMix a NHWC batch (reference CutMix._rand_bbox/__call__ :283-348).

    The reference's dynamic ``images[:, :, y1:y2, x1:x2] = ...`` is a
    shape-changing slice; under XLA the box is a broadcasted-iota mask
    instead, which keeps shapes static and lets the compiler fuse the
    select. Lambda is re-adjusted to the *actual* clipped box area,
    exactly like the reference (:341).

    Returns (mixed_images, partner_index, lam_adjusted).
    """
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    k_lam, k_cx, k_cy = jax.random.split(rng, 3)
    lam = sample_lambda(k_lam, alpha)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (W * cut_rat).astype(jnp.int32)
    cut_h = (H * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k_cx, (), 0, W + 1)
    cy = jax.random.randint(k_cy, (), 0, H + 1)
    x1 = jnp.maximum(0, cx - cut_w // 2)
    y1 = jnp.maximum(0, cy - cut_h // 2)
    x2 = jnp.minimum(W, cx + cut_w // 2)
    y2 = jnp.minimum(H, cy + cut_h // 2)

    ys = jnp.arange(H)[:, None]            # (H, 1)
    xs = jnp.arange(W)[None, :]            # (1, W)
    box = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))  # (H, W)
    box = box[None, :, :, None]            # (1, H, W, 1) over NHWC
    perm = _pair_permutation(B)
    mixed = jnp.where(box, images[perm], images)
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)).astype(jnp.float32) / float(H * W)
    return mixed.astype(images.dtype), perm, lam_adj


def mix_batch(rng: jax.Array, images: jnp.ndarray, mode: str,
              alpha: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch on the (static) mode string: 'mixup' | 'cutmix' | 'both'.

    'both' flips a coin per step between the two, matching common
    timm-style usage.
    """
    if mode == "mixup":
        return mixup(rng, images, alpha)
    if mode == "cutmix":
        return cutmix(rng, images, alpha)
    if mode == "both":
        k_coin, k_mix = jax.random.split(rng)
        m_img, perm, m_lam = mixup(k_mix, images, alpha)
        c_img, _, c_lam = cutmix(k_mix, images, alpha)
        use_mix = jax.random.bernoulli(k_coin)
        img = jnp.where(use_mix, m_img, c_img)
        lam = jnp.where(use_mix, m_lam, c_lam)
        return img, perm, lam
    raise ValueError(f"unknown mix mode '{mode}' "
                     "(choices: mixup, cutmix, both)")


def mixed_soft_targets(labels_a: jnp.ndarray, labels_b: jnp.ndarray,
                       lam: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Explicit mixed label distribution: rows sum to 1. Feeds
    soft_target_loss / analysis; the CE path below never materializes it
    (lam-weighted NLL is identical and avoids a (B, num_answers) HBM
    buffer for large answer vocabularies)."""
    a = jax.nn.one_hot(labels_a, num_classes, dtype=jnp.float32)
    b = jax.nn.one_hot(labels_b, num_classes, dtype=jnp.float32)
    return lam * a + (1.0 - lam) * b


def mixed_cross_entropy(logits: jnp.ndarray, labels_a: jnp.ndarray,
                        labels_b: jnp.ndarray, lam: jnp.ndarray,
                        label_smoothing: float = 0.0) -> jnp.ndarray:
    """lam-weighted CE pair == CE against mixed_soft_targets (tested)."""
    from vivqa_tpu.train.losses import cross_entropy_loss
    ce_a = cross_entropy_loss(logits, labels_a,
                              label_smoothing=label_smoothing)
    ce_b = cross_entropy_loss(logits, labels_b,
                              label_smoothing=label_smoothing)
    return lam * ce_a + (1.0 - lam) * ce_b
