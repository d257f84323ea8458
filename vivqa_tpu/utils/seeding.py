"""Seeding utilities — functional RNG, TPU-first.

Unlike the reference's global `set_seed(deterministic)` (reference:
src/pipeline/trainer/training_utils.py:19), JAX randomness is explicit:
we seed numpy/python for host-side shuffling and hand back a `jax.random`
key for everything on device.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def enable_fast_prng() -> None:
    """Switch new PRNG keys to the TPU hardware RngBitGenerator
    ('unsafe_rbg', the t5x/MaxText training default).

    Dropout mask generation with the default threefry PRNG is VPU-bound
    and shockingly expensive: measured 33.5 ms of a 70 ms fwd+bwd on the
    flagship text trunk (12 layers, B=128, dropout 0.1) on v5e, vs
    6.5 ms with rbg — threefry nearly DOUBLES the cost of a dropout-
    regularized training step. 'unsafe' refers to weaker fold_in/split
    independence guarantees, which dropout does not need.

    Affects keys created AFTER the call; call before PRNGKey. Checkpoint
    note: rbg keys are (4,) uint32 vs threefry's (2,), so a train-state
    rng restored across implementations is shape-filtered by
    partial_load and re-derived from the seed."""
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")


def set_seed(seed: int, fast_prng: bool = True) -> jax.Array:
    """Seed host RNGs and return a fresh JAX PRNG key.

    fast_prng=True (default) routes device RNG through the TPU hardware
    generator — see enable_fast_prng. Pass False for cross-
    implementation reproducibility of exact random draws."""
    if fast_prng:
        enable_fast_prng()
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def new_rng(key: jax.Array, n: int = 2):
    """Split a key into n subkeys (convenience wrapper)."""
    return jax.random.split(key, n)
