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


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a fresh JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def new_rng(key: jax.Array, n: int = 2):
    """Split a key into n subkeys (convenience wrapper)."""
    return jax.random.split(key, n)
