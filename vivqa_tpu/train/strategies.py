"""Training strategies: full / freeze_visual / freeze_text / linear_probe /
gradual_unfreeze (reference apply_training_strategy,
src/pipeline/trainer/training_utils.py:401-456).

In a functional stack, "freezing" is an optax mask (True = trainable);
gradual unfreeze recomputes the mask per epoch and re-creates the
optimizer chain — the opt state for still-frozen params is untouched.
"""

from __future__ import annotations

import jax

STRATEGIES = ("full", "freeze_visual", "freeze_text", "linear_probe",
              "gradual_unfreeze")

_VISUAL_PREFIX = "visual_encoder"
_TEXT_PREFIXES = ("text_encoder", "question_encoder")
_HEAD_PREFIXES = ("answer_head", "decoder")


def _path_head(keypath) -> str:
    if not keypath:
        return ""
    k = keypath[0]
    return str(getattr(k, "key", getattr(k, "idx", k)))


def trainable_mask(params, strategy: str, epoch: int = 0,
                   total_epochs: int = 1):
    """Bool pytree: True = trainable under the given strategy."""
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy '{strategy}' "
                         f"(choices: {STRATEGIES})")

    def mask(keypath, _):
        head = _path_head(keypath)
        if strategy == "full":
            return True
        if strategy == "freeze_visual":
            return head != _VISUAL_PREFIX
        if strategy == "freeze_text":
            return head not in _TEXT_PREFIXES
        if strategy == "linear_probe":
            return head in _HEAD_PREFIXES
        # gradual_unfreeze: head always on; encoders unlock after a
        # fraction of training (reference unlocks by epoch fraction,
        # training_utils.py:430-456)
        frac = epoch / max(1, total_epochs)
        if head in _HEAD_PREFIXES or head.startswith("fusion") or head == "moe":
            return True
        if head in _TEXT_PREFIXES:
            return frac >= 1 / 3
        if head == _VISUAL_PREFIX:
            return frac >= 2 / 3
        return True

    return jax.tree_util.tree_map_with_path(mask, params)
