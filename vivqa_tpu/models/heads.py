"""Answer classification head (reference AnswerHead,
src/modeling/meta_arch/vqa_model.py:436-477): MLP over hidden_dims then a
final Linear to num_answers. Logits are produced in float32 for a stable
softmax/cross-entropy regardless of the bf16 trunk."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vivqa_tpu.models.config import AnswerHeadConfig

_ACTS = {"gelu": nn.gelu, "relu": nn.relu, "tanh": jnp.tanh, "silu": nn.silu}


class AnswerHead(nn.Module):
    config: AnswerHeadConfig
    num_answers: int
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = _ACTS[self.config.activation]
        for i, dim in enumerate(self.config.hidden_dims):
            x = nn.Dense(dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = act(x)
            x = nn.Dropout(self.config.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_answers, dtype=jnp.float32, name="classifier")(x)
