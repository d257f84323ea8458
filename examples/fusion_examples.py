"""Fusion zoo demo (reference: examples/fusion_examples.py).

Runs every fusion strategy on synthetic encoder outputs and prints the
fused shapes. Works on CPU:
    JAX_PLATFORMS=cpu python examples/fusion_examples.py
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import jax
import jax.numpy as jnp

from vivqa_tpu.models.config import FusionConfig, FUSION_TYPES
from vivqa_tpu.models.fusion import create_fusion


def main():
    rng = jax.random.PRNGKey(0)
    visual = {"pooled": jax.random.normal(rng, (2, 64)),
              "tokens": jax.random.normal(rng, (2, 9, 64))}
    text = {"pooled": jax.random.normal(rng, (2, 64)),
            "tokens": jax.random.normal(rng, (2, 12, 64)),
            "mask": jnp.ones((2, 12), jnp.int32)}
    for ft in FUSION_TYPES:
        cfg = FusionConfig(fusion_type=ft, hidden_dim=64, num_heads=4,
                           num_layers=1, num_query_tokens=8)
        fusion = create_fusion(cfg)
        out = fusion.apply(fusion.init(rng, visual, text), visual, text)
        print(f"{ft:>16}: pooled={tuple(out['pooled'].shape)} "
              f"tokens={tuple(out['tokens'].shape)}")


if __name__ == "__main__":
    main()
