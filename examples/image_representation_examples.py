"""Image representation zoo demo (reference:
examples/image_representation_examples.py)."""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


import jax
import jax.numpy as jnp

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.encoders.representation import create_image_representation


def main():
    rng = jax.random.PRNGKey(0)
    px = jax.random.normal(rng, (2, 64, 64, 3))
    base = VisualEncoderConfig(image_size=64, resnet_width=16, output_dim=64)
    for kind in ("region_based", "multi_resolution", "vision_token", "vit"):
        cfg = base if kind != "vit" else base.replace(
            patch_size=16, hidden_dim=64, num_layers=2, num_heads=2)
        m = create_image_representation(kind, cfg)
        out = m.apply(m.init(rng, px), px)
        print(f"{kind:>17}: pooled={tuple(out['pooled'].shape)} "
              f"tokens={tuple(out['tokens'].shape)}")


if __name__ == "__main__":
    main()
