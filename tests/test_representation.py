"""Representation zoo tests (region-based / FPN / vision-token / text factory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.models.config import TextEncoderConfig, VisualEncoderConfig
from vivqa_tpu.models.encoders.representation import (
    create_image_representation, create_text_embedding, grid_boxes)

BASE = VisualEncoderConfig(image_size=32, resnet_width=16, output_dim=48)


@pytest.mark.parametrize("kind,tokens", [("region_based", 16),
                                         ("multi_resolution", None),
                                         ("vision_token", 32)])
def test_image_representations(rng, kind, tokens):
    m = create_image_representation(kind, BASE)
    x = jnp.zeros((2, 32, 32, 3))
    out = m.apply(m.init(rng, x), x)
    assert out["pooled"].shape == (2, 48)
    assert out["tokens"].shape[0] == 2 and out["tokens"].shape[-1] == 48
    if tokens is not None:
        assert out["tokens"].shape[1] == tokens
    assert np.isfinite(np.asarray(out["tokens"], np.float32)).all()


def test_unknown_image_representation():
    with pytest.raises(ValueError, match="unknown image representation"):
        create_image_representation("nope", BASE)


def test_grid_boxes_normalized():
    boxes = grid_boxes(4)
    assert boxes.shape == (16, 5)
    assert boxes.min() >= 0 and boxes[:, :4].max() <= 1.0
    np.testing.assert_allclose(boxes[:, 4], 1 / 16, atol=1e-6)


def test_text_embedding_factory_fallback(rng):
    cfg = TextEncoderConfig(vocab_size=50, hidden_dim=32, num_layers=1,
                            num_heads=2, max_length=8)
    ids = jnp.ones((2, 8), jnp.int32)
    # unknown kind falls back to generic (reference behavior)
    m = create_text_embedding("totally_new_model", cfg)
    out = m.apply(m.init(rng, ids), ids)
    assert out["pooled"].shape == (2, 32)
    # bert kind forces type_vocab_size >= 2
    m2 = create_text_embedding("bert", cfg)
    var = m2.init(rng, ids)
    assert "type_embed" in var["params"]
