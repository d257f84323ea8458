"""Image representation tutorial (reference:
examples/image_representation_examples.py).

Two layers of visual machinery, mirrored from the reference:

* **Backbone encoders** (used by the VQA meta-architectures) — ViT,
  CLIP-ViT, DINOv2-style ViT, ResNet, Swin; factory
  `create_visual_encoder` (reference meta_arch/vqa_model.py:51-131 +
  heads/image_representation.py:16-80).
* **Representation zoo** (standalone embedding strategies) —
  region-based pseudo-regions, multi-resolution FPN, Perceiver-style
  learned vision tokens, from-scratch ViT; factory
  `create_image_representation` (reference
  heads/image_representation.py:83-794).

Sections
  1. The encoder output contract
  2. Backbone zoo: ViT / CLIP / DINO / ResNet / Swin
  3. Config variants: patch size, depth, width, windows
  4. Representation zoo: region / FPN / vision-token / ViT
  5. Pretrained weights: the converter workflow (offline-safe demo)
  6. Freezing backbones for linear probing
  7. TPU notes: bf16, static shapes, and the MXU

Run (any platform; shapes are tiny):
    python examples/image_representation_examples.py
"""

# allow running straight from a source checkout
import pathlib
import sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.models.config import VisualEncoderConfig
from vivqa_tpu.models.encoders import create_visual_encoder
from vivqa_tpu.models.encoders.representation import create_image_representation


def banner(title):
    print(f"\n{'=' * 64}\n{title}\n{'=' * 64}")


def params_of(variables):
    return sum(p.size for p in jax.tree.leaves(variables))


def section_contract():
    banner("1. The encoder output contract")
    print("""Every visual encoder returns the same dict so fusion and the
meta-architecture never care which backbone produced it:

    out = encoder.apply(vars, pixel_values)      # (B, H, W, 3) NHWC
    out["pooled"]  (B, D)       global image vector (CLS or pooled)
    out["tokens"]  (B, L, D)    spatial tokens (patches / grid cells)

NHWC is deliberate: TPU convolutions and XLA layout assignment
prefer channels-last; torch's NCHW tensors are transposed once at
conversion time, not per step.""")


def section_backbones(rng, px):
    banner("2. Backbone zoo")
    notes = {
        "vit": "from-scratch ViT (pre-LN, learned pos-embed)",
        "clip": "CLIP-vision variant: quick-GELU, pre-LN, CLS pooling —\n"
                "          weight-compatible with HF CLIPVisionModel",
        "dino": "DINOv2 variant: LayerScale + SwiGLU options wired for\n"
                "          facebook/dinov2 checkpoint conversion",
        "resnet": "bottleneck ResNet; GroupNorm from scratch or\n"
                "          frozen-BN-folded-to-affine for pretrained imports",
        "swin": "hierarchical windows with REAL shifted-window attention\n"
                "          and relative position bias",
    }
    for backbone in ("vit", "clip", "dino", "resnet", "swin"):
        cfg = VisualEncoderConfig(
            backbone=backbone, image_size=32, patch_size=16,
            hidden_dim=64, num_layers=2, num_heads=2,
            resnet_stages=(1, 1, 1, 1), resnet_width=32,
            swin_window=4, swin_depths=(1, 1), swin_heads=(2, 4),
            swin_embed_dim=16, output_dim=64)
        enc = create_visual_encoder(cfg)
        variables = enc.init(rng, px)
        out = enc.apply(variables, px)
        print(f"  {backbone:>8}: pooled={tuple(out['pooled'].shape)} "
              f"tokens={tuple(out['tokens'].shape)}  "
              f"params={params_of(variables):,}")
        print(f"          {notes[backbone]}")


def section_variants(rng):
    banner("3. Config variants")
    print("Patch size trades sequence length against per-token detail;\n"
          "depth/width scale capacity. All shapes stay static (jit-safe):\n")
    for image_size, patch in ((32, 16), (32, 8), (64, 16)):
        cfg = VisualEncoderConfig(backbone="vit", image_size=image_size,
                                  patch_size=patch, hidden_dim=64,
                                  num_layers=2, num_heads=2)
        enc = create_visual_encoder(cfg)
        px = jnp.zeros((1, image_size, image_size, 3))
        out = enc.apply(enc.init(rng, px), px)
        n_tokens = out["tokens"].shape[1]
        print(f"  image {image_size}x{image_size}, patch {patch:>2} -> "
              f"{n_tokens:>3} tokens  (attention cost ~ L^2 = {n_tokens ** 2:,})")
    print("\nSwin sidesteps the L^2 by windowing: attention is local to\n"
          "shifted windows, so cost is linear in token count.")


def section_zoo(rng, px):
    banner("4. Representation zoo")
    notes = {
        "region_based": "bottom-up-attention style grid pseudo-regions +\n"
                        "                   box-geometry features",
        "multi_resolution": "ResNet stage pyramid + lateral FPN fusion —\n"
                        "                   multi-scale tokens",
        "vision_token": "Perceiver/BLIP-2 style: learned query tokens\n"
                        "                   cross-attend into the pixel grid",
        "vit": "plain patch transformer (same module as backbone 'vit')",
    }
    base = VisualEncoderConfig(image_size=64, resnet_width=16, output_dim=64)
    for kind in ("region_based", "multi_resolution", "vision_token", "vit"):
        cfg = base if kind != "vit" else base.replace(
            patch_size=16, hidden_dim=64, num_layers=2, num_heads=2)
        m = create_image_representation(kind, cfg)
        variables = m.init(rng, px)
        out = m.apply(variables, px)
        print(f"  {kind:>17}: pooled={tuple(out['pooled'].shape)} "
              f"tokens={tuple(out['tokens'].shape)}  "
              f"params={params_of(variables):,}")
        print(f"                   {notes[kind]}")


def section_pretrained(rng):
    banner("5. Pretrained weights — the converter workflow")
    print("""The reference gets pretrained towers through torchvision/timm/HF
at call time. Here conversion is an explicit, testable step:

    from vivqa_tpu.models.convert import load_pretrained_visual_encoder
    params, cfg = load_pretrained_visual_encoder(
        "openai/clip-vit-base-patch32")        # or a local HF path
    enc = create_visual_encoder(cfg)
    out = enc.apply({"params": params}, pixel_values)

Converters exist for CLIP-vision, ViT, DINOv2, ResNet-50 (BN folded
to per-channel affine -> resnet_norm="frozen_bn"), and Swin; each has
a numerical-parity test against the torch module
(tests/test_convert.py, atol ~1e-3 bounded by LayerNorm eps).

Offline demo — converting a RANDOM-INIT torch CLIP (no download):""")
    try:
        import torch  # noqa: F401
        from transformers import CLIPVisionConfig, CLIPVisionModel
        from vivqa_tpu.models.convert import convert_clip_vision
        tcfg = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=32, patch_size=16)
        tmodel = CLIPVisionModel(tcfg).eval()
        cfg = VisualEncoderConfig(backbone="clip", image_size=32,
                                  patch_size=16, hidden_dim=64,
                                  num_layers=2, num_heads=2)
        params = convert_clip_vision(tmodel, cfg)
        enc = create_visual_encoder(cfg)
        px = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
        ours = enc.apply({"params": params}, jnp.asarray(px))["pooled"]
        with torch.no_grad():
            theirs = tmodel(torch.tensor(px).permute(0, 3, 1, 2)
                            ).pooler_output.numpy()
        err = float(np.abs(np.asarray(ours, np.float32) - theirs).max())
        print(f"\n  converted 2-layer CLIP-vision: max |jax - torch| = {err:.2e}")
    except Exception as e:  # transformers missing pieces etc.
        print(f"\n  (skipped live conversion: {type(e).__name__}: {e})")


def section_freezing(rng, px):
    banner("6. Freezing backbones")
    print("""Freezing is an OPTIMIZER concern, not a model flag: the trainer's
strategy system ('linear_probe', 'freeze_visual', 'gradual_unfreeze')
zero-masks updates for frozen subtrees, so the params stay one pytree
and jit caches stay valid. See vivqa_tpu/train/strategies.py and the
frozen-params-get-zero-updates test (tests/test_train.py).""")


def section_tpu_notes():
    banner("7. TPU notes")
    print("""* All encoder matmuls run in bfloat16 (param storage fp32) — the
  MXU's native format; no GradScaler needed, unlike the reference's
  AMP-fp16 path.
* Patchify is a conv with stride=patch — one big MXU op, not an
  unfold+reshape.
* Every config is a frozen dataclass -> hashable -> stable jit cache.
* Image sizes are fixed per run: no dynamic shapes under jit. The
  data pipeline resizes on host (PIL/C++ fast loader) to the config's
  image_size.""")


def main():
    rng = jax.random.PRNGKey(0)
    px = jax.random.normal(rng, (2, 64, 64, 3))
    px_small = jax.random.normal(rng, (2, 32, 32, 3))

    section_contract()
    section_backbones(rng, px_small)
    section_variants(rng)
    section_zoo(rng, px)
    section_pretrained(rng)
    section_freezing(rng, px)
    section_tpu_notes()

    banner("Done")
    print("Choose a backbone by config string:\n"
          '  VQAModelConfig(visual=VisualEncoderConfig(backbone="swin", ...))\n'
          "See examples/complete_vqa_pipeline.py for the full model.")


if __name__ == "__main__":
    main()
