"""vivqa_tpu — TPU-native Vietnamese VQA framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
richardnguyen0715/vqa-model-builder ("AutoViVQA Model Builder"):

- classification VQA (visual encoder + text encoder + fusion + optional MoE
  + optional RAG + answer head) and generative VQA (encoder-decoder with
  KV-cached greedy/top-k/top-p/beam decoding),
- a pluggable encoder zoo (ViT/CLIP-vision, ResNet, Swin, DINOv2-style;
  PhoBERT/BERT/RoBERTa-style text encoders),
- a fusion zoo (concat / add / bilinear / cross-attention / MCAN / MuTAN /
  Q-Former / single-stream),
- a Mixture-of-Experts subsystem (top-k / noisy top-k / soft / expert-choice
  routers; feed-forward / GLU / vision / text / multimodal / specialized
  experts) with static-shape TPU dispatch,
- full metric suite (VQA soft accuracy, BLEU, METEOR, ROUGE-L, CIDEr, WUPS,
  P/R/F1, exact match, perplexity),
- ablation-study orchestration, knowledge-base/RAG, resource management.

Design stance (vs. the single-GPU PyTorch reference): functional core,
one jitted train step over a `jax.sharding.Mesh` (data/model axes), bf16
compute policy, static shapes everywhere, Orbax checkpointing, Pallas
kernels for the hot ops.
"""

__version__ = "0.1.0"
