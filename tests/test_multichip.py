"""Multi-chip coverage beyond the classification step (VERDICT r1 #8):
generative teacher-forcing train step sharded over a 4x2 mesh, beam
decode with the params tensor-parallel over model_axis=2 (the beam-cache
gather under TP is the risky bit), and SparseMOELayer under expert
parallelism — each asserting parity with the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.models.config import (GenerativeVQAConfig, MoEModelConfig,
                                     TextEncoderConfig, VisualEncoderConfig)
from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
from vivqa_tpu.models.generative import GenerativeVQAModel
from vivqa_tpu.parallel.mesh import shard_pytree_by_rules
from vivqa_tpu.train import (OptimizerConfig, ShardedStep, TrainState,
                             create_optimizer, cross_entropy_loss,
                             make_train_step, place_state)

# fp32 everywhere: decode parity compares argmax chains, which must not
# flip on bf16 reduction-order noise between shardings
GEN_CFG = GenerativeVQAConfig(
    visual=VisualEncoderConfig(image_size=16, patch_size=8, hidden_dim=32,
                               num_layers=1, num_heads=2, dtype="float32"),
    text=TextEncoderConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                           num_heads=2, max_length=8, dropout=0.0,
                           dtype="float32"),
    fusion_dim=32, fusion_layers=1, fusion_heads=2,
    moe=MoEModelConfig(use_moe=True, num_experts=4, top_k=2,
                       expert_hidden_dim=64),
    vocab_size=64, decoder_layers=2, decoder_heads=2, decoder_dim=32,
    decoder_ff_dim=64, max_answer_length=6, max_question_length=8,
    dropout=0.0, bos_token_id=0, eos_token_id=63, pad_token_id=1,
    dtype="float32")


@pytest.fixture(scope="module")
def gen_setup():
    m = GenerativeVQAModel(GEN_CFG)
    rng = jax.random.PRNGKey(0)
    B = 8
    px = jax.random.normal(jax.random.fold_in(rng, 1), (B, 16, 16, 3))
    q = jnp.asarray(np.random.RandomState(0).randint(2, 60, (B, 8)), jnp.int32)
    qm = jnp.ones((B, 8), jnp.int32)
    dec = jnp.asarray(np.random.RandomState(1).randint(2, 60, (B, 6)), jnp.int32)
    labels = jnp.asarray(np.random.RandomState(2).randint(2, 60, (B, 6)), jnp.int32)
    var = m.init({"params": rng, "router": rng}, px, q, dec)
    return m, var["params"], {"pixel_values": px, "question_ids": q,
                              "question_mask": qm, "decoder_input_ids": dec,
                              "decoder_mask": jnp.ones((B, 6), jnp.int32),
                              "labels": labels}


def test_generative_sharded_train_step(gen_setup, mesh8):
    """Teacher-forcing train step jitted over the 4x2 mesh: DP over
    data, TP + EP over model. Loss must decrease and the fusion-MoE
    expert stack must actually be expert-parallel."""
    from jax.sharding import PartitionSpec as P
    m, params, batch = gen_setup
    tx = create_optimizer(OptimizerConfig(learning_rate=5e-3),
                          params=params)
    state = place_state(
        TrainState.create(m.apply, params, tx, jax.random.PRNGKey(0)), mesh8)

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["question_ids"], batch["decoder_input_ids"],
                       batch["question_mask"], batch["decoder_mask"],
                       deterministic=False,
                       rngs={"dropout": rng, "router": rng})
        ce = cross_entropy_loss(out["logits"], batch["labels"])
        return ce + 0.01 * out["aux_loss"], {}

    jit_train, _, _, batch_sh = ShardedStep(
        mesh8, make_train_step(loss_fn)).compile(state)
    dev = jax.device_put(batch, jax.tree.map(lambda _: batch_sh, batch))
    losses = []
    for _ in range(4):
        state, metrics = jit_train(state, dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    spec = state.params["fusion"]["moe"]["experts_w_in"].sharding.spec
    assert spec == P("model", None, None), spec


@pytest.mark.parametrize("strategy", ["greedy", "beam"])
def test_decode_parity_under_tensor_parallel(gen_setup, mesh8, strategy):
    """KV-cached greedy AND beam decode must produce identical sequences
    whether params are replicated on one device or sharded TP/EP over
    the 4x2 mesh — exercises the beam-cache gather under GSPMD."""
    m, params, batch = gen_setup
    dc = DecodeConfig(max_length=6, strategy=strategy, num_beams=2,
                      bos_token_id=0, eos_token_id=63, pad_token_id=1)
    gen = jax.jit(build_generate_fn(m, dc))
    args = (batch["pixel_values"], batch["question_ids"],
            batch["question_mask"])

    seqs0, scores0 = gen(params, *args)                  # single device
    params_sh = jax.device_put(params,
                               shard_pytree_by_rules(params, mesh8))
    from vivqa_tpu.parallel.mesh import batch_sharding
    bs = batch_sharding(mesh8)
    args_sh = jax.device_put(args, (bs, bs, bs))
    seqs1, scores1 = gen(params_sh, *args_sh)
    np.testing.assert_array_equal(np.asarray(seqs0), np.asarray(seqs1))
    np.testing.assert_allclose(np.asarray(scores0), np.asarray(scores1),
                               rtol=1e-4, atol=1e-5)


def test_sparse_moe_expert_parallel_parity(mesh8):
    """SparseMOELayer output under EP (experts sharded over 'model')
    must equal the single-device result bit-for-bit in fp32."""
    from jax.sharding import PartitionSpec as P
    from vivqa_tpu.models.moe.config import (ExpertConfig, MoEConfig,
                                             RouterConfig)
    from vivqa_tpu.models.moe.layer import SparseMOELayer

    cfg = MoEConfig(num_experts=4, input_dim=32,
                    expert=ExpertConfig(hidden_dim=64),
                    router=RouterConfig(router_type="topk", top_k=2,
                                        capacity_factor=2.0),
                    moe_type="sparse")
    layer = SparseMOELayer(cfg)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 4, 32), jnp.float32)
    rng = jax.random.PRNGKey(0)
    var = layer.init({"params": rng, "router": rng}, x)

    fwd = jax.jit(lambda p, x: layer.apply({"params": p}, x))
    y0, aux0 = fwd(var["params"], x)

    params_sh = jax.device_put(
        var["params"], shard_pytree_by_rules(var["params"], mesh8))
    assert params_sh["experts_w_in"].sharding.spec == P("model", None, None)
    y1, aux1 = fwd(params_sh, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux0["aux_loss"]),
                               float(aux1["aux_loss"]), rtol=1e-5)
