"""Training stack tests: losses (hand-computed), optimizers, strategies,
and the mesh-sharded train step (DP over 'data', TP/EP over 'model')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vivqa_tpu.models.config import (FusionConfig, TextEncoderConfig,
                                     VisualEncoderConfig, VQAModelConfig,
                                     MoEModelConfig)
from vivqa_tpu.models.vqa_model import VietnameseVQAModel
from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig, ShardedStep,
                             TrainState, create_optimizer, create_schedule,
                             cross_entropy_loss, decay_mask, focal_loss,
                             make_train_step, perplexity, place_state,
                             soft_target_loss, trainable_mask)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_cross_entropy_hand_computed():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 1])
    want = -np.log(np.exp(2) / (np.exp(2) + 1))
    assert np.isclose(float(cross_entropy_loss(logits, labels)), want, atol=1e-6)


def test_cross_entropy_ignore_index():
    logits = jnp.array([[[2.0, 0.0], [0.0, 2.0]]])
    labels = jnp.array([[0, -100]])
    want = -np.log(np.exp(2) / (np.exp(2) + 1))
    got = float(cross_entropy_loss(logits, labels, ignore_index=-100))
    assert np.isclose(got, want, atol=1e-6)


def test_cross_entropy_label_smoothing():
    logits = jnp.array([[2.0, 0.0]])
    labels = jnp.array([0])
    ls = 0.2
    logp = jax.nn.log_softmax(logits)[0]
    want = -float((0.8 + 0.1) * logp[0] + 0.1 * logp[1])
    got = float(cross_entropy_loss(logits, labels, label_smoothing=ls))
    assert np.isclose(got, want, atol=1e-6)


def test_soft_target_loss_positive():
    logits = jnp.array([[10.0, -10.0]])
    targets = jnp.array([[1.0, 0.0]])
    assert float(soft_target_loss(logits, targets)) < 1e-3
    targets_bad = jnp.array([[0.0, 1.0]])
    assert float(soft_target_loss(logits, targets_bad)) > 5.0


def test_focal_downweights_easy():
    easy = jnp.array([[10.0, -10.0]])
    hard = jnp.array([[0.1, 0.0]])
    labels = jnp.array([0])
    assert float(focal_loss(easy, labels)) < float(focal_loss(hard, labels))


def test_perplexity_clamped():
    assert float(perplexity(jnp.array(200.0))) == float(perplexity(jnp.array(100.0)))
    assert np.isclose(float(perplexity(jnp.array(2.0))), np.exp(2.0), rtol=1e-5)


# ---------------------------------------------------------------------------
# Optimizer / schedule / strategy
# ---------------------------------------------------------------------------

def test_decay_mask_excludes_norms_and_biases():
    params = {"mlp": {"wi": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
              "ln1": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
              "token_embed": {"embedding": jnp.ones((4, 2))}}
    mask = decay_mask(params)
    assert mask["mlp"]["wi"]["kernel"] is True
    assert mask["mlp"]["wi"]["bias"] is False
    assert mask["ln1"]["scale"] is False
    assert mask["token_embed"]["embedding"] is False


def test_warmup_cosine_schedule_shape():
    sched = create_schedule(SchedulerConfig(name="warmup_cosine",
                                            warmup_steps=10,
                                            total_steps=100), 1.0)
    assert float(sched(0)) < 0.2
    assert np.isclose(float(sched(10)), 1.0, atol=0.05)
    assert float(sched(99)) < 0.01


@pytest.mark.parametrize("name", ["warmup_cosine", "warmup_linear",
                                  "polynomial", "step", "onecycle",
                                  "constant"])
@pytest.mark.parametrize("total", [1, 2, 3])
def test_tiny_total_steps_build(name, total):
    """total_steps <= default warmup must still build a valid schedule
    (a 1-batch smoke run used to crash optax's cosine decay)."""
    sched = create_schedule(SchedulerConfig(name=name, total_steps=total),
                            1e-3)
    vals = [float(sched(i)) for i in range(total)]
    assert all(np.isfinite(v) for v in vals)
    assert max(vals) <= 1.1e-3


@pytest.mark.parametrize("name", ["warmup_linear", "polynomial", "step",
                                  "onecycle", "constant"])
def test_all_schedules_run(name):
    sched = create_schedule(SchedulerConfig(name=name, warmup_steps=5,
                                            total_steps=50), 1e-3)
    vals = [float(sched(i)) for i in (0, 10, 49)]
    assert all(np.isfinite(vals)) and max(vals) <= 1.1e-3


def test_trainable_mask_strategies():
    params = {"visual_encoder": {"k": 1}, "text_encoder": {"k": 1},
              "fusion": {"k": 1}, "answer_head": {"k": 1}}
    m = trainable_mask(params, "freeze_visual")
    assert m["visual_encoder"]["k"] is False and m["answer_head"]["k"] is True
    m = trainable_mask(params, "linear_probe")
    assert m["fusion"]["k"] is False and m["answer_head"]["k"] is True
    m = trainable_mask(params, "gradual_unfreeze", epoch=0, total_epochs=9)
    assert m["visual_encoder"]["k"] is False
    m = trainable_mask(params, "gradual_unfreeze", epoch=8, total_epochs=9)
    assert m["visual_encoder"]["k"] is True


def test_frozen_params_get_zero_updates():
    params = {"visual_encoder": {"k": jnp.ones(3)},
              "answer_head": {"k": jnp.ones(3)}}
    mask = trainable_mask(params, "freeze_visual")
    tx = create_optimizer(OptimizerConfig(name="sgd", learning_rate=1.0,
                                          weight_decay=0.0,
                                          grad_clip_norm=0.0),
                          params=params, freeze_mask=mask)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["visual_encoder"]["k"]).sum()) == 0.0
    assert float(jnp.abs(updates["answer_head"]["k"]).sum()) > 0.0


def test_optimizer_state_dtype_levers():
    """Round-5 HBM lever: bf16 first moment + adafactor's factored
    second moment. The state must actually carry the reduced dtypes and
    a step must move params sanely."""
    params = {"w": jnp.ones((128, 130)), "b": jnp.zeros(130)}
    grads = jax.tree.map(lambda x: jnp.full_like(x, 0.1), params)

    tx = create_optimizer(OptimizerConfig(learning_rate=1e-2,
                                          mu_dtype="bfloat16"),
                          params=params)
    st = tx.init(params)
    mus = [l for l in jax.tree.leaves(st)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "bf16 mu_dtype must appear in the adamw state"
    updates, _ = tx.update(grads, st, params)
    assert all(bool(jnp.all(jnp.isfinite(u)))
               for u in jax.tree.leaves(updates))

    txf = create_optimizer(OptimizerConfig(name="adafactor",
                                           learning_rate=1e-2,
                                           weight_decay=0.0),
                           params=params)
    stf = txf.init(params)
    # factored: no state leaf carries the full (128, 130) matrix shape
    big = [l for l in jax.tree.leaves(stf)
           if hasattr(l, "shape") and l.shape == (128, 130)
           and l.dtype == jnp.float32]
    # (momentum=beta1 keeps one full-size mu; the SECOND moment must be
    # factored — so at most the single mu leaf may be full-size)
    assert len(big) <= 1
    updates, _ = txf.update(grads, stf, params)
    assert all(bool(jnp.all(jnp.isfinite(u)))
               for u in jax.tree.leaves(updates))


# ---------------------------------------------------------------------------
# Sharded end-to-end train step
# ---------------------------------------------------------------------------

TINY = VQAModelConfig(
    visual=VisualEncoderConfig(image_size=16, patch_size=8, hidden_dim=32,
                               num_layers=1, num_heads=2),
    text=TextEncoderConfig(vocab_size=64, hidden_dim=32, num_layers=1,
                           num_heads=2, max_length=8),
    fusion=FusionConfig(fusion_type="concat", hidden_dim=64, num_heads=2,
                        num_layers=1),
    moe=MoEModelConfig(use_moe=True, num_experts=4, top_k=2,
                       expert_hidden_dim=64),
    num_answers=8)


def _make_batch(n=16):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(rng.randn(n, 16, 16, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, 64, (n, 8)), jnp.int32),
        "attention_mask": jnp.ones((n, 8), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 8, (n,)), jnp.int32),
    }


def test_sharded_train_step_loss_decreases(mesh8):
    model = VietnameseVQAModel(TINY)
    batch = _make_batch()
    rng = jax.random.PRNGKey(0)
    var = model.init({"params": rng, "router": rng}, batch["pixel_values"],
                     batch["input_ids"])
    tx = create_optimizer(OptimizerConfig(learning_rate=1e-2),
                          params=var["params"])
    state = TrainState.create(model.apply, var["params"], tx, rng)
    state = place_state(state, mesh8)

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       deterministic=False,
                       rngs={"dropout": rng, "router": rng})
        loss = cross_entropy_loss(out["logits"], batch["labels"])
        total = loss + 0.01 * out["aux_loss"]
        return total, {"ce": loss, "aux": out["aux_loss"]}

    step = ShardedStep(mesh8, make_train_step(loss_fn))
    jit_train, _, state_sh, batch_sh = step.compile(state)
    batch = jax.device_put(batch, jax.tree.map(lambda _: batch_sh, batch))

    losses = []
    for _ in range(5):
        state, metrics = jit_train(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
    # MoE expert stack must actually be sharded over the model axis (EP)
    moe_w = state.params["moe"]["experts_w_in"]
    assert moe_w.sharding.spec == P("model", None, None)
    # batch was consumed sharded over data axis
    assert batch["pixel_values"].sharding.spec == P("data")


def test_single_chip_fast_path():
    """1-device mesh skips NamedShardings (GSPMD pessimizes ~3x on one
    chip) but still trains and donates safely."""
    from vivqa_tpu.parallel import MeshConfig, create_mesh
    mesh1 = create_mesh(MeshConfig(data_axis=1, model_axis=1),
                        devices=jax.devices()[:1])
    model = VietnameseVQAModel(TINY)
    batch = _make_batch(8)
    rng = jax.random.PRNGKey(0)
    var = model.init({"params": rng, "router": rng}, batch["pixel_values"],
                     batch["input_ids"])
    tx = create_optimizer(OptimizerConfig(learning_rate=1e-2),
                          params=var["params"])
    state = place_state(TrainState.create(model.apply, var["params"], tx, rng),
                        mesh1)

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       deterministic=False,
                       rngs={"dropout": rng, "router": rng})
        return cross_entropy_loss(out["logits"], batch["labels"]), {}

    jit_train, jit_eval, state_sh, batch_sh = ShardedStep(
        mesh1, make_train_step(loss_fn)).compile(state)
    assert batch_sh is None                      # fast path taken
    l0 = None
    for _ in range(4):
        state, m = jit_train(state, batch)
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0
    # original var params still usable (no aliasing through donation)
    model.apply(var, batch["pixel_values"], batch["input_ids"])


def test_lookahead_sync_semantics():
    """Exact Lookahead: between syncs behaves like the inner optimizer;
    at the sync step params land at slow + alpha*(fast - slow)."""
    params = {"w": jnp.zeros(2)}
    tx = create_optimizer(OptimizerConfig(
        name="sgd", learning_rate=1.0, weight_decay=0.0, grad_clip_norm=0.0,
        momentum=0.0, lookahead=True, lookahead_sync=2,
        lookahead_slow_step=0.5), params=params)
    state = tx.init(params)
    g = {"w": jnp.ones(2)}
    # step 1 (no sync): fast = 0 - 1 = -1
    up, state = tx.update(g, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), -1.0)
    # step 2 (sync): fast = -1 - 1 = -2; slow was 0 ->
    # new = 0 + 0.5*(-2 - 0) = -1
    up, state = tx.update(g, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), -1.0)
    # step 3 (no sync): -1 - 1 = -2
    up, state = tx.update(g, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), -2.0)
    # step 4 (sync): fast = -3; slow = -1 -> -1 + 0.5*(-3 + 1) = -2
    up, state = tx.update(g, state, params)
    params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), -2.0)


def test_layer_decay_scales_updates_under_adamw():
    """LLRD must scale the POST-optimizer update: Adam normalizes by
    sqrt(v), cancelling any pre-optimizer gradient scale (ADVICE r1).
    With constant grads, |update| per leaf must follow decay^(L-1-i)."""
    params = {"layers_0": {"w": jnp.zeros(2)}, "layers_2": {"w": jnp.zeros(2)}}
    tx = create_optimizer(OptimizerConfig(
        name="adamw", learning_rate=1.0, weight_decay=0.0,
        grad_clip_norm=0.0, layer_decay=0.5), params=params)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    up, _ = tx.update(g, state, params)
    u0 = float(np.abs(np.asarray(up["layers_0"]["w"])).mean())
    u2 = float(np.abs(np.asarray(up["layers_2"]["w"])).mean())
    # layer 2 is the deepest -> scale 1.0; layer 0 -> 0.5^2 = 0.25
    assert u2 > 0
    np.testing.assert_allclose(u0 / u2, 0.25, rtol=1e-3)


def test_settled_defenses_gate(monkeypatch):
    """The settled-read/call defenses (axon-tunnel workaround) are gated:
    off by default on healthy runtimes, forced by VIVQA_SETTLED_READS,
    auto-on when the axon plugin is the requested platform."""
    from vivqa_tpu.train.state import (settled_call,
                                       settled_defenses_enabled,
                                       settled_host_read,
                                       settled_params_view)

    monkeypatch.delenv("VIVQA_SETTLED_READS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert settled_defenses_enabled() is False
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert settled_defenses_enabled() is True
    monkeypatch.setenv("VIVQA_SETTLED_READS", "0")
    assert settled_defenses_enabled() is False
    monkeypatch.setenv("VIVQA_SETTLED_READS", "on")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert settled_defenses_enabled() is True

    # disabled -> exactly ONE execution / ONE read
    monkeypatch.setenv("VIVQA_SETTLED_READS", "0")
    calls = {"n": 0}

    def fn(x):
        calls["n"] += 1
        return x + 1

    out = settled_call(fn, jnp.ones(3))
    np.testing.assert_array_equal(out, np.full(3, 2.0))
    assert calls["n"] == 1
    arr = jnp.arange(4.0)
    got = settled_host_read(arr)
    np.testing.assert_array_equal(got, np.arange(4.0))
    # params view consumes the live buffers directly when disabled
    params = {"w": jnp.ones((2, 2))}
    view, host = settled_params_view(params)
    assert view is params
    np.testing.assert_array_equal(host["w"], np.ones((2, 2)))

    # enabled -> verification re-executes (2 identical runs) and the
    # params view is a re-uploaded copy, not the live buffer
    monkeypatch.setenv("VIVQA_SETTLED_READS", "1")
    calls["n"] = 0
    out = settled_call(fn, jnp.ones(3))
    np.testing.assert_array_equal(out, np.full(3, 2.0))
    assert calls["n"] == 2
    view, host = settled_params_view(params)
    assert view is not params
    np.testing.assert_array_equal(np.asarray(view["w"]), np.ones((2, 2)))


def test_settled_gate_probes_live_backend(monkeypatch):
    """Round-4 verdict weak #6: an axon session launched WITHOUT
    JAX_PLATFORMS set must still get the defenses — the gate probes the
    initialized backend, not just the env string."""
    from vivqa_tpu.train import state as state_mod

    monkeypatch.delenv("VIVQA_SETTLED_READS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # simulate the axon-without-env scenario: env says nothing axon-ish,
    # but the live runtime is the axon plugin
    monkeypatch.setattr(state_mod, "_axon_runtime_active", lambda: True)
    assert state_mod.settled_defenses_enabled() is True
    # explicit off still wins over the probe
    monkeypatch.setenv("VIVQA_SETTLED_READS", "0")
    assert state_mod.settled_defenses_enabled() is False

    # the probe itself recognizes the plugin via the backend name even
    # when devices report platform == "tpu" (measured on axon)
    monkeypatch.undo()
    monkeypatch.setattr(state_mod.jax, "default_backend", lambda: "axon")
    assert state_mod._axon_runtime_active() is True


def test_settled_strict_raises_on_nonconvergence(monkeypatch):
    from vivqa_tpu.train.state import settled_call

    monkeypatch.setenv("VIVQA_SETTLED_READS", "1")
    monkeypatch.delenv("VIVQA_SETTLED_STRICT", raising=False)
    counter = {"n": 0}

    def unstable():
        counter["n"] += 1
        return jnp.array(float(counter["n"]))

    # non-strict: warns and returns the last value
    with pytest.warns(UserWarning, match="did not converge"):
        out = settled_call(unstable, max_tries=3)
    assert float(out) == counter["n"]

    # strict kwarg raises
    with pytest.raises(RuntimeError, match="did not converge"):
        settled_call(unstable, max_tries=3, strict=True)

    # strict env var raises too
    monkeypatch.setenv("VIVQA_SETTLED_STRICT", "1")
    with pytest.raises(RuntimeError, match="did not converge"):
        settled_call(unstable, max_tries=3)

    # a NaN-diverged but STABLE value still converges (equal_nan)
    monkeypatch.setenv("VIVQA_SETTLED_STRICT", "1")
    nan = jnp.array(np.nan)
    out = settled_call(lambda: nan, max_tries=3)
    assert np.isnan(out)
