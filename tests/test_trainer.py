"""VQATrainer tests: train/eval loop, gradient checkpointing, resume,
tensorboard writer."""

from pathlib import Path

import jax
import numpy as np
import pytest

from vivqa_tpu.data import (BatchLoader, ImageAugmentation, VQADataset,
                            WhitespaceTokenizer, build_answer_vocab,
                            synthetic_samples, vqa_collate)
from vivqa_tpu.models.config import (FusionConfig, TextEncoderConfig,
                                     VisualEncoderConfig, VQAModelConfig)
from vivqa_tpu.models.vqa_model import VietnameseVQAModel
from vivqa_tpu.train.optimizers import OptimizerConfig
from vivqa_tpu.train.trainer import TrainerConfig, VQATrainer


@pytest.fixture(scope="module")
def setup(mesh8):
    samples = synthetic_samples(24)
    tok = WhitespaceTokenizer(max_length=8)
    tok.build_vocab([s.question for s in samples] +
                    [a for s in samples for a in s.answers])
    a2i, _ = build_answer_vocab(samples)
    aug = ImageAugmentation(image_size=16, mode="eval")
    ds = VQADataset(samples, tok, a2i, aug, max_question_length=8)
    loader = BatchLoader(ds, 8, vqa_collate, seed=1)
    cfg = VQAModelConfig(
        visual=VisualEncoderConfig(image_size=16, patch_size=8,
                                   hidden_dim=32, num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=tok.vocab_size, hidden_dim=32,
                               num_layers=1, num_heads=2, max_length=8),
        fusion=FusionConfig(fusion_type="concat", hidden_dim=32,
                            num_heads=2, num_layers=1),
        num_answers=len(a2i))
    model = VietnameseVQAModel(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    params = model.init(rng, jnp.zeros((2, 16, 16, 3)),
                        jnp.ones((2, 8), jnp.int32))["params"]
    return model, params, mesh8, loader


def test_trainer_runs_and_checkpoints(setup, tmp_path):
    model, params, mesh, loader = setup
    cfg = TrainerConfig(num_epochs=2,
                        optimizer=OptimizerConfig(learning_rate=5e-3),
                        checkpoint_dir=str(tmp_path / "ck"),
                        tensorboard_dir=str(tmp_path / "tb"),
                        log_every=100, resume=False)
    out = VQATrainer(cfg, model, params, mesh).train(loader, loader)
    assert len(out["history"]) == 2
    assert out["history"][1]["train_loss"] < out["history"][0]["train_loss"] + 0.5
    assert "accuracy" in out["history"][0]
    assert (tmp_path / "ck").exists()
    # tensorboard event files written
    assert any(Path(tmp_path / "tb").iterdir())

    # resume picks up the saved epoch
    cfg2 = cfg.replace(num_epochs=3, resume=True)
    out2 = VQATrainer(cfg2, model, params, mesh).train(loader, loader)
    epochs = [h["epoch"] for h in out2["history"]]
    assert epochs and epochs[0] >= 2      # resumed past trained epochs


def test_trainer_gradient_checkpointing(setup, tmp_path):
    model, params, mesh, loader = setup
    cfg = TrainerConfig(num_epochs=1, gradient_checkpointing=True,
                        optimizer=OptimizerConfig(learning_rate=5e-3),
                        checkpoint_dir=str(tmp_path / "ck2"),
                        log_every=100, resume=False)
    out = VQATrainer(cfg, model, params, mesh).train(loader)
    assert np.isfinite(out["history"][0]["train_loss"])


def test_gradual_unfreeze_stages(setup, tmp_path):
    """The visual encoder must stay frozen early and actually train in
    the final third of gradual_unfreeze."""
    model, params, mesh, loader = setup
    cfg = TrainerConfig(num_epochs=3, strategy="gradual_unfreeze",
                        optimizer=OptimizerConfig(learning_rate=5e-2),
                        checkpoint_dir=str(tmp_path / "gu"),
                        log_every=100, resume=False,
                        early_stopping_patience=10)
    import jax
    trainer = VQATrainer(cfg, model, params, mesh)
    before = np.asarray(jax.tree.leaves(params["visual_encoder"])[0])
    out = trainer.train(loader)
    after_params = jax.device_get(out["state"].params)
    after = np.asarray(jax.tree.leaves(after_params["visual_encoder"])[0])
    # stage 2 (epoch 2 of 3) unlocked the visual encoder -> it moved
    assert not np.allclose(before, after)
    assert len(out["history"]) == 3


def test_trainer_resume_restores_full_state(setup, tmp_path):
    """Resume must restore step + optimizer state, not just params:
    the step counter continues (so Orbax never reuses a step number and
    the LR schedule doesn't restart) and Adam moments are non-zero."""
    model, params, mesh, loader = setup
    cfg = TrainerConfig(num_epochs=2,
                        optimizer=OptimizerConfig(learning_rate=5e-3),
                        checkpoint_dir=str(tmp_path / "fs"),
                        log_every=100, resume=False,
                        early_stopping_patience=10)
    out1 = VQATrainer(cfg, model, params, mesh).train(loader, loader)
    steps_run = int(out1["state"].step)
    assert steps_run == 2 * len(loader)

    cfg2 = cfg.replace(num_epochs=4, resume=True)
    out2 = VQATrainer(cfg2, model, params, mesh).train(loader, loader)
    # continued from the restored step, 2 more epochs on top
    assert int(out2["state"].step) == 4 * len(loader)
    # optimizer state restored: Adam mu is non-zero right away (a fresh
    # optimizer would have zeros before the first update)
    import jax.numpy as jnp
    mus = [x for x in jax.tree.leaves(jax.device_get(out2["state"].opt_state))
           if hasattr(x, "shape") and np.asarray(x).size > 1]
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus)


def test_trainer_resume_across_prng_impls(setup, tmp_path):
    """A checkpoint whose rng key was written under one PRNG impl (e.g.
    threefry, (2,) uint32) must resume cleanly under another (unsafe_rbg,
    (4,)): params AND optimizer state adopt, only the rng falls back to
    the fresh seed-derived key. Regression for the broad-except fallback
    that silently reset Adam moments over the rng leaf alone."""
    import jax.numpy as jnp
    model, params, mesh, loader = setup
    cfg = TrainerConfig(num_epochs=1,
                        optimizer=OptimizerConfig(learning_rate=5e-3),
                        checkpoint_dir=str(tmp_path / "xp"),
                        log_every=100, resume=False,
                        early_stopping_patience=10)
    t1 = VQATrainer(cfg, model, params, mesh)
    # simulate the other PRNG impl: replace the state rng with a
    # different-shape uint32 key BEFORE training/saving
    out1 = t1.train(loader, loader)
    saved_params = jax.device_get(out1["state"].params)

    from vivqa_tpu.train.checkpoint import (CheckpointConfig,
                                            CheckpointManager)
    t2 = VQATrainer(cfg.replace(num_epochs=2, resume=True),
                    model, params, mesh)
    # force a mismatched rng shape in the resuming state
    st = t2._build_state(len(loader))
    odd_rng = jnp.zeros((4,) if np.asarray(st.rng).shape == (2,) else (2,),
                        jnp.uint32)
    st = st.replace(rng=odd_rng)
    ckpt = CheckpointManager(CheckpointConfig(directory=str(tmp_path / "xp")))
    restored, _ = t2._restore_full(ckpt, st)
    ckpt.close()
    # params adopted from the checkpoint despite the rng mismatch
    a = jax.tree.leaves(saved_params)[0]
    b = jax.tree.leaves(jax.device_get(restored.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state adopted (non-zero moments), rng kept the fresh key
    mus = [x for x in jax.tree.leaves(jax.device_get(restored.opt_state))
           if hasattr(x, "shape") and np.asarray(x).size > 1]
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus)
    assert np.asarray(restored.rng).shape == np.asarray(odd_rng).shape
    assert int(restored.step) == len(loader)
