"""Orbax checkpoint manager tests: save/restore, rotation, best policy,
partial load, emergency save."""

import jax.numpy as jnp
import numpy as np
import pytest

from vivqa_tpu.train.checkpoint import (CheckpointConfig, CheckpointManager,
                                        emergency_save, partial_load)


def _state(v=1.0):
    return {"params": {"w": jnp.full((2, 2), v), "b": jnp.zeros(2)},
            "step": jnp.asarray(3)}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(CheckpointConfig(directory=str(tmp_path / "ck"),
                                             keep_best=False))
    st = _state(2.5)
    assert mgr.save(1, st, metadata={"vocab": {"a": 1}},
                    metrics={"vqa_accuracy": 0.5})
    restored, meta = mgr.restore()
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((2, 2), 2.5, np.float32))
    assert meta["vocab"] == {"a": 1}
    assert meta["metrics"]["vqa_accuracy"] == 0.5
    mgr.close()


def test_rotation_and_best(tmp_path):
    mgr = CheckpointManager(CheckpointConfig(
        directory=str(tmp_path / "ck"), max_to_keep=2, keep_best=True,
        best_metric="acc"))
    for step, acc in ((1, 0.3), (2, 0.9), (3, 0.5), (4, 0.6)):
        mgr.save(step, _state(float(step)), metrics={"acc": acc})
    steps = mgr.all_steps()
    assert len(steps) <= 2
    # best (0.9 at step 2) must survive rotation
    assert mgr.best_step() == 2
    restored, _ = mgr.restore_best()
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((2, 2), 2.0, np.float32))
    mgr.close()


def test_restore_empty_raises(tmp_path):
    mgr = CheckpointManager(CheckpointConfig(directory=str(tmp_path / "ck")))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()


def test_partial_load_shape_filter():
    restored = {"a": np.ones((2, 2)), "b": np.ones((3,)), "extra": np.ones(1)}
    target = {"a": np.zeros((2, 2)), "b": np.zeros((4,)), "c": np.zeros(1)}
    merged, skipped = partial_load(restored, target)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"], np.zeros((4,)))  # mismatch kept
    np.testing.assert_array_equal(merged["c"], np.zeros(1))     # missing kept
    assert len(skipped) == 1 and "b" in skipped[0]


def test_emergency_save(tmp_path):
    path = emergency_save(_state(7.0), tmp_path / "em", metadata={"why": "oom"})
    assert (path / "state").exists()
    assert (path / "metadata.json").exists()
